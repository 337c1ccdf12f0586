package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-sequence funnel (the `window_funnel` analytics op
  * run incrementally): per user, the earliest view t1, the earliest
  * click in (t1, t1+W], and the earliest purchase in (t2, t1+W] —
  * carried as flatMapGroupsWithState state and re-derived per batch.
  *
  * Unlike the sessionizer (whose open-session merge needs event-time
  * order), the funnel is REPLAY-EXACT under out-of-order arrival: the
  * state keeps the running min view plus every click/purchase that
  * could still qualify under any FUTURE t1 — and since t1 only ever
  * decreases and the window's upper bound t1+W decreases with it, a
  * candidate later than the current t1+W can never qualify again and
  * is dropped. State is therefore bounded by the user's pre-first-view
  * prefix plus one window of events, not their history; the drained
  * answer equals the batch funnel for ANY batch split (FunnelReplaySpec).
  *
  * Emission follows the harness multi-batch contract: each batch
  * re-emits the user's current funnel tagged with the monotonically
  * growing processed-event count, so an append sink dedupes exactly
  * with max-per-user n_processed.
  */
object Funnel {

  case class FunnelEvent(user_id: Long, etype: String, us: Long)
  case class FunnelBuf(minView: Long, clicks: Seq[Long],
                       purchases: Seq[Long], nProcessed: Long)
  case class FunnelOut(user_id: Long, t1: Long, t2: Option[Long],
                       t3: Option[Long], n_processed: Long)

  private val NoView = Long.MaxValue

  /** Pure fold used by both the streaming kernel and the replay spec:
    * merge a batch of events into the buffer and prune candidates that
    * can no longer qualify.
    */
  def step(st: FunnelBuf, events: Seq[FunnelEvent], windowUs: Long): FunnelBuf = {
    var minView = st.minView
    val clicks = Seq.newBuilder[Long]
    val purchases = Seq.newBuilder[Long]
    clicks ++= st.clicks
    purchases ++= st.purchases
    var n = st.nProcessed
    events.foreach { e =>
      n += 1
      e.etype match {
        case "view" => if (e.us < minView) minView = e.us
        case "click" => clicks += e.us
        case "purchase" => purchases += e.us
        case _ => ()
      }
    }
    val hi = if (minView == NoView) Long.MaxValue else minView + windowUs
    FunnelBuf(minView,
      clicks.result().filter(_ <= hi).sorted,
      purchases.result().filter(_ <= hi).sorted, n)
  }

  /** Current funnel answer from a buffer (None until a view exists). */
  def answer(uid: Long, st: FunnelBuf, windowUs: Long): Option[FunnelOut] =
    if (st.minView == NoView) None
    else {
      val t1 = st.minView
      val hi = t1 + windowUs
      val t2 = st.clicks.find(c => c > t1 && c <= hi)
      val t3 = t2.flatMap(t2v => st.purchases.find(p => p > t2v && p <= hi))
      Some(FunnelOut(uid, t1, t2, t3, st.nProcessed))
    }

  def funnelStream(events: Dataset[FunnelEvent],
                   windowUs: Long): Dataset[FunnelOut] = {
    implicit val outEnc = Encoders.product[FunnelOut]
    implicit val stateEnc = Encoders.product[FunnelBuf]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelBuf]) =>
          val st0 = state.getOption
            .getOrElse(FunnelBuf(NoView, Nil, Nil, 0L))
          val st = step(st0, it.toSeq, windowUs)
          state.update(st)
          answer(uid, st, windowUs).iterator
      }
  }
}
