package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization via
  * `flatMapGroupsWithState` (SURVEY.md §2.9 — the Spark-native stateful
  * operator the reference's batch pipelines never needed; included as
  * part of the streaming surface).
  *
  * Timestamps travel as epoch MICROS (long) so gap arithmetic is exact
  * and engine-portable. Each batch merges its events with the open
  * session carried in state, splits on gaps strictly greater than the
  * gap, emits every session observed so far (provisional for the still
  * -open one, final for closed ones — update-style emission), and
  * stores the open tail back in state for the next batch.
  *
  * Multi-batch contract: the open session re-emits each batch with the
  * SAME start and monotonically growing (end, n), so a sink drained
  * across batches dedupes exactly with max-per-(user,start) — pinned
  * by SessionizeReplaySpec — PROVIDED batches arrive in event-time
  * order (the file-inbox handoff shape). An event older than the open
  * session's start would retroactively change a session start, which
  * no append-sink read-back can repair; true out-of-order streams
  * belong to Spark's watermarked session_window, at the cost of this
  * kernel's exact custom gap/merge semantics.
  */
object Sessionize {

  case class SessionEvent(user_id: Long, ts_us: Long)
  case class OpenSession(startUs: Long, endUs: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  def sessionsOf(uid: Long, sorted: Seq[(Long, Long, Long)],
                 gapUs: Long): Seq[SessionOut] = {
    val out = Seq.newBuilder[SessionOut]
    var cur: Option[(Long, Long, Long)] = None
    for ((s, e, n) <- sorted) {
      cur match {
        case Some((cs, ce, cn)) if s - ce <= gapUs =>
          cur = Some((cs, math.max(ce, e), cn + n))
        case Some((cs, ce, cn)) =>
          out += SessionOut(uid, cs, ce, cn)
          cur = Some((s, e, n))
        case None => cur = Some((s, e, n))
      }
    }
    cur.foreach { case (cs, ce, cn) => out += SessionOut(uid, cs, ce, cn) }
    out.result()
  }

  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[SessionOut] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val units = it.map(e => (e.ts_us, e.ts_us, 1L)).toSeq.sortBy(_._1)
          val carried = state.getOption
            .map(s => (s.startUs, s.endUs, s.n)).toSeq
          val sessions = sessionsOf(uid, (carried ++ units).sortBy(_._1), gapUs)
          if (sessions.nonEmpty) {
            val last = sessions.last
            state.update(OpenSession(last.start_us, last.end_us, last.n_events))
          }
          sessions.iterator
      }
  }
}
