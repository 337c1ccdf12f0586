package graft.streaming

import graft.kernels.HeavyHitters
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming top-k per event-time window: the SpaceSaving summary
  * (kernels/HeavyHitters.scala) carried as flatMapGroupsWithState
  * state, one k-counter sketch per open window — the streaming form
  * of the frequent-items census. State is bounded by construction
  * (k entries per window, never the key universe), which is the whole
  * point at firehose scale: a windowed groupBy count holds every
  * distinct key in state, the sketch holds k.
  *
  * Emission follows the Sessionize multi-batch contract: every batch
  * re-emits the window's current top-N tagged with the monotonically
  * growing processed-event total, so an append sink dedupes exactly
  * with max-per-(window, rank) — pinned by StreamTopKSpec across
  * batch splits.
  */
object StreamTopK {

  case class KeyedEvent(window_us: Long, key: String)
  case class TopKOut(window_us: Long, rank: Int, key: String,
                     est: Long, err: Long, n_processed: Long)

  /** A keyed event carrying its own event time — the TTL variant's
    * input (the watermark travels on `ts`).
    */
  case class TimedEvent(window_us: Long, key: String, ts: java.sql.Timestamp)

  def topkStream(events: Dataset[KeyedEvent], capacity: Int,
                 topN: Int): Dataset[TopKOut] = {
    implicit val outEnc = Encoders.product[TopKOut]
    implicit val stateEnc = Encoders.product[HeavyHitters.SsBuf]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.window_us)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (w: Long, it: Iterator[KeyedEvent],
         state: GroupState[HeavyHitters.SsBuf]) =>
          // rehydrate the mutable Stream-Summary from the row-encoded
          // state, fold the batch through it, persist the wire form
          val sum = HeavyHitters.Summary.fromBuf(capacity,
            state.getOption.getOrElse(HeavyHitters.SsBuf(Nil, lossy = false)))
          it.foreach(e => sum.add(e.key))
          val buf = sum.toBuf
          state.update(buf)
          val total = buf.entries.map(_.count).sum
          buf.entries.take(topN).zipWithIndex.map { case (e, i) =>
            TopKOut(w, i + 1, e.token, e.count, e.err, total)
          }.iterator
      }
  }

  /** Bounded-state variant (the flagPairsTtl posture applied to
    * windows): a window's sketch evicts after `ttl` of EVENT-time
    * idleness past the watermark, so an unbounded stream holds sketches
    * only for windows still inside the lateness horizon instead of
    * every window ever opened — [[topkStream]]'s NoTimeout state grows
    * one sketch per window forever, which is fine for a bounded drain
    * and wrong for a deployment. The input must carry a watermark on
    * `ts`; the effective retention is ttl + the watermark delay. Late
    * data for an evicted window re-seeds an empty sketch (the counts
    * restart) — the same deliberate trade as the TTL'd dedup index,
    * and why `n_processed` stays the dedup key: a re-seeded window's
    * re-emissions carry smaller totals and lose max-per-(window, rank).
    */
  def topkStreamTtl(events: Dataset[TimedEvent], capacity: Int, topN: Int,
                    ttl: scala.concurrent.duration.FiniteDuration)
      : Dataset[TopKOut] = {
    implicit val outEnc = Encoders.product[TopKOut]
    implicit val stateEnc = Encoders.product[HeavyHitters.SsBuf]
    implicit val keyEnc = Encoders.scalaLong
    val ttlMs = ttl.toMillis
    events.groupByKey(_.window_us)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (w: Long, it: Iterator[TimedEvent],
         state: GroupState[HeavyHitters.SsBuf]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val hits = it.toArray
            val sum = HeavyHitters.Summary.fromBuf(capacity,
              state.getOption.getOrElse(HeavyHitters.SsBuf(Nil, lossy = false)))
            hits.foreach(e => sum.add(e.key))
            val buf = sum.toBuf
            state.update(buf)
            // timeout strictly beyond the current watermark (a late
            // batch must refresh, not schedule an already-past sweep)
            val maxTs = hits.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs + 1, maxTs + ttlMs))
            val total = buf.entries.map(_.count).sum
            buf.entries.take(topN).zipWithIndex.map { case (e, i) =>
              TopKOut(w, i + 1, e.token, e.count, e.err, total)
            }.iterator
          }
      }
  }
}
