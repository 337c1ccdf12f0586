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
}
