package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort retention: per user, the set of active days is
  * carried as flatMapGroupsWithState state (bounded by the number of
  * DISTINCT active days, never the event count), and each batch
  * re-emits the user's full (cohort day0, offset set) so the drain
  * recomputes the (cohort, offset) -> distinct-user rollup exactly.
  *
  * Replay-exact under out-of-order arrival for the same reason the
  * streaming funnel is: day0 = min(active days) only ever decreases,
  * and offsets are re-derived from the authoritative day set each
  * emission, so a late earlier day re-bases the user's whole cohort
  * row. The drain dedupes on max n_processed per user (the harness
  * multi-batch contract) BEFORE the distinct-user aggregation.
  */
object Retention {

  case class DayEvent(user_id: Long, epoch_day: Int)
  case class DaysBuf(days: Seq[Int], nProcessed: Long)
  case class RetentionOut(user_id: Long, day0: Int, offsets: Seq[Int],
                          n_processed: Long)

  def retentionStream(events: Dataset[DayEvent]): Dataset[RetentionOut] = {
    implicit val outEnc = Encoders.product[RetentionOut]
    implicit val stateEnc = Encoders.product[DaysBuf]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[DayEvent], state: GroupState[DaysBuf]) =>
          val st0 = state.getOption.getOrElse(DaysBuf(Nil, 0L))
          var n = st0.nProcessed
          val days = scala.collection.mutable.SortedSet[Int](st0.days: _*)
          it.foreach { e => n += 1; days += e.epoch_day }
          val st = DaysBuf(days.toSeq, n)
          state.update(st)
          if (days.isEmpty) Iterator.empty
          else {
            val d0 = days.head
            Iterator.single(
              RetentionOut(uid, d0, days.toSeq.map(_ - d0), n))
          }
      }
  }
}
