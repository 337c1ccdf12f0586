package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply — the online half of the warehouse CDC family
  * (CdcQueries.merge_upsert is the batch MERGE): a keyed changelog
  * streams in, per-key state keeps only the WINNING op under the
  * (ts, event_id) total order — later timestamp wins, equal
  * timestamps break by higher event_id — and a delete op tombstones
  * the key without dropping its state (a still-later upsert must be
  * able to revive it, and an out-of-order earlier op must lose to the
  * tombstone).
  *
  * State is O(1) per key — five fields — never the changelog length;
  * a production table with billions of keys shards by the grouping
  * key exactly like any stateful aggregation. Each batch re-emits the
  * key's current row with a monotone n_processed, so the harness
  * drain (max n_processed per key) is replay-exact under any batch
  * split and any arrival order: the winning op is a max over a total
  * order, which is associative, commutative and idempotent.
  */
object CdcApply {

  case class CdcOp(user_id: Long, us: Long, event_id: Long,
                   value: Double, delete: Boolean)
  case class CdcState(us: Long, event_id: Long, value: Double,
                      deleted: Boolean, nProcessed: Long)
  case class CdcRow(user_id: Long, us: Long, event_id: Long,
                    value: Double, deleted: Boolean, n_processed: Long)

  def applyStream(ops: Dataset[CdcOp]): Dataset[CdcRow] = {
    implicit val outEnc = Encoders.product[CdcRow]
    implicit val stateEnc = Encoders.product[CdcState]
    implicit val keyEnc = Encoders.scalaLong
    ops.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[CdcOp], state: GroupState[CdcState]) =>
          var st = state.getOption
            .getOrElse(CdcState(Long.MinValue, Long.MinValue, 0.0, true, 0L))
          var n = st.nProcessed
          it.foreach { op =>
            n += 1
            if (op.us > st.us ||
                (op.us == st.us && op.event_id > st.event_id))
              st = CdcState(op.us, op.event_id, op.value, op.delete, n)
          }
          st = st.copy(nProcessed = n)
          state.update(st)
          if (st.us == Long.MinValue) Iterator.empty
          else Iterator.single(
            CdcRow(uid, st.us, st.event_id, st.value, st.deleted, n))
      }
  }
}
