package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming one-sided CUSUM (Page 1954) against a KNOWN target level —
  * the monitor a metrics pipeline actually deploys: the batch form
  * (`window_cusum`) baselines on the per-user mean, which a stream
  * cannot know up front, so the streaming detector runs the classic
  * tabular form S_t = max(0, S_{t-1} + vu_t − target − k) and carries
  * exactly SIX longs of state per user (current S, alarms so far,
  * events so far, the last-folded (us, event_id) watermark, and the
  * violation counter) — state is O(users), independent of stream
  * length, with every step exact integer micros.
  *
  * Multi-batch contract (the sessionize discipline): events fold in
  * (ts, event_id) order within each batch, and each batch re-emits the
  * user's current summary tagged with the monotonically growing
  * processed-event count, so an append sink dedupes exactly with
  * max-per-user n_processed — PROVIDED batches arrive in event-time
  * order (the file-inbox handoff shape). An event older than the
  * folded prefix would retroactively change S's trajectory, which no
  * append-sink read-back can repair; true out-of-order streams need a
  * watermark-delayed fold at the cost of bounded-state emission. The
  * contract is ENFORCED, not just documented: the state carries the
  * last folded (us, event_id) and any batch event at-or-before that
  * watermark increments `n_violations`, surfaced on every output row —
  * silent trajectory corruption becomes a loud, monitorable counter.
  * Violating events are SKIPPED (counted, never folded): the folded
  * prefix is a pure function of the distinct in-order event set, so
  * an at-least-once upstream's replayed duplicate batch leaves
  * S/n_processed/n_alarms bit-identical to exactly-once delivery
  * (CusumReplaySpec pins the duplicated-batch case). The counter
  * cannot distinguish a replayed duplicate from a genuinely late
  * novel event — both are at-or-before the watermark — so a late
  * arrival is dropped from the trajectory rather than folded out of
  * order (which would corrupt S retroactively for every later step);
  * n_violations > 0 remains the signal to investigate the upstream.
  */
object Cusum {

  case class CusumEvent(user_id: Long, event_id: Long, us: Long, vu: Long)
  case class CusumBuf(s: Long, nAlarms: Long, n: Long,
                      lastUs: Long = Long.MinValue,
                      lastEid: Long = Long.MinValue,
                      nViolations: Long = 0L)
  case class CusumOut(user_id: Long, n_processed: Long, s_micro: Long,
                      n_alarms: Long, n_violations: Long)

  /** Pure fold shared by the streaming kernel and the replay spec. */
  def step(st: CusumBuf, events: Seq[CusumEvent], target: Long,
           drift: Long, threshold: Long): CusumBuf = {
    var s = st.s; var alarms = st.nAlarms; var n = st.n
    var lastUs = st.lastUs; var lastEid = st.lastEid
    var violations = st.nViolations
    events.sortBy(e => (e.us, e.event_id)).foreach { e =>
      // Ordered-batches contract check: an event at or before the
      // folded prefix is counted loudly and SKIPPED — folding it at
      // arrival position would corrupt S retroactively, and skipping
      // makes a replayed duplicate batch (at-least-once upstream)
      // fold to the exactly-once trajectory bit-identically.
      if (e.us < lastUs || (e.us == lastUs && e.event_id <= lastEid))
        violations += 1
      else {
        lastUs = e.us; lastEid = e.event_id
        s = math.max(0L, s + (e.vu - target - drift))
        if (s > threshold) alarms += 1
        n += 1
      }
    }
    CusumBuf(s, alarms, n, lastUs, lastEid, violations)
  }

  def cusumStream(events: Dataset[CusumEvent], target: Long, drift: Long,
                  threshold: Long): Dataset[CusumOut] = {
    implicit val outEnc = Encoders.product[CusumOut]
    implicit val stateEnc = Encoders.product[CusumBuf]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[CusumEvent], state: GroupState[CusumBuf]) =>
          val st = step(state.getOption.getOrElse(CusumBuf(0L, 0L, 0L)),
            it.toSeq, target, drift, threshold)
          state.update(st)
          Iterator.single(CusumOut(uid, st.n, st.s, st.nAlarms,
            st.nViolations))
      }
  }
}
