package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming CUSUM monitor — the stateful twin of
  * `ops.Smoothing.cusumTrace`, for watching the shift AS IT HAPPENS
  * (error-rate spikes, latency creep) instead of replaying history:
  * per key the only state is the current statistic and the event
  * frontier, updated by `flatMapGroupsWithState` (the SlotState
  * custom-state surface).
  *
  * Ordering contract — the honest streaming trade-off: CUSUM is
  * order-sensitive and the state keeps no history, so a row at or
  * behind the frontier (its (ts, tie) ≤ the last applied one) CANNOT
  * be applied retroactively. Such late rows are COUNTED (`n_late`
  * rides every emission, so a nonzero count is loudly visible) and
  * skipped, never silently woven in at the wrong position; when late
  * data matters, replay the batch operator over the stored log — it
  * is the exact tool. The frontier is millisecond + tie (Timestamp
  * ms precision in state), matching the batch order for any feed
  * whose ties are broken by `tie`. There is deliberately NO
  * watermark on the input: `NoTimeout` state never uses one for
  * eviction, and a watermark would make Spark drop very-late rows
  * BEFORE this function — silently undercounting `n_late`, the one
  * signal this contract promises is loud.
  *
  * At-least-once replays of a whole micro-batch re-present rows at
  * the frontier: they count as late and leave the statistic
  * unchanged — replays never double-apply.
  */
object StreamCusum {

  case class CusumEvent(key: Long, ts: Timestamp, tie: Long, v: Long)
  case class CusumPoint(key: Long, ts: Timestamp, tie: Long, v: Long,
                        cusum: Long, alarm: Boolean, n_late: Long)
  private[streaming] case class CState(s: Long, lastTsMs: Long, lastTie: Long,
                                       nLate: Long, seeded: Boolean)

  def trace(events: Dataset[CusumEvent], target: Long,
            threshold: Long): Dataset[CusumPoint] = {
    require(threshold >= 0, s"StreamCusum: threshold must be >= 0, got $threshold")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[CState, CusumPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[CusumEvent], state: GroupState[CState]) =>
          var st = state.getOption.getOrElse(CState(0L, Long.MinValue, Long.MinValue, 0L, false))
          val out = scala.collection.mutable.ArrayBuffer[CusumPoint]()
          rows.toSeq.sortBy(e => (e.ts.getTime, e.tie)).foreach { e =>
            val tMs = e.ts.getTime
            val late = st.seeded &&
              (tMs < st.lastTsMs || (tMs == st.lastTsMs && e.tie <= st.lastTie))
            if (late) {
              st = st.copy(nLate = st.nLate + 1)
            } else {
              val s2 = math.max(0L, st.s + e.v - target)
              st = CState(s2, tMs, e.tie, st.nLate, seeded = true)
              out += CusumPoint(key, e.ts, e.tie, e.v, s2, s2 > threshold, st.nLate)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
