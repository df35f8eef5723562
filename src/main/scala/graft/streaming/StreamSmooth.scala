package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming twins of the `ops.Smoothing` recurrences — EWMA and
  * Holt levels AS THEY HAPPEN, completing the streaming half of the
  * recurrence family next to [[StreamCusum]] (same SlotState-style
  * custom-state surface, same contract):
  *
  *   - state per key is the CURRENT recurrence state + the (ms, tie)
  *     event frontier — never history;
  *   - the arithmetic is the batch operator's EXACTLY: integer
  *     s = (num·v + (den−num)·s) >> k for EWMA (so streamed values
  *     are bit-comparable to `ewmaTrace`), integer floor-halving
  *     (l, b) for Holt (`holtTrace`);
  *   - order sensitivity is handled the [[StreamCusum]] way: a row at
  *     or behind the frontier is COUNTED on every later emission
  *     (`n_late`) and skipped, never woven in at the wrong position —
  *     when late data matters, replay the batch operator over the
  *     stored log; whole-micro-batch at-least-once replays land at
  *     the frontier and therefore never double-apply. There is
  *     deliberately NO watermark on the input: `NoTimeout` state never
  *     uses one for eviction, and a watermark would make Spark drop
  *     very-late rows BEFORE this function — silently undercounting
  *     `n_late`, the one signal the contract promises is loud.
  *
  * The scale contract mirrors the batch chunked scans from the other
  * direction: a stream only ever holds O(keys) state (two longs + a
  * frontier per key), so the hot-key problem the chunked scans solve
  * for BATCH replay does not exist here — arrival order IS the scan.
  */
object StreamSmooth {

  case class SmoothEvent(key: Long, ts: Timestamp, tie: Long, v: Long)
  case class EwmaPoint(key: Long, ts: Timestamp, tie: Long, v: Long,
                       ewma: Long, n_late: Long)
  case class HoltPoint(key: Long, ts: Timestamp, tie: Long, v: Long,
                       level: Long, trend: Long, n_late: Long)
  private[streaming] case class EwState(s: Long, lastTsMs: Long, lastTie: Long,
                                        nLate: Long, seeded: Boolean)
  private[streaming] case class HoState(l: Long, b: Long, lastTsMs: Long,
                                        lastTie: Long, nLate: Long, seeded: Boolean)

  /** Streaming integer-exact EWMA (alpha = num/2^log2Den), the
    * `ewmaTrace` semantics: s_1 = v_1, then
    * s = (num·v + (den−num)·s) >> log2Den. Negative or
    * overflow-range values raise in-stream, the batch guard. */
  def ewmaTrace(events: Dataset[SmoothEvent], num: Int,
                log2Den: Int): Dataset[EwmaPoint] = {
    require(log2Den >= 1 && log2Den <= 30,
      s"StreamSmooth.ewmaTrace: log2Den must be in [1,30], got $log2Den")
    val den = 1L << log2Den
    require(num >= 1 && num <= den,
      s"StreamSmooth.ewmaTrace: num must be in [1, $den], got $num")
    val vMax = Long.MaxValue / den
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[EwState, EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[SmoothEvent], state: GroupState[EwState]) =>
          var st = state.getOption.getOrElse(
            EwState(0L, Long.MinValue, Long.MinValue, 0L, false))
          val out = scala.collection.mutable.ArrayBuffer[EwmaPoint]()
          rows.toSeq.sortBy(e => (e.ts.getTime, e.tie)).foreach { e =>
            if (e.v < 0) throw new IllegalArgumentException(
              s"StreamSmooth.ewmaTrace: negative v=${e.v} for key $key — " +
                "floor vs truncate division diverges; shift values non-negative first")
            if (e.v > vMax) throw new IllegalArgumentException(
              s"StreamSmooth.ewmaTrace: v=${e.v} exceeds Long.MaxValue/den=$vMax " +
                s"for key $key — the num*v term would overflow; rescale the input units")
            val tMs = e.ts.getTime
            val late = st.seeded &&
              (tMs < st.lastTsMs || (tMs == st.lastTsMs && e.tie <= st.lastTie))
            if (late) {
              st = st.copy(nLate = st.nLate + 1)
            } else {
              val s2 = if (!st.seeded) e.v
                else (num * e.v + (den - num) * st.s) >> log2Den
              st = EwState(s2, tMs, e.tie, st.nLate, seeded = true)
              out += EwmaPoint(key, e.ts, e.tie, e.v, s2, st.nLate)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming integer-exact Holt (α = β = ½), the `holtTrace`
    * semantics: l_1 = v_1, b_1 = 0; l = (v + l' + b') >> 1;
    * b = (l − l' + b') >> 1 (arithmetic shift = floor for both
    * signs — negatives are fine, as in the batch operator). */
  def holtTrace(events: Dataset[SmoothEvent]): Dataset[HoltPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[HoState, HoltPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[SmoothEvent], state: GroupState[HoState]) =>
          var st = state.getOption.getOrElse(
            HoState(0L, 0L, Long.MinValue, Long.MinValue, 0L, false))
          val out = scala.collection.mutable.ArrayBuffer[HoltPoint]()
          rows.toSeq.sortBy(e => (e.ts.getTime, e.tie)).foreach { e =>
            val tMs = e.ts.getTime
            val late = st.seeded &&
              (tMs < st.lastTsMs || (tMs == st.lastTsMs && e.tie <= st.lastTie))
            if (late) {
              st = st.copy(nLate = st.nLate + 1)
            } else {
              val (l2, b2) =
                if (!st.seeded) (e.v, 0L)
                else {
                  val l = (e.v + st.l + st.b) >> 1
                  (l, (l - st.l + st.b) >> 1)
                }
              st = HoState(l2, b2, tMs, e.tie, st.nLate, seeded = true)
              out += HoltPoint(key, e.ts, e.tie, e.v, l2, b2, st.nLate)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
