package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming gap-based sessionization — the stateful twin of the
  * batch `q_sessionize` window (lag + running session starts): per
  * user the only state is the OPEN session (start, end, count) and
  * the late ledger; a session CLOSES and emits either when a new row
  * arrives more than `gapMinutes` after the session end, or when the
  * event-time watermark passes end + gap (`EventTimeTimeout`) — the
  * flush that pure gap logic cannot do, because "no more rows can
  * extend this session" is a watermark fact, not a row fact.
  *
  * Ordering contract (the StreamCusum precedent): session extension
  * is order-sensitive, so a row at or behind the frontier (its
  * (ts ms, tie) ≤ the last applied one) is COUNTED in `n_late` on
  * the eventual emission and skipped, never woven in retroactively —
  * at-least-once replays of a whole micro-batch therefore never
  * double-count an event. When late data matters, replay the batch
  * operator over the stored log; streamed ≡ batch on any in-order
  * feed is exactly what the spec proves.
  *
  * Scale: state is O(1) per active user (five longs), the shuffle
  * key is the user — the dimension that grows at 100 TB — and
  * watermark timeouts garbage-collect idle users' state.
  */
object StreamSessions {

  case class SessEvent(user: Long, ts: Timestamp, tie: Long)
  case class Session(user: Long, sess_start: Timestamp, sess_end: Timestamp,
                     n_events: Long, n_late: Long)
  private[streaming] case class SState(startMs: Long, endMs: Long, lastTie: Long,
                                       n: Long, nLate: Long)

  def sessions(events: Dataset[SessEvent], gapMinutes: Int,
               watermark: String = "1 hour"): Dataset[Session] = {
    require(gapMinutes >= 1, s"StreamSessions: gapMinutes must be >= 1, got $gapMinutes")
    val gapMs = gapMinutes.toLong * 60000L
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user)
      .flatMapGroupsWithState[SState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[SState]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: nothing can extend this
            // session any more — flush it and drop the state
            val st = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(st.startMs),
              new Timestamp(st.endMs), st.n, st.nLate))
          } else {
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            var st = state.getOption.orNull
            rows.toSeq.sortBy(e => (e.ts.getTime, e.tie)).foreach { e =>
              val tMs = e.ts.getTime
              if (st == null) {
                st = SState(tMs, tMs, e.tie, 1L, 0L)
              } else if (tMs < st.endMs || (tMs == st.endMs && e.tie <= st.lastTie)) {
                st = st.copy(nLate = st.nLate + 1) // late ledger, never re-woven
              } else if (tMs - st.endMs <= gapMs) {
                st = st.copy(endMs = tMs, lastTie = e.tie, n = st.n + 1)
              } else {
                out += Session(user, new Timestamp(st.startMs),
                  new Timestamp(st.endMs), st.n, st.nLate)
                st = SState(tMs, tMs, e.tie, 1L, 0L)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.endMs + gapMs)
            out.iterator
          }
      }
  }
}
