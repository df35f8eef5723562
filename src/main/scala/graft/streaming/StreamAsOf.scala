package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming as-of join — the feature-store lookup: for every probe
  * event, the most recent quote on the same key with `quote.ts <=
  * probe.ts` (left-outer: a probe with no prior quote emits null).
  * The streaming analogue of the batch `Joins.asOfJoin`.
  *
  * Why not a stream-stream join: Spark's interval join
  * (`StreamJoins.withinTolerance`) emits EVERY quote in a window, not
  * "the latest at-or-before", and a max-per-probe on top of it is a
  * second stateful aggregation over an append stream — late quotes
  * would be matched or missed nondeterministically. The correct unit
  * is explicit keyed state (`flatMapGroupsWithState`): a probe is
  * FINALIZED exactly when the event-time watermark passes its
  * timestamp — at that point no quote at-or-before it can still
  * arrive (any such quote would itself be below the watermark and is
  * evicted as late), so each probe is emitted once, in append mode,
  * with a deterministic answer.
  *
  * State per key is bounded: quotes above the watermark plus ONE
  * floor quote (the latest at-or-below — it stays valid for future
  * probes indefinitely, like any KV feature store), and pending
  * probes within the watermark horizon. O(rate × watermark delay)
  * + O(1) per key, independent of stream length.
  *
  * Late arrivals (below the watermark when their micro-batch runs)
  * are EVICTED, never emitted: the batch path's as-of over the stored
  * table handles older backfill, mirroring ST3's split.
  *
  * Duplicate-(key, ts) quotes resolve to the LARGEST value — an
  * explicit rule so the answer never depends on arrival or
  * partition-merge order (the batch asOfJoin rejects such duplicates;
  * a stream can't reject, so it resolves them stably).
  */
object StreamAsOf {

  case class ProbeEvent(key: Long, ts: Timestamp, probe_id: Long)
  case class QuoteEvent(key: Long, ts: Timestamp, value: Double)
  case class AsOfMatch(key: Long, probe_id: Long, probe_ts: Timestamp,
                       quote_ts: Option[Timestamp], value: Option[Double])

  // tagged union row: probes carry probe_id, quotes carry value
  private[streaming] case class In(key: Long, ts: Timestamp, isProbe: Boolean,
                                   probe_id: Long, value: Double)
  // flat state (parallel lists): nested case-class fields trip the
  // state encoder's generated-code method resolution (see SlotState)
  private[streaming] case class State(quoteTs: List[Long], quoteVal: List[Double],
                                      probeTs: List[Long], probeId: List[Long])

  /** Latest quote at-or-before tsMs. Duplicate-(key, ts) quotes
    * resolve to the LARGEST value — an explicit deterministic rule
    * (mirroring the batch asOfJoin's stance that arrival/merge order
    * must never pick the payload; the batch form rejects duplicates
    * outright, a stream cannot reject retractions-as-dups so it
    * resolves them stably instead). */
  private def latestAtOrBefore(s: State, tsMs: Long): Option[(Long, Double)] =
    s.quoteTs.iterator.zip(s.quoteVal.iterator)
      .filter(_._1 <= tsMs)
      .reduceOption((a, b) =>
        if (b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)) b else a)

  /** Emit every pending probe the watermark has passed; prune emitted
    * probes and quotes older than the floor; arm the timeout for the
    * earliest still-pending probe. */
  private def finalize(key: Long, s: State, watermarkMs: Long,
                       state: GroupState[State]): Iterator[AsOfMatch] = {
    val (ripe, pending) = s.probeTs.zip(s.probeId).partition(_._1 <= watermarkMs)
    val out = ripe.sortBy(p => (p._1, p._2)).map { case (pTs, pId) =>
      val m = latestAtOrBefore(s, pTs)
      AsOfMatch(key, pId, new Timestamp(pTs),
        m.map(q => new Timestamp(q._1)), m.map(_._2))
    }
    // quote retention: everything above the watermark can still serve
    // future probes; below it only the newest (the floor) can. Collapse
    // duplicate timestamps to their max value (the same deterministic
    // tie rule the lookup applies) and keep the list sorted so state
    // layout is independent of arrival order.
    val floor = s.quoteTs.filter(_ <= watermarkMs).maxOption
    val keep = s.quoteTs.zip(s.quoteVal)
      .filter { case (t, _) => t > watermarkMs || floor.contains(t) }
      .groupBy(_._1).map { case (t, vs) => (t, vs.map(_._2).max) }
      .toList.sortBy(_._1)
    val next = State(keep.map(_._1), keep.map(_._2), pending.map(_._1), pending.map(_._2))
    if (next.quoteTs.isEmpty && next.probeTs.isEmpty) state.remove()
    else {
      state.update(next)
      // fire again when the watermark passes the earliest pending probe
      // (strictly above the current watermark by construction)
      pending.map(_._1).minOption.foreach(state.setTimeoutTimestamp)
    }
    out.iterator
  }

  private def update(key: Long, rows: Iterator[In],
                     state: GroupState[State]): Iterator[AsOfMatch] = {
    val wm = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(State(Nil, Nil, Nil, Nil))
    val merged =
      if (state.hasTimedOut) prev
      else rows.foldLeft(prev) { (s, r) =>
        val t = r.ts.getTime
        if (t <= wm) s // late arrival: evicted (batch backfill path owns it)
        else if (r.isProbe) s.copy(probeTs = t :: s.probeTs, probeId = r.probe_id :: s.probeId)
        else s.copy(quoteTs = t :: s.quoteTs, quoteVal = r.value :: s.quoteVal)
      }
    finalize(key, merged, wm, state)
  }

  /** Watermarked stream as-of: probes and quotes are independently
    * watermarked (the operator's watermark = min of the two), unioned
    * into one keyed stream, and resolved in explicit state. Append
    * output: one row per non-late probe, emitted exactly once. */
  def asOfMatches(probes: Dataset[ProbeEvent], quotes: Dataset[QuoteEvent],
                  watermark: String = "10 minutes"): Dataset[AsOfMatch] = {
    val spark = probes.sparkSession
    import spark.implicits._
    val p = probes.map(e => In(e.key, e.ts, isProbe = true, e.probe_id, 0.0))
      .withWatermark("ts", watermark)
    val q = quotes.map(e => In(e.key, e.ts, isProbe = false, 0L, e.value))
      .withWatermark("ts", watermark)
    p.unionByName(q)
      .groupByKey(_.key)
      .flatMapGroupsWithState[State, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
