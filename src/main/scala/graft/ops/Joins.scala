package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in equi-join can't express:
  * as-of (most recent match at-or-before) and point-in-interval range
  * join. Both are restated as shuffle-friendly plans instead of the
  * naive O(|L|·|R|) theta-join Spark would otherwise plan
  * (BroadcastNestedLoopJoin — a non-starter at scale).
  */
object Joins {

  /** As-of join: for every left row, attach the payload of the most
    * recent right row with the same key and `rightTs` ≤ `leftTs`
    * (ties on the timestamp broken by the largest `tieBreak` value —
    * an explicit total order, so the result is deterministic under
    * any partitioning).
    *
    * Plan shape: tag both sides, union, then one window pass per key
    * ordered by (ts, side, tieBreak) taking the last non-null payload
    * seen so far. Cost = ONE shuffle on the key + one sort — the same
    * as a windowed dedup, linear in |L|+|R|. The alternative range
    * join (`l.ts >= r.ts` theta-join + keep-latest) is quadratic per
    * key. This is the standard large-scale as-of shape (market-data
    * joins, feature lookups "as of" a training example's timestamp).
    *
    * Right rows sort BEFORE left rows at an equal timestamp (side 0 <
    * side 1), making the match at-or-before INCLUSIVE of equal ts.
    * `tieBreak` must be unique per (key, rightTs) — with duplicates
    * the picked payload would depend on partition merge order, so the
    * contract is ENFORCED: a duplicate (key, rightTs, tieBreak) right
    * row fails the job loudly (same policy as `Packing.packByBudget`'s
    * duplicate-order guard). The probe is a lag over the ordering the
    * window pass already sorts by — no extra shuffle or sort.
    *
    * @param payload right-side columns to carry; emitted under their
    *                own names (must not collide with left's columns).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, tieBreak: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!(leftCols ++ right.columns).exists(_.startsWith("__")),
      "asOfJoin reserves the __-prefixed column namespace internally")
    val pStruct = struct(payload.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(tieBreak).as("__tie"), pStruct.as("__p"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("__l")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(r.schema("__tie").dataType).as("__tie"),
        lit(null).cast(r.schema("__p").dataType).as("__p"),
        struct(leftCols.map(col): _*).as("__l")): _*)
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_first)
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // duplicate right rows are adjacent in the window order, so one lag
    // detects them; the flag is hoisted to the whole key partition
    // (unordered max, same hash partitioning — no new exchange) and
    // poisons the output rather than letting merge order pick a winner
    // null-SAFE comparisons throughout: null rightTs rows sort adjacent
    // too, and null === null is null (not true), which would let them
    // evade the guard entirely
    val dupHere = col("__side") === 0 &&
      (lag(col("__ts"), 1).over(ord) <=> col("__ts")) &&
      (lag(col("__side"), 1).over(ord) <=> 0) &&
      (lag(col("__tie"), 1).over(ord) <=> col("__tie"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    r.unionByName(l)
      .withColumn("__dup", when(dupHere, 1).otherwise(0))
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .withColumn("__anydup", max(col("__dup")).over(wAll))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c")) ++
        payload.map(p =>
          when(col("__anydup") > 0,
            raise_error(concat(
              lit(s"asOfJoin: duplicate (key, $rightTs, $tieBreak) right rows make the "),
              lit("pick partition-order-dependent; dedup the right side or supply a unique tie-break")))
              .cast(r.schema("__p").dataType.asInstanceOf[org.apache.spark.sql.types.StructType](p).dataType))
            .otherwise(col(s"__asof.$p")).as(p)): _*)
  }

  /** Point-in-interval range join: rows of `points` matched to every
    * row of `intervals` whose half-open [startCol, endCol) contains
    * `pointCol`. All three columns must share a numeric domain (epoch
    * seconds, epoch days, ...).
    *
    * Plan shape: each interval is exploded onto the fixed-width
    * buckets it covers, each point hashes to its one bucket, and the
    * match becomes a plain equi-join on the bucket id with the exact
    * range predicate as a post-filter — shuffle-partitionable, AQE-
    * skew-splittable, no nested-loop. Replication factor per interval
    * is len/bucketWidth + 1, so pick bucketWidth near the MEDIAN
    * interval length: big buckets duplicate points' candidate sets,
    * tiny buckets duplicate intervals. (The bucket column is an
    * engine-internal join key, never exposed.)
    *
    * Empty or inverted intervals (end ≤ start) match nothing, by the
    * half-open contract. Bucket ids come from a floor of a double
    * division (correct for negative domains, unlike truncating
    * integer division) — exact for |value| < 2⁵³, far past any
    * epoch-seconds/days domain.
    *
    * Replication is CAPPED at `maxReplication` buckets per interval,
    * enforced per row: one open-ended sentinel interval (end =
    * Long.MaxValue) would otherwise explode into billions of array
    * elements and kill the job before the join starts. Callers with
    * legitimate outliers either clamp the sentinel end first or raise
    * the cap deliberately — a loud failure beats a silent OOM.
    */
  def rangeJoinByBucket(points: DataFrame, intervals: DataFrame,
                        pointCol: String, startCol: String, endCol: String,
                        bucketWidth: Long, maxReplication: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxReplication > 0, "maxReplication must be positive")
    val firstBucket = floor(col(startCol) / bucketWidth)
    val lastBucket = floor((col(endCol) - 1) / bucketWidth)
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(when(lastBucket - firstBucket >= maxReplication,
          raise_error(concat(
            lit(s"rangeJoinByBucket: interval spans more than $maxReplication buckets "),
            lit(s"of width $bucketWidth (open-ended sentinel end? clamp it or raise the cap): ["),
            col(startCol).cast("string"), lit(", "), col(endCol).cast("string"), lit(")")))
            .cast("array<bigint>"))
          .otherwise(sequence(firstBucket, lastBucket))))
    val pt = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    pt.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join — "which A ranges intersect
    * which B ranges" (sessions × incidents, validity windows ×
    * maintenance windows) — as a bucketed EQUI-join, the
    * `rangeJoinByBucket` construction on both sides: each half-open
    * [start, end) interval replicates to the buckets it covers, pairs
    * meet on the bucket key, and the exact predicate
    * `aStart < bEnd && bStart < aEnd` post-filters.
    *
    * Exactly-once emission without a distinct: an overlapping pair
    * is live in every shared bucket, so only the MEETING bucket —
    * the bucket of max(aStart, bStart), the first where both are
    * live (which both sides provably cover: it holds the later
    * interval's start, and the earlier interval spans it since its
    * end > later start lands in or beyond it) — emits the pair.
    *
    * Same loud replication cap as `rangeJoinByBucket` on BOTH sides
    * (an open-ended sentinel interval would otherwise replicate to
    * every bucket of the domain). Column names of `a` and `b` must
    * be disjoint (loud). Output: a's columns ++ b's columns ++
    * overlap_start/overlap_end (the intersection).
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          aStart: String, aEnd: String,
                          bStart: String, bEnd: String,
                          bucketWidth: Long,
                          maxReplication: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxReplication > 0, "maxReplication must be positive")
    val clash = a.columns.toSet.intersect(b.columns.toSet)
    require(clash.isEmpty,
      s"intervalOverlapJoin: column name collision between sides: $clash")
    require(!(a.columns ++ b.columns).exists(_.startsWith("__")),
      "intervalOverlapJoin reserves the __-prefixed namespace")
    def spread(df: DataFrame, s: String, e: String): DataFrame = {
      val first = floor(col(s) / bucketWidth)
      val last = floor((col(e) - 1) / bucketWidth)
      df.where(col(e) > col(s))
        .withColumn("__bucket",
          explode(when(last - first >= maxReplication,
            raise_error(concat(
              lit(s"intervalOverlapJoin: interval spans more than $maxReplication buckets "),
              lit(s"of width $bucketWidth: ["), col(s).cast("string"),
              lit(", "), col(e).cast("string"), lit(")"))).cast("array<bigint>"))
            .otherwise(sequence(first, last))))
    }
    spread(a, aStart, aEnd).join(spread(b, bStart, bEnd), Seq("__bucket"))
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("__bucket") === floor(greatest(col(aStart), col(bStart)) / bucketWidth))
      .drop("__bucket")
      .withColumn("overlap_start", greatest(col(aStart), col(bStart)))
      .withColumn("overlap_end", least(col(aEnd), col(bEnd)))
  }
}
