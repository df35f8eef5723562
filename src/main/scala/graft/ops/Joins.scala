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
    * the picked payload depends on partition merge order.
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
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c")) ++
        payload.map(p => col(s"__asof.$p")): _*)
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
    */
  def rangeJoinByBucket(points: DataFrame, intervals: DataFrame,
                        pointCol: String, startCol: String, endCol: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(startCol) / bucketWidth),
          floor((col(endCol) - 1) / bucketWidth))))
    val pt = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    pt.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
