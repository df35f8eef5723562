package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global sequence numbers over an arbitrarily large
  * frame — `row_number() OVER (ORDER BY ...)` without the
  * single-partition window that makes the naive form a one-task
  * bottleneck (Spark literally warns "Moving all data to a single
  * partition").
  *
  * Mechanism (the classic two-pass used by `RDD.zipWithIndex`, done
  * at the DataFrame layer so the result stays a column):
  *
  *  1. Pick `buckets-1` cut values for `orderCol` once on the driver
  *     (`approxQuantile` — any cut set is CORRECT, better cuts are
  *     merely better balanced; the cuts are embedded as literals so
  *     every subsequent pass sees the identical bucketing).
  *  2. One narrow aggregation counts rows per bucket; the ~`buckets`
  *     counts come back to the driver and become exclusive prefix
  *     offsets (a literal map).
  *  3. `row_number` over a window PARTITIONED BY bucket (each bucket
  *     sorts independently, in parallel) plus the bucket's offset is
  *     the exact global row number.
  *
  * Because the caller must supply a TOTAL order (`orderCol` plus
  * `tieBreaks` that make it unique), the result is a pure function
  * of the data — independent of partitioning, task order, and of
  * which cuts `approxQuantile` happened to return. Skew in
  * `orderCol` degrades balance, not correctness: a value occupying
  * 30% of rows puts 30% of rows in one bucket's sort, which is still
  * a per-bucket external sort, never a global one.
  *
  * Scale: pass 2 is a map-side-combined count (bytes per bucket);
  * pass 3 shuffles each row once by bucket. The driver holds
  * O(buckets) longs. No step is proportional to total rows on any
  * single node. Reference analogue: the reference enumerates rows in
  * driver-side Python loops (`dags/spark/transform_raw_weather.py`),
  * which is exactly the shape this operator exists to avoid.
  *
  * `orderCol` must be numeric and non-null (cuts are doubles;
  * null ordering differs between engines — coalesce first if the
  * data can contain nulls).
  */
object Ids {

  /** Bucket index for a value given ascending cut literals: the
    * number of cuts strictly below the value — a pure, engine-free
    * function of the value, so every pass agrees. NULL in, NULL out:
    * a null order value gets a null bucket, which the count pass
    * turns into a descriptive contract error instead of silently
    * numbering the row under engine-specific null ordering. */
  private def bucketExpr(orderCol: Column, cuts: Seq[Double]): Column =
    when(orderCol.isNotNull,
      aggregate(
        array(cuts.map(lit): _*),
        lit(0),
        (acc, c) => acc + when(orderCol.cast("double") > c, 1).otherwise(0)))

  /** Append `out` = the 1-based global row number of each row under
    * ORDER BY (orderCol, tieBreaks...). The combined order must be
    * total (unique per row) for the result to be well-defined.
    *
    * @param buckets parallelism of the final per-bucket sorts; cap
    *                the per-bucket row count to what one task sorts
    *                comfortably (at 100 TB: thousands of buckets).
    */
  def globalRowNumber(df: DataFrame, orderCol: String, tieBreaks: Seq[String],
                      buckets: Int = 64, out: String = "row_id"): DataFrame =
    numberedWithTotal(df, orderCol, tieBreaks, buckets, out)._1

  /** As `globalRowNumber`, also returning the total row count (free —
    * pass 2 already computed it). For consumers that need N as a
    * literal (e.g. `Negatives` sampling modulo N). */
  def globalRowNumberWithTotal(df: DataFrame, orderCol: String, tieBreaks: Seq[String],
                               buckets: Int = 64, out: String = "row_id"): (DataFrame, Long) =
    numberedWithTotal(df, orderCol, tieBreaks, buckets, out)

  /** The two-pass core; also returns the total row count (already
    * paid for by pass 2) so `globalNtile` needs no third scan. */
  private def numberedWithTotal(df: DataFrame, orderCol: String,
                                tieBreaks: Seq[String], buckets: Int,
                                out: String): (DataFrame, Long) = {
    require(buckets > 0, "buckets must be positive")
    require(tieBreaks.nonEmpty,
      s"globalRowNumber needs tie-break columns making ($orderCol, ...) a total " +
        "order; without one the assignment is partition-order-dependent")
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts = df.stat.approxQuantile(orderCol, probes, 0.001).distinct.sorted.toSeq
    val b = bucketExpr(col(orderCol), cuts)
    val withB = df.withColumn("__gb", b)

    // Pass 2: per-bucket counts -> exclusive prefix offsets (driver
    // holds O(buckets) rows; the literal map keeps pass 3 consistent
    // with pass 2 whatever the cluster does in between).
    val counts = withB.groupBy(col("__gb")).count()
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"globalRowNumber: orderCol '$orderCol' contains NULL (${r.getLong(1)} " +
            "row(s)) — the order must be total over non-null values; coalesce first")
        (r.getInt(0), r.getLong(1))
      }.sortBy(_._1)
    val offsets = counts.map(_._1).zip(
      counts.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
    val offMap =
      if (offsets.isEmpty) map()
      else map(offsets.toSeq.sortBy(_._1).flatMap {
        case (k, v) => Seq(lit(k), lit(v))
      }: _*)

    val w = Window.partitionBy(col("__gb"))
      .orderBy((orderCol +: tieBreaks).map(col): _*)
    val numbered = withB
      .withColumn(out,
        coalesce(element_at(offMap, col("__gb")), lit(0L)) +
          row_number().over(w).cast("long"))
      .drop("__gb")
    (numbered, counts.map(_._2).sum)
  }

  /** Standard SQL `ntile(n)` derived from the global row number and
    * the (driver-known) total count: the first `N % n` tiles hold
    * `ceil(N/n)` rows, the rest `floor(N/n)` — bit-identical to
    * `ntile(n) OVER (ORDER BY ...)` in Spark and DuckDB, again with
    * no global window. Output columns: `rowOut` (BIGINT) and `out`
    * (INT). */
  def globalNtile(df: DataFrame, orderCol: String, tieBreaks: Seq[String],
                  n: Int, buckets: Int = 64,
                  rowOut: String = "row_id", out: String = "tile"): DataFrame = {
    require(n > 0, "ntile n must be positive")
    val (numbered, total) = numberedWithTotal(df, orderCol, tieBreaks, buckets, rowOut)
    val base = total / n
    val rem = total % n
    val rn = col(rowOut)
    val tile =
      if (base == 0L) rn // fewer rows than tiles: tile i = row i
      else when(rn <= lit(rem * (base + 1)),
             (rn - 1) / lit(base + 1) + 1)
           .otherwise(lit(rem) + (rn - 1 - lit(rem * (base + 1))) / lit(base) + 1)
    numbered.withColumn(out, tile.cast("int"))
  }
}
