package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier ("skyline") operator: the points not dominated by
  * any other point when maximizing two metrics at once — the classic
  * multi-criteria OLAP query (Börzsönyi, Kossmann & Stocker, "The
  * Skyline Operator", ICDE 2001). The reference's analytics surface
  * (`dags/spark/transform_raw_weather.py` min/max recaps) stops at
  * per-group extremes; the skyline is the cross-metric extension a
  * curation pipeline uses to pick, e.g., documents on the
  * quality-vs-length frontier instead of thresholding each axis
  * independently.
  *
  * Domination (maximize both): q dominates p iff q.x >= p.x and
  * q.y >= p.y with at least one strict. To minimize an axis, negate
  * the column at the call site.
  *
  * Scale shape — the textbook sort-scan made distributed without a
  * global single-task window:
  *  1. per-x max(y) hash aggregate (same-x dominated points die
  *     here; output is one row per distinct x);
  *  2. order-preserving range buckets on x from sampled cuts (the
  *     `Ids.globalRowNumber` construction: bucket = #cuts strictly
  *     below x, a pure function of the value, monotone in x — any
  *     point in a later bucket has STRICTLY greater x);
  *  3. per-bucket max(y) → an O(buckets)-row frame; the suffix max
  *     over later buckets is a window on THAT frame only (single
  *     partition of <= `buckets` rows — bounded by a parameter, not
  *     by data), broadcast-joined back;
  *  4. within each bucket, a running max(y) over larger-x rows — a
  *     window PARTITIONED by bucket, so every data-sized sort is
  *     per-bucket parallel.
  * A point survives iff its y strictly exceeds both the later-bucket
  * suffix max and the within-bucket running max. Comparisons only —
  * no arithmetic on the metric columns — so doubles and exact longs
  * are both bit-reproducible across engines and partitionings.
  */
object Skyline {

  /** Distinct frontier (x, y) pairs, maximizing both columns. NULL
    * in either metric never reaches the frontier (a point with an
    * unknown coordinate cannot be shown undominated; rows are
    * filtered, not errored, matching aggregate null-skipping).
    *
    * @param buckets parallelism of step 4 and the size bound of the
    *                step-3 frame; thousands at 100 TB.
    */
  def frontier2D(df: DataFrame, xCol: String, yCol: String,
                 buckets: Int = 64): DataFrame = {
    require(buckets > 0, "frontier2D: buckets must be positive")
    // narrow raw point frame, persisted: the quantile-cut sampling,
    // the per-bucket-max pass and the prune pass all consume it.
    // Explicitly spread to the session's shuffle parallelism (r15):
    // the bucket expression below costs ~|cuts| comparisons per ROW,
    // and left on the scan's partitioning that compute pins to however
    // few tasks the input happens to split into (3 on the gate's
    // single-row-group files) — the r14 amplification lesson.
    val pts = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol), col(yCol))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col(xCol))
      .persist()

    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts =
      if (probes.isEmpty) Seq.empty[Double]
      else pts.stat.approxQuantile(xCol, probes, 0.001).toSeq.distinct.sorted
    // bucket = #cuts strictly below x (cuts distinct + sorted), as a
    // BINARY-SEARCH CaseWhen tree: the previous aggregate() higher-
    // order function evaluated its lambda INTERPRETED per array
    // element (~|cuts| boxed evals per row — measured 8.5+ CPU-s per
    // pass over 600 k rows at 64 buckets); a CaseWhen tree evaluates
    // lazily, so each row costs ceil(log2 |cuts|) comparisons in
    // codegen'd branches (r15, guide §1.2 per-task work /
    // "expressions and codegen"). searchAbove(lo, hi) = count of ALL
    // cuts strictly below x given that cuts[0, lo) already are and
    // cuts[hi, n) already aren't — the standard upper-bound search.
    val xd = col(xCol).cast("double")
    def searchAbove(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(xd > cuts(mid), searchAbove(mid + 1, hi))
          .otherwise(searchAbove(lo, mid))
      }
    val bucket: Column =
      if (cuts.isEmpty) lit(0) else searchAbove(0, cuts.size)
    val withB = pts.withColumn("__xb", bucket)

    // suffix max over STRICTLY-later buckets, computed on the
    // <= buckets-row per-bucket-max frame (the one single-partition
    // window, bounded by the parameter), broadcast back.
    val wSuffix = Window.orderBy(col("__xb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val later = withB.groupBy(col("__xb"))
      .agg(max(col(yCol)).as("__bmax"))
      .withColumn("__later", max(col("__bmax")).over(wSuffix))
      .drop("__bmax")

    // grid pre-filter (r15, the skyline grid-prune): a RAW row whose y
    // is <= the max y of any strictly-later bucket is dominated by
    // that bucket's max point (strictly greater x, >= y) — drop it
    // BEFORE the data-sized per-x aggregate and the per-bucket window
    // sort, which then run over the tiny undominated residue instead
    // of every distinct x. Exact: a pruned row can never reach the
    // frontier, and a pruned larger-x row q in the SAME bucket cannot
    // dominate a surviving p (q.y <= later < p.y), so removing q from
    // the running max below never changes survivorship. The bucket-max
    // aggregate itself is a cheap map-side-combined pass (one long per
    // bucket per task).
    val pruned = withB.join(broadcast(later), Seq("__xb"))
      .where(col("__later").isNull || col(yCol) > col("__later"))

    // per-x max over the survivors (same-x dominated points die here;
    // the surviving max y per x is itself a surviving row's y, so the
    // __later condition stays satisfied), then the per-bucket running
    // max over larger-x rows (x is unique after the aggregate, so the
    // within-bucket order is total).
    val m = pruned.groupBy(col("__xb"), col(xCol))
      .agg(max(col(yCol)).as(yCol))
    val wRun = Window.partitionBy(col("__xb")).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    m.withColumn("__run", max(col(yCol)).over(wRun))
      .where(col("__run").isNull || col(yCol) > col("__run"))
      .select(col(xCol), col(yCol))
  }
}
