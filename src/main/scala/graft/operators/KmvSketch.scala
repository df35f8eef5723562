package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values, "bottom-k") distinct sketch — the SET-
  * OPERATION member of the portable sketch family (`PortableHll` =
  * distinct counts, `QuantileSketch` = quantiles, `CountMin` =
  * frequencies).
  *
  * Why it exists when `PortableHll` already counts distincts: HLL
  * registers can union but cannot intersect — "how many users does
  * event A share with event B", "how much does the new crawl overlap
  * the existing corpus" need a sample of the distinct IDENTITIES, not
  * just their count. A KMV sketch keeps the k smallest distinct
  * `Hash60` values per group; because the hash is uniform, those k
  * values are a uniform sample of the distinct set, so
  *  - distinct count:   n̂ = (k−1)·2⁶⁰ / kth-min   (Bar-Yossef et al.
  *    2002; Beyer et al. SIGMOD 2007 unbiased estimator),
  *  - union:            bottom-k of the merged rows (lossless: a
  *    value in the union's bottom-k is in its source's bottom-k),
  *  - intersection / Jaccard: among the union's bottom-k (a uniform
  *    sample of A∪B), count members present in BOTH input sketches —
  *    J = matches/k, |A∩B| ≈ J·|A∪B| (the MinHash/KMV overlap
  *    estimator).
  * At 100 TB that answers cross-corpus overlap questions from
  * kilobytes of stored sketch rows instead of a distinct-join over
  * the lake.
  *
  * Portability contract (same as `PortableHll`): the stored artifact
  * is plain rows (group…, hv BIGINT) built from exact integer
  * arithmetic on the md5-prefix hash — DuckDB/Trino/anything
  * rebuilds the SAME rows from raw data (`row_number() over (order
  * by hash) <= k` on distinct hashes) and the SAME estimates, bit
  * for bit. Merge (bottom-k of union) is associative, commutative,
  * idempotent — re-delivered frames cannot corrupt a sketch, so
  * at-least-once sinks are safe, and `rollup(sketch(fine))` is
  * bit-identical to building at the coarse grain directly (the
  * merge-invariance oracle `q_kmv_distinct` proves it cross-engine;
  * `q_kmv_jaccard` replays `pairwiseOverlap`'s estimates in SQL).
  *
  * Scale shape: the build is one narrow hash projection into a
  * bounded custom `Aggregator` (SURVEY §7.3: built-ins have no
  * bounded top-k aggregate — `collect_list` is unbounded and a
  * window would shuffle every distinct hash). Its partial state is a
  * sorted primitive array of ≤ k longs, so the exchange carries at
  * most k longs per group per map partition — the sketch, not the
  * distinct set. Inserts hit the O(k) arraycopy path only while a
  * row beats the current k-th minimum: expected k·ln(n) total
  * qualifying inserts per group, so the steady-state per-row cost is
  * one binary search and no allocation. Pair operations run on G·k
  * stored rows — window sorts there are over bounded input.
  *
  * Error: rsd ≈ 1/√(k−2) (~6.3% at the default k=256) for counts;
  * Jaccard matches are Binomial(k, J) ⇒ se ≈ √(J(1−J)/k). Both
  * spec-bounded against exact answers (KmvSketchSpec).
  */
object KmvSketch {

  val DefaultK = 256

  /** Bottom-k distinct longs: buffer = sorted ascending distinct
    * array capped at k. Associative/commutative/idempotent merge ⇒
    * map-side partial aggregation and safe re-merge. */
  private[operators] class BottomKAgg(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray

    def reduce(b: Array[Long], a: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(b, a)
      if (idx >= 0) b // already present
      else {
        val ins = -idx - 1
        if (b.length >= k && ins >= k) b // not below the k-th min
        else {
          val outLen = math.min(b.length + 1, k)
          val out = new Array[Long](outLen)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = a
          System.arraycopy(b, ins, out, ins + 1, outLen - ins - 1)
          out
        }
      }
    }

    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      val out = new Array[Long](math.min(b1.length + b2.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < b1.length || j < b2.length)) {
        val take =
          if (i >= b1.length) { val v = b2(j); j += 1; v }
          else if (j >= b2.length) { val v = b1(i); i += 1; v }
          else if (b1(i) < b2(j)) { val v = b1(i); i += 1; v }
          else if (b1(i) > b2(j)) { val v = b2(j); j += 1; v }
          else { val v = b1(i); i += 1; j += 1; v } // dup across buffers
        out(o) = take; o += 1
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    def finish(b: Array[Long]): Array[Long] = b
    // catalyst array layout, not Kryo blobs — partials shuffle typed
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  private def bottomK(k: Int): Column => Column = {
    val fn = udaf(new BottomKAgg(k), Encoders.scalaLong)
    c => fn(c)
  }

  /** Build per-group sketch rows (groupCols…, hv) — the k smallest
    * distinct `Hash60` values of `valueCol`. NULLs are skipped (no
    * distinct identity). This is the stored artifact — write it at
    * the finest rollup grain. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             k: Int = DefaultK): DataFrame = {
    require(k >= 16, s"k < 16 has no useful accuracy, got $k")
    df.where(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+
        graft.plans.Hash60.hash60(col(valueCol).cast("string")).as("hv")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(k)(col("hv")).as("__hvs"))
      .select((groupCols.map(col) :+ explode(col("__hvs")).as("hv")): _*)
  }

  /** Merge stored sketch rows to a coarser grain — bottom-k of the
    * distinct union, touching only sketch rows. Bit-identical to
    * building at the coarse grain directly. */
  def rollup(sk: DataFrame, groupCols: Seq[String],
             k: Int = DefaultK): DataFrame =
    sk.groupBy(groupCols.map(col): _*)
      .agg(bottomK(k)(col("hv")).as("__hvs"))
      .select((groupCols.map(col) :+ explode(col("__hvs")).as("hv")): _*)

  /** Distinct-count estimate per group from sketch rows, as a whole
    * count (BIGINT). A group with fewer than k values is EXACT (the
    * sketch holds its whole distinct set). */
  def estimate(sk: DataFrame, groupCols: Seq[String], k: Int = DefaultK,
               out: String = "distinct_est"): DataFrame = {
    val est = when(col("__n") < k, col("__n").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow60) /
        greatest(col("__kth"), lit(1L)).cast("double"))
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), max(col("hv")).as("__kth"))
      .select((groupCols.map(col) :+ round(est).cast("long").as(out)): _*)
  }

  private val TwoPow60 = 1152921504606846976.0

  /** All-pairs overlap between the groups of one sketch frame keyed
    * by `groupCol`: for each pair g1 < g2 —
    *   jaccard    J = matches / |bottom-k(union)|,
    *   union_est  from the union's bottom-k (KMV estimator),
    *   inter_est  round(J · union_est).
    * Runs entirely in sketch space (G²·k rows); meant for grids of
    * corpus versions / sources / event types, like
    * `HeavyHitters.exactAtLeast`'s broadcast grid — not for
    * millions of groups. */
  def pairwiseOverlap(sk: DataFrame, groupCol: String,
                      k: Int = DefaultK): DataFrame = {
    val groups = sk.select(col(groupCol)).distinct()
    val pairs = groups.as("ga").join(groups.as("gb"),
        col(s"ga.$groupCol") < col(s"gb.$groupCol"))
      .select(col(s"ga.$groupCol").as("g1"), col(s"gb.$groupCol").as("g2"))
    // membership-flagged union rows per pair (two equi-joins, not an
    // OR-join — keeps both sides broadcastable hash joins)
    val a = pairs.join(sk.withColumnRenamed(groupCol, "g1"), "g1")
      .select(col("g1"), col("g2"), col("hv"), lit(1).as("in_a"), lit(0).as("in_b"))
    val b = pairs.join(sk.withColumnRenamed(groupCol, "g2"), "g2")
      .select(col("g1"), col("g2"), col("hv"), lit(0).as("in_a"), lit(1).as("in_b"))
    val merged = a.unionByName(b)
      .groupBy(col("g1"), col("g2"), col("hv"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    // bottom-k of each pair's union — bounded input (≤ 2k per pair)
    val w = Window.partitionBy(col("g1"), col("g2")).orderBy(col("hv"))
    val uk = merged.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
    val unionEst = when(col("n_union") < k, col("n_union").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow60) /
        greatest(col("__kth"), lit(1L)).cast("double"))
    uk.groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("n_union"), max(col("hv")).as("__kth"),
        sum(col("in_a") * col("in_b")).cast("long").as("matches"))
      .withColumn("jaccard",
        col("matches").cast("double") / col("n_union").cast("double"))
      .withColumn("union_est", round(unionEst).cast("long"))
      .withColumn("inter_est",
        round(col("jaccard") * col("union_est").cast("double")).cast("long"))
      .select("g1", "g2", "matches", "jaccard", "union_est", "inter_est")
  }
}
