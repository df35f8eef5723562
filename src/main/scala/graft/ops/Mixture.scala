package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted corpus mixing: draw from each source at target
  * proportions, deterministically — the "data mixture" step of a
  * training pipeline (e.g. 60% web, 30% code, 10% reference, from
  * sources of wildly different sizes).
  *
  * The mixture is sized by its BINDING source: the largest total
  * consistent with the weights takes scale = min_i(n_i / w_i) rows,
  * keeping kept_i = scale · w_i from source i — every source is
  * drawn at its target share and at least one is used whole. Rows
  * are chosen by the same md5 hash-threshold trick as `Sampling`
  * (keep iff bucket(key) < kept_i / n_i of the bucket space):
  * membership is a pure function of (key, source sizes, weights), so
  * re-runs and two engines agree exactly, with realized shares
  * accurate to the bucket granularity (2^-20).
  *
  * Plan shape: one count aggregate per source (map-side partials,
  * group-key = the source column), a broadcast of the per-source
  * cutoffs (one row per source), and a narrow hash filter — no
  * repartition of the corpus, filters stay pushdown-friendly.
  */
object Mixture {

  /** 2^20 buckets: share resolution ~1e-6, and cutoff arithmetic
    * stays exactly representable (n_i ≤ 2^43 keeps n·2^20 in range). */
  private val Buckets = 1L << 20

  /** Keep a `weights`-proportioned mixture of the rows, by source.
    * Sources absent from `weights` are dropped (weight 0); weights
    * must be positive and are normalized internally. Returns the
    * input columns (the mixture is a filter, not a projection). */
  def byWeights(df: DataFrame, key: String, sourceCol: String,
                weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0), "weights must be positive")
    Sampling.requirePortableKey(df, key)
    // sum in sorted-key order: double addition is order-sensitive in
    // the last ulp, and Map iteration order must not leak into the
    // normalized shares (membership is supposed to be a pure function
    // of the WEIGHTS, not of how the caller built the Map)
    val total = weights.toSeq.sortBy(_._1).map(_._2).sum
    // per-source target share of the final mixture
    val share = weights.view.mapValues(_ / total).toMap

    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .where(col(sourceCol).isin(share.keys.toSeq: _*))
    // scale = min_i(n_i / share_i); kept_i = scale * share_i;
    // cutoff_i = floor(Buckets * kept_i / n_i). All of it in one
    // source-count frame: a window min over at most |sources| rows.
    val shareCol = share.foldLeft(lit(null).cast("double")) {
      case (acc, (s, w)) => when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cutoffs = counts
      .withColumn("__ratio", col("__n").cast("double") / shareCol)
      .withColumn("__scale", min(col("__ratio")).over(wAll))
      // the BINDING source (scale == its own n/share — min copies the
      // exact double, so the equality is reliable) is whole by
      // definition: pin its cutoff to the full bucket space rather
      // than trusting floor(B·scale·share/n) to round-trip to exactly
      // B through three double ops (it lands on B-1 for ~5% of
      // weight/count combinations, shaving the top bucket off a
      // source the contract promises to keep whole)
      .withColumn("__cutoff",
        when(col("__scale") === col("__ratio"), lit(Buckets))
          .otherwise(floor(lit(Buckets.toDouble) * col("__scale") * shareCol / col("__n").cast("double"))))
      .select(col(sourceCol), col("__cutoff"))

    df.join(broadcast(cutoffs), Seq(sourceCol))
      .where(Sampling.hashBucket(col(key), Buckets.toInt) < col("__cutoff"))
      .drop("__cutoff")
      .select(df.columns.map(col): _*)
  }

  /** Temperature-flattened mixture at α = 1/2 (the mC4/XLM-R style
    * "sample language ℓ with p ∝ n_ℓ^α" rebalancing): the smallest
    * group is kept whole and every larger group is downsampled at
    * rate sqrt(n_min/n_g), so realized sizes are ∝ sqrt(n_g) — big
    * groups flattened toward the small ones, never upsampled.
    *
    * α is fixed at 1/2 deliberately: the per-group keep rate is then
    * one division, one `sqrt`, one multiply by 2^20 and a floor —
    * every step correctly rounded (or exact) under IEEE-754, so the
    * cutoff is BIT-IDENTICAL in any engine and membership stays a
    * pure function of (key, group sizes), re-run- and cross-engine-
    * reproducible like `byWeights`. A general `pow(x, α)` has no such
    * guarantee (libm-dependent last-ulp), which would silently break
    * the oracle contract at cutoff boundaries.
    *
    * Same plan shape as `byWeights`: one tiny count aggregate, a
    * broadcast cutoff row per group, one narrow hash filter.
    * Rows with a NULL group are dropped (like `byWeights` drops
    * unweighted sources): a null group has no size to flatten
    * against — coalesce to a sentinel group first to keep them.
    */
  def byTemperatureSqrt(df: DataFrame, key: String, groupCol: String): DataFrame = {
    Sampling.requirePortableKey(df, key)
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cutoffs = counts
      .withColumn("__nmin", min(col("__n")).over(wAll))
      .withColumn("__cutoff",
        when(col("__n") === col("__nmin"), lit(Buckets))
          .otherwise(floor(lit(Buckets.toDouble) *
            sqrt(col("__nmin").cast("double") / col("__n").cast("double")))))
      .select(col(groupCol), col("__cutoff"))
    df.join(broadcast(cutoffs), Seq(groupCol))
      .where(Sampling.hashBucket(col(key), Buckets.toInt) < col("__cutoff"))
      .drop("__cutoff")
      .select(df.columns.map(col): _*)
  }

  /** Water-filling budget allocation — the "domain cap" step of
    * corpus curation: given per-group sizes and a total budget B,
    * find the level τ such that Σ_g min(n_g, τ) = B; groups below
    * the level are kept WHOLE, groups above are capped AT it. The
    * max-min-fair allocation (every capped group gets the same
    * amount, no group gets more than it has), and the exact form of
    * "cap heavy domains, keep the tail" from C4/Gopher-style
    * pipelines — where a fixed per-domain cap either misses the
    * budget or needs hand-tuning, water-filling derives the cap FROM
    * the budget.
    *
    * Everything is exact integers. An exact integer level rarely
    * exists, so the discrete form: the largest τ with S(τ) =
    * Σ min(n_g, τ) ≤ B, then the remainder r = B − S(τ) < #capped
    * goes as +1 to the first r capped groups in group order — fully
    * deterministic, Σ alloc = B exactly (when B ≤ Σ n_g; a budget
    * the corpus cannot fill returns every group whole). τ is found
    * segment-wise on the size-sorted group frame with prefix sums:
    * row i's segment [n_{i−1}, n_i) has S(τ) = prefix_i + m_i·τ
    * linear, so its candidate is one floor division, and exactly one
    * candidate lands in its own segment. The windows run over the
    * per-GROUP frame — bounded by group cardinality, the
    * ksStatistic/compaction-plan argument — and the chosen level
    * rides a 1-row broadcast back over it.
    *
    * Output: (groupCol, nCol, alloc). NULL groups, NULL or negative
    * sizes fail loud (a silently dropped group would inflate every
    * other group's share). */
  def waterFill(counts: DataFrame, groupCol: String, nCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val g0 = counts.select(col(groupCol).as("__grp"), col(nCol).cast("long").as("__n"))
    val bad = g0.where(col("__grp").isNull || col("__n").isNull || col("__n") < 0)
      .limit(1).collect()
    require(bad.isEmpty,
      s"waterFill: NULL group / NULL or negative size (${bad.headOption.orNull}) - " +
        "a silently dropped group would inflate every other group's allocation")
    require(g0.limit(1).collect().nonEmpty, "waterFill: no groups to allocate over")

    val w = Window.orderBy(col("__n"), col("__grp"))
    val pre = g0
      .withColumn("__i", row_number().over(w))
      .withColumn("__cum",
        sum(col("__n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = pre.agg(count(lit(1)).as("__g"), sum(col("__n")).as("__tot"))
    // the level row: its floor-division candidate lands in its own
    // segment [prev, n). No row matches iff budget >= total corpus.
    val level = pre.crossJoin(broadcast(tot))
      .withColumn("__prev", coalesce(lag(col("__n"), 1).over(w), lit(0L)))
      .withColumn("__m", col("__g") - col("__i") + 1)
      .withColumn("__tau", expr(s"($budget - (__cum - __n)) div __m"))
      .where(col("__tau") >= col("__prev") && col("__tau") < col("__n"))
      .select(col("__tau"),
        (lit(budget) - (col("__cum") - col("__n")) - col("__m") * col("__tau")).as("__r"))
    // capped groups in group order get the +1 remainder units
    g0.join(broadcast(level), lit(true), "left")
      .withColumn("__caprank",
        when(col("__tau").isNotNull && col("__n") > col("__tau"),
          row_number().over(Window.partitionBy(col("__n") > col("__tau")).orderBy(col("__grp")))))
      .select(col("__grp").as(groupCol), col("__n").as(nCol),
        when(col("__tau").isNull || col("__n") <= col("__tau"), col("__n"))
          .otherwise(col("__tau") +
            when(col("__caprank") <= col("__r"), lit(1L)).otherwise(lit(0L)))
          .as("alloc"))
  }
}
