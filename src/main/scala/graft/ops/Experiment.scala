package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experimentation analytics: the 2×2 contingency reading of an A/B
  * test — conversion counts per variant, lift, and Pearson's
  * chi-square via the closed 2×2 form
  *
  *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
  *
  * (a,b = control non-conv/conv; c,d = treatment non-conv/conv).
  * Counts are exact integers from one aggregate; the χ² products
  * move to doubles (ad·bc-style products overflow longs near 10⁹
  * users) in ONE mirrored expression, nano-rounded. Degenerate
  * margins (an empty variant or an all-converted/none-converted
  * table) yield NULL rather than a 0/0.
  *
  * Scale: one data-sized conditional aggregate onto a single row —
  * the same cost as counting. Significance thresholds (3.84 at
  * p=0.05, df=1) belong to the consumer.
  */
object Experiment {

  /** CUPED variance reduction (Deng et al. 2013): adjust the
    * post-period metric by the pre-period covariate,
    * θ = cov(pre, post)/var(pre) pooled, adjusted lift =
    * (μpost_t − μpost_c) − θ·(μpre_t − μpre_c) — everything folds
    * from EXACT integer sums (Σx, Σy, Σxy, Σxx per variant), so no
    * per-row adjusted values ever materialize; the θ and lift trees
    * are each one mirrored double expression, nano-rounded. Integer
    * product sums bound ≈ 2⁶² for cent-scale metrics over ~10⁶
    * users; past that move the moment sums to DECIMAL(38,0) (the
    * assortativity note). Zero pre-period variance → NULLs (nothing
    * to adjust with).
    *
    * Output one row: n_control, n_treatment, lift_nano (raw),
    * theta_nano, cuped_lift_nano. */
  def cuped(df: DataFrame, variantCol: String, preCol: String,
            postCol: String): DataFrame = {
    val v = when(col(variantCol).isNull || (col(variantCol) =!= 0 && col(variantCol) =!= 1),
        raise_error(concat(lit(s"cuped: $variantCol must be 0/1, got "),
          col(variantCol).cast("string"))))
      .otherwise(col(variantCol)).cast("long")
    val s = df.select(v.as("__v"), col(preCol).cast("long").as("__x"),
        col(postCol).cast("long").as("__y"))
      .agg(
        count(lit(1)).as("n"), sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"), sum(col("__x") * col("__x")).as("sxx"),
        sum(when(col("__v") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("__v") === 0, col("__x")).otherwise(0L)).as("sxc"),
        sum(when(col("__v") === 0, col("__y")).otherwise(0L)).as("syc"),
        sum(when(col("__v") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("__v") === 1, col("__x")).otherwise(0L)).as("sxt"),
        sum(when(col("__v") === 1, col("__y")).otherwise(0L)).as("syt"))
    def d(c: String) = col(c).cast("double")
    val varPre = d("n") * d("sxx") - d("sx") * d("sx")
    val covXY = d("n") * d("sxy") - d("sx") * d("sy")
    val theta = covXY / varPre
    val rawLift = d("syt") / d("nt") - d("syc") / d("nc")
    val preLift = d("sxt") / d("nt") - d("sxc") / d("nc")
    s.select(col("nc").as("n_control"), col("nt").as("n_treatment"),
      when(col("nc") === 0 || col("nt") === 0, lit(null).cast("long"))
        .otherwise(round(lit(1e9) * rawLift).cast("long")).as("lift_nano"),
      when(varPre === 0.0 || col("nc") === 0 || col("nt") === 0,
          lit(null).cast("long"))
        .otherwise(round(lit(1e9) * theta).cast("long")).as("theta_nano"),
      when(varPre === 0.0 || col("nc") === 0 || col("nt") === 0,
          lit(null).cast("long"))
        .otherwise(round(lit(1e9) * (rawLift - theta * preLift)).cast("long"))
        .as("cuped_lift_nano"))
  }

  /** One row: n_control, n_treatment, conv_control, conv_treatment,
    * lift_nano ((rate_t − rate_c) × 10⁹), chi2_nano. `variantCol`
    * and `convCol` must be 0/1 (loud otherwise; NULL rejected — a
    * dropped user changes every denominator). */
  def abTest(df: DataFrame, variantCol: String, convCol: String): DataFrame = {
    def bit(c: String): org.apache.spark.sql.Column =
      when(col(c).isNull || (col(c) =!= 0 && col(c) =!= 1),
        raise_error(concat(lit(s"abTest: $c must be 0/1, got "),
          col(c).cast("string"))))
        .otherwise(col(c)).cast("long")
    val counts = df.select(bit(variantCol).as("__v"), bit(convCol).as("__y"))
      .agg(
        sum(when(col("__v") === 0 && col("__y") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("__v") === 0 && col("__y") === 1, 1L).otherwise(0L)).as("b"),
        sum(when(col("__v") === 1 && col("__y") === 0, 1L).otherwise(0L)).as("c"),
        sum(when(col("__v") === 1 && col("__y") === 1, 1L).otherwise(0L)).as("d"))
    val (a, b, c, d) = (col("a").cast("double"), col("b").cast("double"),
      col("c").cast("double"), col("d").cast("double"))
    val n = a + b + c + d
    val margins = (a + b) * (c + d) * (a + c) * (b + d)
    counts.select(
      (col("a") + col("b")).as("n_control"),
      (col("c") + col("d")).as("n_treatment"),
      col("b").as("conv_control"),
      col("d").as("conv_treatment"),
      when(col("a") + col("b") === 0 || col("c") + col("d") === 0,
          lit(null).cast("long"))
        .otherwise(round(lit(1e9) * (d / (c + d) - b / (a + b))).cast("long"))
        .as("lift_nano"),
      when(margins === 0.0, lit(null).cast("long"))
        .otherwise(round(lit(1e9) * n * (a * d - b * c) * (a * d - b * c) / margins)
          .cast("long"))
        .as("chi2_nano"))
  }

  /** DETERMINISTIC bootstrap confidence interval for the mean — the
    * nonparametric CI for metrics whose distribution a normal
    * approximation would misstate (heavy-tailed revenue is the
    * canonical case). The resampling is hash-driven, not random:
    * draw slot i of replicate b selects the row with index
    * 1 + hash60(b ":" i) mod n — Efron's bootstrap with a fixed,
    * engine-reproducible design matrix, so the SAME intervals come
    * out of any engine and any partitioning (the gate requirement;
    * a seeded RNG would be Spark-private).
    *
    * Exactness: each replicate mean is one IEEE division of an exact
    * integer sum by n; interval endpoints are ORDER-STATISTIC
    * selections over the B replicate means (rank ⌈B·α/2⌉ from each
    * end — selection, not interpolation, so no further arithmetic).
    *
    * Scale: B·n draw rows of three longs, two hash-partitioned
    * shuffles (the draw join and the per-replicate aggregate) — at
    * 100 TB the input is a pre-aggregated per-unit metric frame
    * (users, sessions), not raw events; `maxN` fails loud beyond.
    *
    * `idCol` must be a unique total order (duplicates raise — the
    * index assignment would be ambiguous). Output 1 row:
    * (n, b, mean_nano, lo_nano, hi_nano). */
  def bootstrapMeanCi(df: DataFrame, idCol: String, valCol: String,
                      b: Int, alphaPct: Int, maxN: Long = 1000000L): DataFrame = {
    require(b >= 10, s"bootstrapMeanCi: B must be >= 10, got $b")
    require(alphaPct >= 1 && alphaPct <= 50, s"alphaPct in [1,50], got $alphaPct")
    import org.apache.spark.sql.expressions.Window
    val vGuard = when(col(valCol).isNull || col(idCol).isNull,
        raise_error(lit("bootstrapMeanCi: NULL id or value — filter upstream")))
      .when(count(lit(1)).over(Window.partitionBy(col(idCol))) > 1,
        raise_error(concat(lit("bootstrapMeanCi: duplicate id "),
          col(idCol).cast("string"), lit(" — the draw index must be unambiguous"))))
      .otherwise(col(valCol)).cast("long")
    val s = df.select(col(idCol).as("__id"), vGuard.as("x"))
      .withColumn("rn", row_number().over(Window.orderBy(col("__id"))).cast("long"))
    val total = s.agg(count(lit(1)).as("__n"), sum(col("x")).as("__sum"))
      .select(
        when(col("__n") > maxN, raise_error(concat(
          lit("bootstrapMeanCi: "), col("__n").cast("string"),
          lit(s" rows > maxN=$maxN — bootstrap a pre-aggregated metric frame"))))
        .when(col("__n") === 0, raise_error(
          lit("bootstrapMeanCi: empty input — a CI over nothing is undefined")))
        .otherwise(col("__n")).as("n"), col("__sum").as("sx"))
    // each row is a DRAW SLOT for every replicate: explode b copies,
    // hash-select the sampled index, one equi-join back to the values.
    // The explicit repartition is load-bearing (r14 optimization,
    // guide §2.5): `s` leaves the global rank window as ONE partition
    // (and AQE's coalescing would keep any tiny exchange at 1-3
    // partitions — it sizes by INPUT bytes, blind to the B× explode
    // and the per-draw md5 below), so the whole B·n draw stage ran
    // single-task (measured 3.2 s of a 4.2 s query at sf0.1).
    // Repartitioning the n pre-explode rows by rn spreads the B·n
    // hash+join work across the session's shuffle parallelism; every
    // downstream aggregate is an order-free integer/IEEE reduction,
    // so results are bit-identical. Explicit numPartitions (the
    // session's configured shuffle parallelism — scale-adaptive, not
    // a local constant) opts this one exchange out of AQE coalescing.
    val drawParallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    val slots = s.repartition(drawParallelism, col("rn")).crossJoin(broadcast(total))
      .withColumn("b", explode(sequence(lit(0), lit(b - 1))))
      .select(col("b"), (lit(1L) + pmod(graft.plans.Hash60.hash60(
        concat(col("b").cast("string"), lit(":"), col("rn").cast("string"))),
        col("n"))).as("sel"))
    val means = slots.join(s.select(col("rn").as("sel"), col("x")), Seq("sel"))
      .groupBy(col("b"))
      .agg((sum(col("x")).cast("double") / count(lit(1)).cast("double")).as("m"))
    val loRank = (b * alphaPct + 199) / 200   // ⌈B·α/2⌉ in integer math
    val ranked = means
      .withColumn("r", row_number().over(Window.orderBy(col("m"), col("b"))).cast("long"))
    ranked.where(col("r") === loRank || col("r") === (b + 1 - loRank))
      .agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .crossJoin(broadcast(total))
      .select(col("n"), lit(b.toLong).as("b"),
        round(lit(1e9) * col("sx").cast("double") / col("n").cast("double"))
          .cast("long").as("mean_nano"),
        round(lit(1e9) * col("lo")).cast("long").as("lo_nano"),
        round(lit(1e9) * col("hi")).cast("long").as("hi_nano"))
  }

  // 2^60 and 2^59: the Irwin-Hall uniform scale below. Each uniform
  // is centered PER TERM (u − 2^59) before summing: the raw sum of
  // 12 draws reaches 12·2^60 ≈ 1.4e19 and overflows a long, while
  // the centered sum is bounded by ±6·2^60 ≈ ±6.9e18 and fits.
  private val Two60 = 1152921504606846976L
  private val Two59 = 576460752303423488L

  /** Bag-of-Little-Bootstraps CI for the mean (Kleiner, Talwalkar,
    * Sarkar, Jordan, "A Scalable Bootstrap for Massive Data", 2012) —
    * the PRODUCTION twin of [[bootstrapMeanCi]]: Efron resampling is
    * B·n work by construction (exp ≈ 1.0, the r11 verdict's #2
    * slowest sf1 row); BLB draws `s` subsets of size ≈ n^0.6 and
    * gives each replicate MULTINOMIAL-approximate weights summing to
    * ≈ n, so the resampling work is s·B·n^0.6 while the statistical
    * target (the sampling distribution of the mean of n draws) is
    * unchanged. Each subset yields a percentile CI from its B
    * replicate means; the final interval AVERAGES the per-subset
    * endpoints — BLB's outer average.
    *
    * Determinism (the gate requirement — identical intervals in any
    * engine, any partitioning):
    *  - subset membership: hash60("blb" j ":" id) mod n < m_t with
    *    m_t = max(50, round(n^0.6)) — O(1) per (row, subset), no
    *    global rank, subsets ≈ Binomial(n, m_t/n)-sized;
    *  - weights: w = max(0, ⌊λ + √λ·z + ½⌋) with λ = n/m_j (the
    *    actual subset size) — a normal approximation to the
    *    Poisson(λ) bootstrap weight (Chamandy et al., "Estimating
    *    Uncertainty for Massive Data Streams", 2012; skew λ^-½ ≈ 4%
    *    at the sizes this runs at), where z is an Irwin-Hall normal:
    *    the sum of 12 hash60 draws minus 6·2^60 — an EXACT integer —
    *    over 2^60. Every floating step after the integer ζ is a
    *    correctly-rounded IEEE op (cast, /2^60 exact, sqrt, mul,
    *    add, floor), so both engines produce bit-identical weights;
    *  - replicate mean: Σwx / Σw (self-normalizing — absorbs the
    *    O(√n) total-mass wobble of independent weights), both sums
    *    exact integers, one IEEE division;
    *  - final endpoints: each subset contributes its replicate
    *    quantiles as DEVIATIONS from the subset's own plug-in mean
    *    (Σx_j/m_j), and the interval re-anchors at the FULL-data
    *    mean: lo = θ̂_n + avg_j(q_lo_j − θ̂_j). Averaging raw
    *    endpoints would center the interval on the subsets' means,
    *    whose wobble is σ/√(s·m) — far WIDER than the σ/√n interval
    *    once s·m ≪ n (caught by the sf0.001 sanity check: the naive
    *    average put the sample mean at the upper endpoint).
    *    Deviations are nano-rounded per subset then averaged in
    *    integer arithmetic (odd `s` keeps the half-way case
    *    unreachable) — no cross-subset double summation anywhere.
    *
    * Scale: one n-sized membership scan (codegen, no shuffle beyond
    * the dup-guard window), then everything downstream is
    * s·m ≈ s·n^0.6 rows — no maxN guard needed, which is the point.
    * Output 1 row: (n, s, b, mean_nano, lo_nano, hi_nano). */
  def blbMeanCi(df: DataFrame, idCol: String, valCol: String,
                s: Int, b: Int, alphaPct: Int): DataFrame = {
    require(s >= 3 && s <= 49 && s % 2 == 1,
      s"blbMeanCi: s must be odd in [3,49] (odd keeps the endpoint average's " +
        s"round() off the .5 boundary), got $s")
    require(b >= 10, s"blbMeanCi: B must be >= 10, got $b")
    require(alphaPct >= 1 && alphaPct <= 50, s"alphaPct in [1,50], got $alphaPct")
    import org.apache.spark.sql.expressions.Window
    val vGuard = when(col(valCol).isNull || col(idCol).isNull,
        raise_error(lit("blbMeanCi: NULL id or value — filter upstream")))
      .when(count(lit(1)).over(Window.partitionBy(col(idCol))) > 1,
        raise_error(concat(lit("blbMeanCi: duplicate id "),
          col(idCol).cast("string"), lit(" — subset membership must be unambiguous"))))
      .otherwise(col(valCol)).cast("long")
    val base = df.select(col(idCol).cast("string").as("__id"), vGuard.as("x"))
    val total = base.agg(count(lit(1)).as("__n"), sum(col("x")).as("__sx"))
      .select(
        when(col("__n") === 0, raise_error(
          lit("blbMeanCi: empty input — a CI over nothing is undefined")))
        .otherwise(col("__n")).as("n"), col("__sx").as("sx"))
    val mT = greatest(lit(50L),
      round(pow(col("n").cast("double"), lit(0.6))).cast("long"))
    val subs = base.crossJoin(broadcast(total))
      .withColumn("j", explode(sequence(lit(0), lit(s - 1))))
      .where(pmod(graft.plans.Hash60.hash60(concat(lit("blb"),
        col("j").cast("string"), lit(":"), col("__id"))), col("n")) < mT)
      .select(col("j"), col("__id"), col("x"), col("n"))
      // load-bearing repartition (r14 optimization, the bootstrapMeanCi
      // precedent above): subs is s·m ≈ s·n^0.6 rows, small enough that
      // AQE coalesces it to 1-2 partitions — but each row explodes B
      // replicates × 12 md5 draws below (measured: a 1.5 s single-task
      // stage at sf0.1). Spread the pre-explode rows across the
      // session's shuffle parallelism; weights and sums are exact
      // integers, so results are bit-identical under any partitioning.
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("j"), col("__id"))
    val sizes = subs.groupBy(col("j"))
      .agg(count(lit(1)).as("mj"), sum(col("x")).as("sxj"))
    // 12 independent 60-bit uniforms, each centered by 2^59 and
    // summed EXACTLY — the centered Irwin-Hall variate in [−6·2^60,
    // 6·2^60), which fits a long (the raw sum would not)
    def u(t: Int) = graft.plans.Hash60.hash60(concat(lit("blbw"),
      col("j").cast("string"), lit(":"), col("b").cast("string"), lit(":"),
      col("__id"), lit(":"), lit(t.toString))) - lit(Two59)
    val zeta = (1 to 12).map(u).reduce(_ + _)
    val lam = col("n").cast("double") / col("mj").cast("double")
    val z = zeta.cast("double") / lit(Two60).cast("double")
    val w = greatest(lit(0.0), floor(lam + sqrt(lam) * z + lit(0.5))).cast("long")
    val reps = subs.join(broadcast(sizes), Seq("j"))
      .withColumn("b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("w", w)
      .groupBy(col("j"), col("b"))
      .agg(sum(col("w") * col("x")).as("swx"), sum(col("w")).as("sw"))
      .select(col("j"), col("b"),
        when(col("sw") === 0, raise_error(lit(
          "blbMeanCi: a replicate drew all-zero weights — subset too small for λ")))
          .otherwise(col("swx").cast("double") / col("sw").cast("double")).as("m"))
    val loRank = (b * alphaPct + 199) / 200
    // per-subset CENTERED deviations: replicate quantile minus the
    // subset's own plug-in mean — location-free, so the outer average
    // carries only the interval SHAPE, and the full-data mean anchors it
    val thetaJ = col("sxj").cast("double") / col("mj").cast("double")
    val perSubset = reps
      .withColumn("r", row_number().over(
        Window.partitionBy(col("j")).orderBy(col("m"), col("b"))).cast("long"))
      .where(col("r") === loRank || col("r") === (b + 1 - loRank))
      .groupBy(col("j"))
      .agg(min(col("m")).as("qlo"), max(col("m")).as("qhi"))
      .join(broadcast(sizes), Seq("j"))
      .select(col("j"),
        round(lit(1e9) * (col("qlo") - thetaJ)).cast("long").as("lo_nano_j"),
        round(lit(1e9) * (col("qhi") - thetaJ)).cast("long").as("hi_nano_j"))
    val meanNano = round(lit(1e9) * col("sx").cast("double") / col("n").cast("double"))
      .cast("long")
    perSubset
      .agg(count(lit(1)).as("nsub"),
        sum(col("lo_nano_j")).as("slo"), sum(col("hi_nano_j")).as("shi"))
      .crossJoin(broadcast(total))
      .select(
        // an empty subset would silently shrink the outer average —
        // every j must have produced a CI
        when(col("nsub") =!= s, raise_error(concat(lit("blbMeanCi: only "),
          col("nsub").cast("string"), lit(s" of $s subsets produced a CI"))))
          .otherwise(col("n")).as("n"),
        lit(s.toLong).as("s"), lit(b.toLong).as("b"),
        meanNano.as("mean_nano"),
        (meanNano + round(col("slo").cast("double") / lit(s.toDouble)).cast("long"))
          .as("lo_nano"),
        (meanNano + round(col("shi").cast("double") / lit(s.toDouble)).cast("long"))
          .as("hi_nano"))
  }
}
