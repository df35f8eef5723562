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
    // hash-select the sampled index, one equi-join back to the values
    val slots = s.crossJoin(broadcast(total))
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
}
