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
}
