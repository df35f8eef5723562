package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over right-censored durations —
  * time-to-conversion, time-to-churn, time-to-first-failure: the
  * estimator that uses censored subjects correctly (they count as
  * at-risk until their censoring time) instead of dropping them
  * (biased down) or treating them as events (biased up).
  *
  * At each distinct duration t, with n_t subjects still at risk and
  * d_t events observed at t:  S(t) = Π_{s ≤ t} (1 − d_s/n_s).
  *
  * Exactness: the product becomes an order-free SUM in log space —
  * each step contributes round(10⁹·ln(1 − d_t/n_t)) (one mirrored
  * double expression over exact integer counts, the PSI/MI ladder) —
  * and the cumulative runs over the DISTINCT-DURATION histogram,
  * never the subjects (the `Drift.ksStatistic` contract: the one
  * single-partition window is histogram-sized; at 100 TB bucket
  * durations to bound it — hours, not micros). At-risk counts fold
  * from the same histogram by prefix subtraction: n_t = N − Σ_{s<t}
  * (d_s + c_s). Ties follow the standard convention: subjects
  * censored at t are still at risk for the events at t.
  *
  * Extinction (d_t = n_t) makes S = 0: that step and everything
  * after carry NULL log_s_nano (ln 0 is not a number to round) —
  * the curve ended, loudly visible rather than a giant negative.
  *
  * Output per distinct duration: t, n_risk, n_events, n_censored,
  * log_s_nano (cumulative; S(t) = exp(log_s_nano/10⁹)).
  */
object Survival {

  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val dur = when(col(durationCol).isNull || col(durationCol) < 0,
        raise_error(concat(lit(s"kaplanMeier: $durationCol must be >= 0, got "),
          col(durationCol).cast("string"))))
      .otherwise(col(durationCol)).cast("long")
    val ev = when(col(eventCol).isNull || (col(eventCol) =!= 0 && col(eventCol) =!= 1),
        raise_error(concat(lit(s"kaplanMeier: $eventCol must be 0/1 (1 = event, 0 = censored), got "),
          col(eventCol).cast("string"))))
      .otherwise(col(eventCol)).cast("long")
    val hist = df.select(dur.as("t"), ev.as("__e"))
      .groupBy(col("t"))
      .agg(sum(col("__e")).as("n_events"),
        sum(lit(1L) - col("__e")).as("n_censored"))
    // the one single-partition window — histogram-sized by contract
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val risk = hist
      .withColumn("__gone", coalesce(
        sum(col("n_events") + col("n_censored")).over(wPrev), lit(0L)))
      .withColumn("__n", sum(col("n_events") + col("n_censored"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("n_risk", col("__n") - col("__gone"))
    val step = risk.withColumn("__l",
      when(col("n_events") === 0, lit(0L))
        .when(col("n_events") === col("n_risk"), lit(null).cast("long"))
        .otherwise(round(lit(1e9) *
          log(lit(1.0) - col("n_events").cast("double") / col("n_risk").cast("double")))
          .cast("long")))
    // a NULL step poisons the cumulative sum from that t onward —
    // exactly the extinction semantics documented above
    step
      .withColumn("log_s_nano",
        when(max(col("__l").isNull.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)) === 1,
          lit(null).cast("long"))
        .otherwise(sum(col("__l")).over(w.rowsBetween(Window.unboundedPreceding, 0))))
      .select(col("t"), col("n_risk"), col("n_events"), col("n_censored"),
        col("log_s_nano"))
  }

  private val Window = org.apache.spark.sql.expressions.Window
}
