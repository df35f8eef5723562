package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-way variance decomposition (ANOVA) in the exactness ladder —
  * the machinery behind two different questions:
  *
  *  - "is this metric SEASONAL?" — groups = day-of-week; the
  *    seasonal-strength reading is η² = SSB/SST (share of variance
  *    the weekly profile explains);
  *  - "do these segments DIFFER?" — groups = experiment arm /
  *    event type; the classical F = (SSB/(k−1)) / (SSW/(n−k)).
  *
  * Exactness: per-group within-variance terms clear the rational
  * group mean exactly — SSW_g = (n_g·Q_g − S_g²)/n_g with n_g, S_g,
  * Q_g exact integer aggregates — then each group's term is
  * MICRO-rounded BEFORE the cross-group sum (the PSI per-term
  * ladder: longs sum order-free where doubles would not). SST uses
  * the same identity on the global moments; SSB = SST − SSW on the
  * two micro longs. F and η² stay NANO-scaled ratios (they are
  * bounded, so nano precision is free) over already-exact longs.
  * Per-group moment overflow raises loudly inside the consumed
  * column (rescale units — cents → dollars — when it trips).
  *
  * Why micro, not nano, for the raw SS outputs (r14): SS grows
  * linearly with n·Var — measured 2.5e10 units² at the sf10 events
  * table, whose NANO scaling (2.5e19) already exceeds int64, and the
  * per-group nano terms overflowed their cross-group sum loudly
  * under ANSI. Micro keeps six fractional digits (every hand-spec
  * value stays exact) and buys three decades: SS fits int64 through
  * ~10³ × the sf10 volume at these magnitudes, and past THAT the
  * existing loud guards and ANSI casts refuse with a rescale
  * message instead of wrapping.
  *
  * Scale: one hash aggregate to the k-row group frame, one 1-row
  * total fold — the group count k is the only thing collected
  * implicitly, and it is grid-sized by construction.
  */
object Anova {

  /** Output 1 row: (n, k, sst_micro, ssw_micro, ssb_micro,
    * eta2_nano, f_nano). NULL values raise (a silently dropped
    * observation changes every moment); η²/F are NULL when undefined
    * (k < 2, zero SST, or — for F — zero SSW / n ≤ k). */
  def decompose(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val vGuard = when(col(valCol).isNull || col(groupCol).isNull,
        raise_error(lit(s"Anova: NULL $groupCol or $valCol — filter or impute upstream")))
      .otherwise(col(valCol)).cast("long")
    val obs = df.select(col(groupCol).as("__g"), vGuard.as("x"))
    val perGroup = obs.groupBy(col("__g"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"),
        sum(col("x") * col("x")).as("qg"))
      .select(col("ng"), col("sg"),
        // overflow guard rides the consumed qg column
        when(col("ng").cast("double") * col("qg").cast("double") >
            lit(Long.MaxValue.toDouble / 2.0),
          raise_error(lit("Anova: n_g·Σx² would overflow the exact group moments — " +
            "rescale the value units (e.g. cents → dollars)")))
        .otherwise(col("qg")).as("qg"))
    val groups = perGroup
      .select(col("ng"), col("sg"), col("qg"),
        round(lit(1e6) * (col("ng") * col("qg") - col("sg") * col("sg")).cast("double") /
          col("ng").cast("double")).cast("long").as("ssw_g_micro"))
      .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("sg")).as("s"), sum(col("qg")).as("q"),
        sum(col("ssw_g_micro")).as("ssw_micro"))
    // total-product guard: the per-group guard bounds ng·qg, but the
    // totals n = Σng, q = Σqg multiply to up to ~k² times that bound
    // and would wrap silently in non-ANSI Long arithmetic; s² ≤ n·q
    // (Cauchy–Schwarz on integer observations), so the one guard
    // covers both products in SST. Rides the consumed q column.
    val qTot = when(col("n").cast("double") * col("q").cast("double") >
        lit(Long.MaxValue.toDouble / 2.0),
      raise_error(lit("Anova: n·Σx² (global totals) would overflow the exact moments — " +
        "rescale the value units (e.g. cents → dollars)")))
      .otherwise(col("q"))
    groups.select(col("n"), col("k"),
        round(lit(1e6) * (col("n") * qTot - col("s") * col("s")).cast("double") /
          col("n").cast("double")).cast("long").as("sst_micro"),
        col("ssw_micro"))
      .select(col("n"), col("k"), col("sst_micro"), col("ssw_micro"),
        (col("sst_micro") - col("ssw_micro")).as("ssb_micro"))
      .select(col("n"), col("k"), col("sst_micro"), col("ssw_micro"), col("ssb_micro"),
        when(col("k") < 2 || col("sst_micro") === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e9) * col("ssb_micro").cast("double") /
            col("sst_micro").cast("double")).cast("long")).as("eta2_nano"),
        when(col("k") < 2 || col("n") <= col("k") || col("ssw_micro") === 0,
            lit(null).cast("long"))
          .otherwise(round(lit(1e9) *
            (col("ssb_micro").cast("double") / (col("k") - 1).cast("double")) /
            (col("ssw_micro").cast("double") / (col("n") - col("k")).cast("double")))
            .cast("long")).as("f_nano"))
  }
}
