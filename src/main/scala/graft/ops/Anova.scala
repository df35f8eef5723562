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
  * nano-rounded BEFORE the cross-group sum (the PSI per-term ladder:
  * longs sum order-free where doubles would not). SST uses the same
  * identity on the global moments; SSB = SST − SSW on the two nano
  * longs. F and η² are single mirrored IEEE trees over already-exact
  * longs. Per-group moment overflow raises loudly inside the
  * consumed column (rescale units — cents → dollars — when it
  * trips).
  *
  * Scale: one hash aggregate to the k-row group frame, one 1-row
  * total fold — the group count k is the only thing collected
  * implicitly, and it is grid-sized by construction.
  */
object Anova {

  /** Output 1 row: (n, k, sst_nano, ssw_nano, ssb_nano, eta2_nano,
    * f_nano). NULL values raise (a silently dropped observation
    * changes every moment); η²/F are NULL when undefined (k < 2,
    * zero SST, or — for F — zero SSW / n ≤ k). */
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
        round(lit(1e9) * (col("ng") * col("qg") - col("sg") * col("sg")).cast("double") /
          col("ng").cast("double")).cast("long").as("ssw_g_nano"))
      .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("sg")).as("s"), sum(col("qg")).as("q"),
        sum(col("ssw_g_nano")).as("ssw_nano"))
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
        round(lit(1e9) * (col("n") * qTot - col("s") * col("s")).cast("double") /
          col("n").cast("double")).cast("long").as("sst_nano"),
        col("ssw_nano"))
      .select(col("n"), col("k"), col("sst_nano"), col("ssw_nano"),
        (col("sst_nano") - col("ssw_nano")).as("ssb_nano"))
      .select(col("n"), col("k"), col("sst_nano"), col("ssw_nano"), col("ssb_nano"),
        when(col("k") < 2 || col("sst_nano") === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e9) * col("ssb_nano").cast("double") /
            col("sst_nano").cast("double")).cast("long")).as("eta2_nano"),
        when(col("k") < 2 || col("n") <= col("k") || col("ssw_nano") === 0,
            lit(null).cast("long"))
          .otherwise(round(lit(1e9) *
            (col("ssb_nano").cast("double") / (col("k") - 1).cast("double")) /
            (col("ssw_nano").cast("double") / (col("n") - col("k")).cast("double")))
            .cast("long")).as("f_nano"))
  }
}
