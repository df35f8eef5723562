package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming one-way ANOVA per event-time window — the watermark-
  * windowed twin of `ops.Anova.decompose` (round-8 verdict item #8:
  * the batch op claims streaming-legality, this is the cheap
  * contract that makes the claim concrete).
  *
  * Why this one is nearly free where ACF is not: the decomposition
  * is a pure function of per-group EXACT MOMENTS (n_g, S_g, Q_g),
  * and moments are commutative-monoid aggregates — they stream
  * under any arrival order within a window, no sequencing state at
  * all (contrast StreamCusum, whose statistic is order-sensitive and
  * needs a frontier). Two chained stateful aggregates, both closed
  * by the same watermark:
  *
  *   1. per (window, group): the exact integer moments — the only
  *      data-sized work;
  *   2. per window (chained time-window aggregation over
  *      `window_time`, the Spark 3.4+ multiple-stateful-operator
  *      surface): the k-row cross-group fold.
  *
  * The arithmetic mirrors `Anova.decompose` term for term (per-group
  * nano-rounding BEFORE the cross-group sum; both moment-overflow
  * guards riding consumed columns; η²/F NULL rules) — and
  * StreamAnovaSpec proves streamed ≡ batch per window, the
  * StreamCusum/StreamSessions contract. Late rows inside the
  * watermark join their window exactly (moments are order-free);
  * rows behind the watermark are dropped by the engine — the
  * documented append-mode contract, loud in the query progress
  * metrics, and the batch operator over the stored log is the exact
  * replay tool.
  */
object StreamAnova {

  /** Output (append mode, one row per closed window): (w_start,
    * w_end, n, k, sst_micro, ssw_micro, ssb_micro, eta2_nano, f_nano) —
    * the Anova.decompose row keyed by window. */
  def windowed(events: DataFrame, tsCol: String, groupCol: String, valCol: String,
               windowDur: String, watermark: String = "10 minutes"): DataFrame = {
    val vGuard = when(col(valCol).isNull || col(groupCol).isNull,
        raise_error(lit(s"StreamAnova: NULL $groupCol or $valCol — filter or impute upstream")))
      .otherwise(col(valCol)).cast("long")
    val perGroup = events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(groupCol).as("__g"))
      .agg(count(lit(1)).as("ng"), sum(vGuard).as("sg"),
        sum(vGuard * vGuard).as("qg"))
      .select(col("w"), col("ng"), col("sg"),
        when(col("ng").cast("double") * col("qg").cast("double") >
            lit(Long.MaxValue.toDouble / 2.0),
          raise_error(lit("StreamAnova: n_g·Σx² would overflow the exact group moments — " +
            "rescale the value units (e.g. cents → dollars)")))
        .otherwise(col("qg")).as("qg"))
      .select(col("w"), col("ng"), col("sg"), col("qg"),
        round(lit(1e6) * (col("ng") * col("qg") - col("sg") * col("sg")).cast("double") /
          col("ng").cast("double")).cast("long").as("ssw_g_micro"))
    val totals = perGroup
      .groupBy(window(window_time(col("w")), windowDur).as("w2"))
      .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("sg")).as("s"), sum(col("qg")).as("q"),
        sum(col("ssw_g_micro")).as("ssw_micro"))
    val qTot = when(col("n").cast("double") * col("q").cast("double") >
        lit(Long.MaxValue.toDouble / 2.0),
      raise_error(lit("StreamAnova: n·Σx² (window totals) would overflow the exact moments — " +
        "rescale the value units (e.g. cents → dollars)")))
      .otherwise(col("q"))
    totals.select(col("w2"), col("n"), col("k"),
        round(lit(1e6) * (col("n") * qTot - col("s") * col("s")).cast("double") /
          col("n").cast("double")).cast("long").as("sst_micro"),
        col("ssw_micro"))
      .select(col("w2"), col("n"), col("k"), col("sst_micro"), col("ssw_micro"),
        (col("sst_micro") - col("ssw_micro")).as("ssb_micro"))
      .select(col("w2.start").as("w_start"), col("w2.end").as("w_end"),
        col("n"), col("k"), col("sst_micro"), col("ssw_micro"), col("ssb_micro"),
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
