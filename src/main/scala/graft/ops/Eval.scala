package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-evaluation metrics computed EXACTLY and distributed — the
  * scoring loop a data pipeline runs over classifier outputs (the
  * `HashedFeatures` scorer, a quality model, a reranker) without
  * sampling to the driver or trusting float summation order.
  *
  * ROC-AUC via the Mann-Whitney U identity: AUC = P(score⁺ >
  * score⁻) + ½·P(=), computed from rank sums. Ties are handled
  * PROPERLY with midranks (not broken arbitrarily — arbitrary
  * tie-breaks bias AUC by up to the tie mass): working in
  * doubled-rank units keeps midranks integral, so everything up to
  * the final division is exact integer arithmetic — order-free,
  * partition-independent, engine-identical.
  *
  *   2·midrank(score s) = 2·(start rank of s) + count(s) − 1
  *   U2 = Σ over positives of 2·midrank
  *   AUC = (U2 − n⁺·(n⁺+1)) / (2·n⁺·n⁻)
  *
  * Scale shape: exact global ranks come from `Ids.globalRowNumber`
  * (range-bucketed two-pass — NO single-task window); the per-score
  * tie groups are one hash aggregate on the score; the three scalar
  * sums reduce in one row. Cost is two passes over (score, label)
  * pairs however large the eval set.
  */
object Eval {

  /** One row: n_pos, n_neg, auc_nano (AUC × 10⁹, the only IEEE
    * step). `labelCol` must be 0/1 (loud otherwise); NULL scores or
    * labels are rejected loudly — silently dropping them would
    * change the metric's denominator.
    *
    * Ascending score order: AUC > 0.5 means positives score HIGHER.
    */
  /** Calibration bins for Expected Calibration Error: confidences
    * as integer PERCENT (0-100, loud otherwise), `bins` equal-width
    * bins (bin = min(pct·bins div 100, bins−1) — integer division,
    * engine-identical). Per bin the ECE contribution reduces to the
    * exact rational |100·Σlabel − Σpct| / (100·N), so the only IEEE
    * step is one division per bin, nano-rounded — Σ ece_nano/10⁹
    * over the bins IS the ECE, order-free (the PSI/MI contract).
    *
    * Output per non-empty bin: bin, n, sum_label, sum_pct, ece_nano.
    * Scale: one data-sized hash aggregate on the bin key + a 1-row
    * broadcast total. */
  def calibrationBins(df: DataFrame, confPctCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibrationBins: bins must be >= 2, got $bins")
    val pct = when(col(confPctCol).isNull ||
        col(confPctCol) < 0 || col(confPctCol) > 100,
        raise_error(concat(lit(s"calibrationBins: $confPctCol must be 0..100, got "),
          col(confPctCol).cast("string"))))
      .otherwise(col(confPctCol)).cast("long")
    val y = when(col(labelCol).isNull || (col(labelCol) =!= 0 && col(labelCol) =!= 1),
        raise_error(concat(lit(s"calibrationBins: $labelCol must be 0/1, got "),
          col(labelCol).cast("string"))))
      .otherwise(col(labelCol)).cast("long")
    val binned = df.select(pct.as("__p"), y.as("__y"))
      .select(least(expr(s"(__p * $bins) div 100"), lit(bins - 1L)).as("bin"),
        col("__p"), col("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("sum_label"),
        sum(col("__p")).as("sum_pct"))
    val total = binned.agg(sum(col("n")).as("__nt"))
    binned.crossJoin(broadcast(total))
      .select(col("bin"), col("n"), col("sum_label"), col("sum_pct"),
        round(lit(1e9) *
          abs(lit(100L) * col("sum_label") - col("sum_pct")).cast("double") /
          (lit(100.0) * col("__nt").cast("double")))
          .cast("long").as("ece_nano"))
  }

  def aucFromScores(df: DataFrame, scoreCol: String, labelCol: String,
                    buckets: Int = 64): DataFrame = {
    val guarded = df.select(
      when(col(scoreCol).isNull, raise_error(lit(
          s"aucFromScores: NULL $scoreCol — a dropped row changes the denominator; filter explicitly")))
        .otherwise(col(scoreCol)).cast("long").as("__s"),
      when(col(labelCol).isNull || (col(labelCol) =!= 0 && col(labelCol) =!= 1),
          raise_error(concat(lit(s"aucFromScores: $labelCol must be 0/1, got "),
            col(labelCol).cast("string"))))
        .otherwise(col(labelCol)).cast("long").as("__y"))
    // exact global ranks under (score, tiebreak). The tiebreak is a
    // partition-dependent id — fine HERE because the metric consumes
    // only min(rank) and count per score group, both of which equal
    // "#rows with smaller score (+1)" / "tie mass" whatever order
    // ties landed in; individual ranks never leave this scope.
    val ranked = graft.ops.Ids.globalRowNumber(
      guarded.withColumn("__tb", monotonically_increasing_id()),
      "__s", Seq("__tb", "__y"), buckets, out = "__r")
    val groups = ranked.groupBy(col("__s"))
      .agg(min(col("__r")).as("__start"), count(lit(1)).as("__c"),
        sum(col("__y")).as("__pos"))
    val sums = groups.agg(
      sum(col("__pos")).as("n_pos"),
      sum(col("__c") - col("__pos")).as("n_neg"),
      // U2 = Σ_groups n_pos_in_group · (2·start + count − 1)
      sum(col("__pos") * (lit(2) * col("__start") + col("__c") - 1)).as("__u2"))
    sums.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("long"))
        .otherwise(round(lit(1e9) *
          (col("__u2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .cast("long"))
        .as("auc_nano"))
  }

  /** Cumulative-gains / lift table — "how much better than random is
    * the top decile" — the campaign-targeting reading of a score the
    * AUC summarizes in one number: rows rank by (score DESC, id ASC)
    * — the id tiebreak makes decile boundaries DETERMINISTIC, which
    * [[aucFromScores]] deliberately does not need (its tie groups
    * aggregate out) but a decile table does, so the caller provides a
    * unique id (duplicates raise). Ranks come from the bucketed
    * two-pass (no single-task global window); per-bin counts are
    * exact integers; the only windows after that run over the nBins
    * rows. lift = (cum_pos/cum_rows)/(pos/n), one mirrored tree;
    * NULL when the dataset has no positives. Output per bin:
    * (bin, n_rows, n_pos, cum_pos, lift_nano). */
  def liftCurve(df: DataFrame, idCol: String, scoreCol: String, labelCol: String,
                nBins: Int = 10, buckets: Int = 64): DataFrame = {
    require(nBins >= 2, s"liftCurve: nBins must be >= 2, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val g = df.select(
      when(col(idCol).isNull, raise_error(lit("liftCurve: NULL id")))
        .when(count(lit(1)).over(Window.partitionBy(col(idCol))) > 1,
          raise_error(concat(lit("liftCurve: duplicate id "), col(idCol).cast("string"),
            lit(" — decile boundaries need a deterministic total order"))))
        .otherwise(col(idCol)).cast("long").as("__id"),
      when(col(scoreCol).isNull, raise_error(lit(
          s"liftCurve: NULL $scoreCol — a dropped row changes every decile; filter explicitly")))
        .otherwise(col(scoreCol)).cast("long").as("__s"),
      when(col(labelCol).isNull || (col(labelCol) =!= 0 && col(labelCol) =!= 1),
          raise_error(concat(lit(s"liftCurve: $labelCol must be 0/1, got "),
            col(labelCol).cast("string"))))
        .otherwise(col(labelCol)).cast("long").as("__y"))
    val ranked = graft.ops.Ids.globalRowNumber(
      g.withColumn("__ns", -col("__s")), "__ns", Seq("__id"), buckets, out = "__r")
    val tot = ranked.agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
    val per = ranked.crossJoin(broadcast(tot))
      .withColumn("bin", expr(s"((__r - 1) * $nBins) div n"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__y")).as("n_pos"),
        max(col("n")).as("__n"), max(col("pos")).as("__p"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow) // ≤ nBins rows
    per.withColumn("cum_rows", sum(col("n_rows")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .select(col("bin"), col("n_rows"), col("n_pos"), col("cum_pos"),
        when(col("__p") === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e9) *
            (col("cum_pos").cast("double") / col("cum_rows").cast("double")) /
            (col("__p").cast("double") / col("__n").cast("double"))).cast("long"))
          .as("lift_nano"))
  }

  /** Brier score from INTEGER-percent confidences — the proper
    * scoring rule companion to [[calibrationBins]] (ECE says where
    * the model is miscalibrated; Brier scores calibration AND
    * discrimination in one number): mean((p − y)²) with p = pct/100.
    * Every per-row term (pct − 100·y)² is an exact integer, summed
    * order-free; brier_nano = round(1e9 · Σ/(n·10⁴)) — one mirrored
    * division. Guards (NULL, pct range, 0/1 label) raise inside the
    * consumed column. Output 1 row: (n, sum_sq_err, brier_nano). */
  def brierFromPercent(df: DataFrame, confPctCol: String, labelCol: String): DataFrame = {
    val term = when(col(confPctCol).isNull || col(confPctCol) < 0 || col(confPctCol) > 100,
        raise_error(concat(lit(s"brier: $confPctCol must be an integer percent in [0,100], got "),
          col(confPctCol).cast("string"))))
      .when(col(labelCol).isNull || (col(labelCol) =!= 0 && col(labelCol) =!= 1),
        raise_error(concat(lit(s"brier: $labelCol must be 0/1, got "),
          col(labelCol).cast("string"))))
      .otherwise((col(confPctCol).cast("long") - lit(100L) * col(labelCol).cast("long")) *
        (col(confPctCol).cast("long") - lit(100L) * col(labelCol).cast("long")))
    df.agg(count(lit(1)).as("n"), sum(term).as("sum_sq_err"))
      .select(col("n"), coalesce(col("sum_sq_err"), lit(0L)).as("sum_sq_err"),
        when(col("n") === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e9) * col("sum_sq_err").cast("double") /
            (col("n") * lit(10000L)).cast("double")).cast("long")).as("brier_nano"))
  }
}
