package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving averages over per-key event
  * sequences — the smoothing the reference's hourly recap
  * (`dags/spark/transform_raw_weather.py` mean-per-bucket) cannot
  * express: a recency-weighted level that updates per event.
  *
  * Exactness policy: the recurrence is computed in INTEGER units
  * with a power-of-two smoothing denominator,
  *
  *   s_1 = v_1;  s_i = (num*v_i + (den-num)*s_{i-1}) >> log2(den)
  *
  * (alpha = num/den, den = 2^k). Arithmetic shift on non-negative
  * longs is floor division by 2^k, which is DuckDB's `//` on the
  * same operands — so the whole trace, truncation included, replays
  * bit-identically in the cross-engine oracle as a recursive CTE.
  * Values must be non-negative (enforced loudly): for negatives,
  * truncate-toward-zero and floor diverge and the trace would become
  * engine-dependent.
  *
  * Scale shape: one hash aggregate by key building the per-key
  * sorted event array, then a linear fold — the same
  * sorted-`collect_list` contract as the exact-quantiles operator,
  * with the same loud cap: per-key sequences are bounded by
  * `maxSeqLen` and a longer key fails with a descriptive error
  * instead of a silent executor OOM. A recurrence is inherently
  * sequential per key; keys are independent, so the plan
  * parallelizes across keys, which is the dimension that grows at
  * 100 TB (more users), while per-key history is product-bounded.
  * If per-key history itself becomes unbounded, the float-domain
  * EWMA composes affinely (a chunk maps s to a*s+b) and admits a
  * two-level chunked scan — that upgrade path trades the bit-exact
  * integer contract for unbounded keys; this operator deliberately
  * keeps the exact contract.
  */
object Smoothing {

  /** Per-event EWMA trace. Output: keyCol, rn (1-based BIGINT rank
    * of the event within its key under (tsCol, tieCol) order), v
    * (the long input value), ewma (the smoothed level after this
    * event). (tsCol, tieCol) must totally order each key's events.
    *
    * @param num     alpha numerator, 1 <= num <= 2^log2Den
    * @param log2Den alpha denominator exponent (den = 2^log2Den)
    */
  def ewmaTrace(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                valCol: String, num: Int, log2Den: Int,
                maxSeqLen: Int = 1 << 20): DataFrame = {
    require(log2Den >= 1 && log2Den <= 30,
      s"ewmaTrace: log2Den must be in [1,30], got $log2Den")
    val den = 1L << log2Den
    require(num >= 1 && num <= den,
      s"ewmaTrace: num must be in [1, $den], got $num")
    require(maxSeqLen > 0, "ewmaTrace: maxSeqLen must be positive")

    // overflow bound: num·v + (den−num)·s keeps every term under
    // 2^63 when v, s <= Long.MaxValue/den (s never exceeds max v —
    // the EWMA is a convex combination)
    val vMax = Long.MaxValue / den
    // NULL raises loudly (the holtTrace contract): left to fall
    // through the when-chain it would silently NULL this event's ewma
    // AND poison the whole trace tail through the recurrence
    val vGuard = when(col(valCol).isNull, raise_error(concat(
        lit(s"ewmaTrace: NULL $valCol for key "),
        col(keyCol).cast("string"),
        lit(" — the recurrence would NULL the trace tail; filter or impute first"))))
      .when(col(valCol) < 0, raise_error(concat(
        lit(s"ewmaTrace: negative $valCol for key "),
        col(keyCol).cast("string"),
        lit(" — floor vs truncate division diverges; shift values non-negative first"))))
      .when(col(valCol) > vMax, raise_error(concat(
        lit(s"ewmaTrace: $valCol exceeds Long.MaxValue/den = $vMax for key "),
        col(keyCol).cast("string"),
        lit(" — the num*v term would overflow; rescale the input units"))))
      .otherwise(col(valCol)).cast("long")
    val e = struct(col(tsCol).as("ts"), col(tieCol).as("tie"), vGuard.as("v"))

    val grouped = df
      .select(col(keyCol), e.as("seq"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("seq"))).as("seq"))
      .withColumn("seq",
        when(size(col("seq")) > maxSeqLen, raise_error(concat(
          lit(s"ewmaTrace: key "), col(keyCol).cast("string"),
          lit(s" has "), size(col("seq")).cast("string"),
          lit(s" events > maxSeqLen=$maxSeqLen — raise the cap or pre-bucket the history"))))
        .otherwise(col("seq")))

    val fold: Column = aggregate(
      col("seq"),
      typedLit(Seq.empty[Long]),
      (acc, el) => concat(acc, array(
        when(size(acc) === 0, el.getField("v"))
          .otherwise(shiftright(
            lit(num.toLong) * el.getField("v") +
              lit(den - num) * element_at(acc, -1),
            log2Den)))))

    grouped
      .withColumn("__s", fold)
      .select(col(keyCol), posexplode(arrays_zip(col("seq"), col("__s"))))
      .select(col(keyCol),
        (col("pos") + 1).cast("long").as("rn"),
        col("col.seq.v").as("v"),
        col("col.__s").as("ewma"))
  }

  /** Holt double-exponential smoothing (level + trend), α = β = ½,
    * in exact integers:
    *
    *   l_1 = v_1, b_1 = 0
    *   l_i = (v_i + l_{i−1} + b_{i−1}) >> 1
    *   b_i = (l_i − l_{i−1} + b_{i−1}) >> 1
    *
    * — the trend-aware big sibling of [[ewmaTrace]]: a plain EWMA
    * lags a ramping series forever; Holt's trend term closes the
    * gap, and `l + b` is the classic one-step-ahead forecast.
    *
    * Negative values and trends are FINE here (unlike ewmaTrace's
    * general-alpha contract): the recurrence semantic is FLOOR
    * halving (arithmetic shift) for both signs. Engines disagree on
    * negative integer division — DuckDB's `//` truncates toward
    * zero — so the oracle spells the floor explicitly
    * ((x−1)//2 when x < 0); the q_holt gate pins that both
    * renderings are the same function. Same sorted-fold + loud cap
    * contract as the siblings.
    *
    * Output: keyCol, rn, v, level, trend.
    */
  def holtTrace(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                valCol: String, maxSeqLen: Int = 1 << 20): DataFrame = {
    require(maxSeqLen > 0, "holtTrace: maxSeqLen must be positive")
    val e = struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
      when(col(valCol).isNull, raise_error(concat(
          lit(s"holtTrace: NULL $valCol for key "), col(keyCol).cast("string"),
          lit(" — a skipped step would silently shift the whole trace"))))
        .otherwise(col(valCol)).cast("long").as("v"))
    val grouped = df
      .select(col(keyCol), e.as("seq"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("seq"))).as("seq"))
      .withColumn("seq",
        when(size(col("seq")) > maxSeqLen, raise_error(concat(
          lit(s"holtTrace: key "), col(keyCol).cast("string"),
          lit(s" has "), size(col("seq")).cast("string"),
          lit(s" events > maxSeqLen=$maxSeqLen — raise the cap or pre-bucket the history"))))
        .otherwise(col("seq")))
    val fold: Column = aggregate(
      col("seq"),
      typedLit(Seq.empty[(Long, Long)]).cast("array<struct<l:bigint,b:bigint>>"),
      (acc, el) => {
        val prev = element_at(acc, -1)
        val l = when(size(acc) === 0, el.getField("v"))
          .otherwise(shiftright(
            el.getField("v") + prev.getField("l") + prev.getField("b"), 1))
        val b = when(size(acc) === 0, lit(0L))
          .otherwise(shiftright(
            l - prev.getField("l") + prev.getField("b"), 1))
        concat(acc, array(struct(l.as("l"), b.as("b"))))
      })
    grouped
      .withColumn("__s", fold)
      .select(col(keyCol), posexplode(arrays_zip(col("seq"), col("__s"))))
      .select(col(keyCol),
        (col("pos") + 1).cast("long").as("rn"),
        col("col.seq.v").as("v"),
        col("col.__s.l").as("level"),
        col("col.__s.b").as("trend"))
  }

  /** One-sided upper CUSUM change-point trace (Page 1954): per key in
    * event order,
    *
    *   s_0 = 0;  s_i = max(0, s_{i-1} + (v_i − target))
    *
    * with `alarm` set where s_i > threshold — the classic sequential
    * detector for a sustained upward shift of the level (monitoring
    * error rates, latencies, queue depths). Pure integer adds and a
    * max: EXACT for any long values including negatives (unlike the
    * EWMA there is no division), bit-identical across engines — the
    * oracle replays it as a recursive CTE with greatest(0, …).
    *
    * Same per-key sorted-fold contract and loud `maxSeqLen` cap as
    * [[ewmaTrace]]. Alarms do NOT reset the statistic: s keeps
    * accumulating while the shift persists, the standard form; reset
    * policy (if wanted) belongs to the consumer reading the trace.
    *
    * Output: keyCol, rn, v, cusum, alarm BOOLEAN.
    */
  def cusumTrace(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                 valCol: String, target: Long, threshold: Long,
                 maxSeqLen: Int = 1 << 20): DataFrame = {
    require(threshold >= 0, s"cusumTrace: threshold must be >= 0, got $threshold")
    require(maxSeqLen > 0, "cusumTrace: maxSeqLen must be positive")
    val e = struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
      col(valCol).cast("long").as("v"))
    val grouped = df
      .select(col(keyCol), e.as("seq"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("seq"))).as("seq"))
      .withColumn("seq",
        when(size(col("seq")) > maxSeqLen, raise_error(concat(
          lit(s"cusumTrace: key "), col(keyCol).cast("string"),
          lit(s" has "), size(col("seq")).cast("string"),
          lit(s" events > maxSeqLen=$maxSeqLen — raise the cap or pre-bucket the history"))))
        .otherwise(col("seq")))
    val fold: Column = aggregate(
      col("seq"),
      typedLit(Seq.empty[Long]),
      (acc, el) => concat(acc, array(
        greatest(lit(0L),
          when(size(acc) === 0, lit(0L)).otherwise(element_at(acc, -1)) +
            el.getField("v") - lit(target)))))
    grouped
      .withColumn("__s", fold)
      .select(col(keyCol), posexplode(arrays_zip(col("seq"), col("__s"))))
      .select(col(keyCol),
        (col("pos") + 1).cast("long").as("rn"),
        col("col.seq.v").as("v"),
        col("col.__s").as("cusum"),
        (col("col.__s") > threshold).as("alarm"))
  }
}
