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
  * two-level chunked scan — that upgrade path is [[ewmaTraceChunked]]
  * (r10: the skew suite measured this operator 4.7× slower on a
  * 20%-hot key; the chunked twin measured flat). This operator
  * deliberately keeps the bit-exact integer contract; CUSUM's
  * chunked twin [[cusumTraceChunked]] keeps BOTH, because (max,+)
  * composes exactly.
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

  /** Float-domain Holt (level + trend, α = β = ½) as a two-level
    * affine chunked scan — the skew-proof production form of
    * [[holtTrace]], whose 9.2× hot-key degradation was the WORST the
    * round-10 skew suite measured. The float Holt state (l, b) is
    * affine in the incoming state:
    *
    *   l_j = (0.5·v_j + 0.5·l_{j−1}) + 0.5·b_{j−1}
    *   b_j = 0.5·(l_j − l_{j−1}) + 0.5·b_{j−1}
    *
    * so each event updates a 2×2+2 coefficient system
    * (l_j = (P·l_in + Q·b_in) + R; b_j = (S·l_in + T·b_in) + U) with
    * IDENTITY init — one uniform recurrence, no first-element special
    * case — and a chunk composes through its last coefficients. Same
    * determinism contract as [[ewmaTraceChunked]]: every double is a
    * fixed IEEE round-to-nearest sequence (parenthesization pinned
    * above), the registered oracle replays the identical dataflow in
    * DuckDB, and the gate hash-matches raw doubles with no epsilon.
    * The key's first bucket carries the sibling's l_1 = v_1, b_1 = 0
    * init through a direct (lp, bp) trace.
    *
    * Output: keyCol, rn, v (long), level (double), trend (double).
    */
  def holtTraceChunked(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valCol: String,
                       bucketSeconds: Long = 86400L,
                       maxBuckets: Int = 1 << 16): DataFrame = {
    require(bucketSeconds > 0,
      s"holtTraceChunked: bucketSeconds must be positive, got $bucketSeconds")
    require(maxBuckets > 0, "holtTraceChunked: maxBuckets must be positive")
    val bucketMicros = bucketSeconds * 1000000L
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val tsGuard = when(col(tsCol).isNull, raise_error(concat(
        lit(s"holtTraceChunked: NULL $tsCol for key "),
        col(keyCol).cast("string"),
        lit(" — bucket assignment needs the event time"))))
      .when(micros < 0, raise_error(concat(
        lit(s"holtTraceChunked: pre-epoch $tsCol for key "),
        col(keyCol).cast("string"),
        lit(" — truncating vs flooring integer division diverge below zero"))))
      .otherwise(col(tsCol))
    val tieGuard = when(col(tieCol).isNull, raise_error(concat(
        lit(s"holtTraceChunked: NULL $tieCol for key "),
        col(keyCol).cast("string"),
        lit(" — the within-bucket order needs the tie-breaker"))))
      .otherwise(col(tieCol))
    val vGuard = when(col(valCol).isNull, raise_error(concat(
        lit(s"holtTraceChunked: NULL $valCol for key "),
        col(keyCol).cast("string"),
        lit(" — a skipped step would silently shift the whole trace"))))
      .otherwise(col(valCol)).cast("long")

    val half = lit(0.5)
    // coefficient fold: per element, (p,q,r,s,t,u) affine coeffs from
    // identity + (lp,bp) the first-bucket direct trace
    val perBucket = df
      .select(col(keyCol),
        floor(micros / lit(bucketMicros.toDouble)).as("__b"),
        struct(tsGuard.as("ts"), tieGuard.as("tie"), vGuard.as("v")).as("e"))
      .groupBy(col(keyCol), col("__b"))
      .agg(sort_array(collect_list(col("e"))).as("seq"))
      .withColumn("__cf", aggregate(
        col("seq"),
        typedLit(Seq.empty[(Double, Double, Double, Double, Double, Double, Double, Double)])
          .cast("array<struct<p:double,q:double,r:double,s:double,t:double,u:double,lp:double,bp:double>>"),
        (acc, el) => {
          val first = size(acc) === 0
          val pv = element_at(acc, -1)
          val v = el.getField("v").cast("double")
          // previous coefficients (identity at bucket start)
          val p0 = when(first, lit(1.0)).otherwise(pv.getField("p"))
          val q0 = when(first, lit(0.0)).otherwise(pv.getField("q"))
          val r0 = when(first, lit(0.0)).otherwise(pv.getField("r"))
          val s0 = when(first, lit(0.0)).otherwise(pv.getField("s"))
          val t0 = when(first, lit(1.0)).otherwise(pv.getField("t"))
          val u0 = when(first, lit(0.0)).otherwise(pv.getField("u"))
          val p1 = half * p0 + half * s0
          val q1 = half * q0 + half * t0
          val r1 = (half * v + half * r0) + half * u0
          val s1 = half * (p1 - p0) + half * s0
          val t1 = half * (q1 - q0) + half * t0
          val u1 = half * (r1 - r0) + half * u0
          // first-bucket direct trace: l_1 = v, b_1 = 0
          val lp0 = pv.getField("lp")
          val bp0 = pv.getField("bp")
          val lp1 = when(first, v).otherwise((half * v + half * lp0) + half * bp0)
          val bp1 = when(first, lit(0.0))
            .otherwise(half * (lp1 - lp0) + half * bp0)
          concat(acc, array(struct(
            p1.as("p"), q1.as("q"), r1.as("r"), s1.as("s"), t1.as("t"),
            u1.as("u"), lp1.as("lp"), bp1.as("bp"))))
        }))

    val folded = perBucket
      .select(col(keyCol), col("__b"),
        element_at(col("__cf"), -1).as("cf"),
        size(col("__cf")).cast("long").as("cnt"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col("__b").as("b"), col("cf.p").as("p"), col("cf.q").as("q"),
        col("cf.r").as("r"), col("cf.s").as("s"), col("cf.t").as("t"),
        col("cf.u").as("u"), col("cf.lp").as("lp"), col("cf.bp").as("bp"),
        col("cnt").as("c")))).as("bs"))
      .withColumn("bs",
        when(size(col("bs")) > maxBuckets, raise_error(concat(
          lit(s"holtTraceChunked: key "), col(keyCol).cast("string"),
          lit(" spans "), size(col("bs")).cast("string"),
          lit(s" buckets > maxBuckets=$maxBuckets — widen bucketSeconds or raise the cap"))))
        .otherwise(col("bs")))
      .withColumn("carry", aggregate(
        col("bs"),
        typedLit(Seq.empty[(Long, Double, Double, Double, Double, Long)])
          .cast("array<struct<b:bigint,lin:double,bin:double,lout:double,bout:double,off:bigint>>"),
        (acc, el) => {
          val prev = element_at(acc, -1)
          val first = size(acc) === 0
          val lin = when(first, lit(null).cast("double"))
            .otherwise(prev.getField("lout"))
          val bin = when(first, lit(null).cast("double"))
            .otherwise(prev.getField("bout"))
          val lout = when(first, el.getField("lp"))
            .otherwise((el.getField("p") * lin + el.getField("q") * bin) +
              el.getField("r"))
          val bout = when(first, el.getField("bp"))
            .otherwise((el.getField("s") * lin + el.getField("t") * bin) +
              el.getField("u"))
          val off = when(first, lit(0L))
            .otherwise(prev.getField("off") +
              element_at(col("bs"), size(acc)).getField("c"))
          concat(acc, array(struct(
            el.getField("b").as("b"), lin.as("lin"), bin.as("bin"),
            lout.as("lout"), bout.as("bout"), off.as("off"))))
        }))
      .select(col(keyCol), explode(col("carry")).as("ci"))
      .select(col(keyCol), col("ci.b").as("__b"),
        col("ci.lin").as("__lin"), col("ci.bin").as("__bin"),
        col("ci.off").as("__off"))

    perBucket.join(folded, Seq(keyCol, "__b"))
      .select(col(keyCol), col("__off"),
        posexplode(arrays_zip(col("seq"), col("__cf"))),
        col("__lin"), col("__bin"))
      .select(col(keyCol),
        (col("__off") + col("pos") + 1).as("rn"),
        col("col.seq.v").as("v"),
        when(col("__lin").isNull, col("col.__cf.lp"))
          .otherwise((col("col.__cf.p") * col("__lin") +
            col("col.__cf.q") * col("__bin")) + col("col.__cf.r"))
          .as("level"),
        when(col("__lin").isNull, col("col.__cf.bp"))
          .otherwise((col("col.__cf.s") * col("__lin") +
            col("col.__cf.t") * col("__bin")) + col("col.__cf.u"))
          .as("trend"))
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
  /** [[cusumTrace]] computed as a two-level chunked scan — the
    * skew-proof production form. The round-10 skew suite measured the
    * sequential per-key fold as the ONE operator class a hot key
    * genuinely breaks (q_cusum 0.91 → 4.75 s with 20% of events on
    * one user: a recurrence cannot be salted or AQE-split), and this
    * is the upgrade path the sibling's scaladoc promised — except it
    * KEEPS the bit-exact integer contract, because the CUSUM
    * recurrence composes exactly in (max,+) algebra:
    *
    *   unrolling s_j = max(0, s_{j-1} + d_j) with d = v − target and
    *   prefix sums P_j = Σ_{i≤j} d_i gives
    *
    *     s_j = max(s_in + P_j,  P_j − min_{1≤i≤j} P_i)
    *
    *   so a chunk of events reduces to the pair
    *   (S = total delta, T = S − min prefix), and chunk composition
    *   is s_out = max(s_in + S, T) — pure integer adds and maxes,
    *   bit-identical to replaying every event.
    *
    * Chunks are TIME buckets (`bucketSeconds`-wide, monotone in
    * `tsCol`), not rank ranges — rank chunking would itself need the
    * per-key global sort this operator exists to avoid. The plan:
    *
    *   1. within each (key, bucket): `row_number` + running
    *      sum/min window over (tsCol, tieCol) — hash-distributed by
    *      (key, bucket), so a hot key's buckets land on DIFFERENT
    *      tasks;
    *   2. per-bucket summaries (S, minP, count) fold per key in
    *      bucket order into (carry-in state, rank offset) — the ONLY
    *      sequential-per-key work, O(#buckets) independent of event
    *      volume (a 10⁹-event user over a year of daily buckets folds
    *      365 structs);
    *   3. one equi-join of the bucket carries back onto the windowed
    *      rows finishes the trace.
    *
    * Output is IDENTICAL to [[cusumTrace]] — (key, rn, v, cusum,
    * alarm) — and the registered q_cusum_chunked gate pins that with
    * the SAME recursive-CTE oracle at two SFs. The residual density
    * assumption is per-(key, bucket), not per-key: pick
    * `bucketSeconds` so one bucket of one key fits a task (the
    * `maxBuckets` cap bounds the fold; a hotter-than-bucket burst is
    * a window sort, which spills rather than OOMs). Unclamped prefix
    * sums bound |P| ≤ n·(|v|+|target|) per (key, bucket) — unlike the
    * clamped s they can overflow for astronomically long hot buckets;
    * at cent units that is > 10¹² events per bucket before 2⁶³.
    *
    * NULL `tsCol`/`tieCol` raise loudly: bucket assignment and the
    * within-bucket order both need them, and a silently null bucket
    * would split a key's trace into two independent recurrences.
    */
  def cusumTraceChunked(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, valCol: String,
                        target: Long, threshold: Long,
                        bucketSeconds: Long = 86400L,
                        maxBuckets: Int = 1 << 16): DataFrame = {
    require(threshold >= 0, s"cusumTraceChunked: threshold must be >= 0, got $threshold")
    require(bucketSeconds > 0, s"cusumTraceChunked: bucketSeconds must be positive, got $bucketSeconds")
    require(maxBuckets > 0, "cusumTraceChunked: maxBuckets must be positive")
    import org.apache.spark.sql.expressions.Window

    val tsGuard = when(col(tsCol).isNull, raise_error(concat(
        lit(s"cusumTraceChunked: NULL $tsCol for key "),
        col(keyCol).cast("string"),
        lit(" — bucket assignment needs the event time; filter or impute first"))))
      .otherwise(col(tsCol))
    val tieGuard = when(col(tieCol).isNull, raise_error(concat(
        lit(s"cusumTraceChunked: NULL $tieCol for key "),
        col(keyCol).cast("string"),
        lit(" — the within-bucket order needs the tie-breaker"))))
      .otherwise(col(tieCol))
    // NULL value raises loudly (the sibling ewma/holt chunked
    // contract): left to fall through, a NULL __d is skipped by the
    // windowed sum and every later row's cusum silently shifts
    val vGuard = when(col(valCol).isNull, raise_error(concat(
        lit(s"cusumTraceChunked: NULL $valCol for key "),
        col(keyCol).cast("string"),
        lit(" — a skipped delta would silently shift the whole trace; filter or impute first"))))
      .otherwise(col(valCol)).cast("long")

    val base = df.select(
      col(keyCol),
      tsGuard.as("__ts"),
      tieGuard.as("__tie"),
      vGuard.as("v"),
      (vGuard - lit(target)).as("__d"),
      floor(col(tsCol).cast("timestamp").cast("double") / lit(bucketSeconds.toDouble))
        .as("__b"))

    val w = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("__ts"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = base
      .withColumn("__rnw", row_number().over(
        Window.partitionBy(col(keyCol), col("__b"))
          .orderBy(col("__ts"), col("__tie"))).cast("long"))
      .withColumn("__p", sum(col("__d")).over(w))
      .withColumn("__mp", min(col("__p")).over(w))

    // per-bucket summaries: S = total delta (= last __p), minP = min
    // prefix, cnt — metadata-sized (one row per live (key, bucket))
    val sums = within.groupBy(col(keyCol), col("__b")).agg(
      sum(col("__d")).as("S"),
      min(col("__p")).as("minP"),
      count(lit(1)).as("cnt"))

    // the ONLY per-key sequential step: fold bucket summaries in
    // bucket order, carrying (state in, state out, rank offset)
    val folded = sums
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col("__b").as("b"), col("S").as("s"),
        col("minP").as("mp"), col("cnt").as("c")))).as("bs"))
      .withColumn("bs",
        when(size(col("bs")) > maxBuckets, raise_error(concat(
          lit(s"cusumTraceChunked: key "), col(keyCol).cast("string"),
          lit(" spans "), size(col("bs")).cast("string"),
          lit(s" buckets > maxBuckets=$maxBuckets — widen bucketSeconds or raise the cap"))))
        .otherwise(col("bs")))
      .withColumn("carry", aggregate(
        col("bs"),
        typedLit(Seq.empty[(Long, Long, Long, Long)])
          .cast("array<struct<b:bigint,sin:bigint,sout:bigint,off:bigint>>"),
        (acc, el) => {
          val prev = element_at(acc, -1)
          val sin = when(size(acc) === 0, lit(0L)).otherwise(prev.getField("sout"))
          val off = when(size(acc) === 0, lit(0L))
            .otherwise(prev.getField("off") +
              element_at(col("bs"), size(acc)).getField("c"))
          val sout = greatest(sin + el.getField("s"),
            el.getField("s") - el.getField("mp"))
          concat(acc, array(struct(
            el.getField("b").as("b"), sin.as("sin"),
            sout.as("sout"), off.as("off"))))
        }))
      .select(col(keyCol), explode(col("carry")).as("ci"))
      .select(col(keyCol), col("ci.b").as("__b"),
        col("ci.sin").as("__sin"), col("ci.off").as("__off"))

    within.join(folded, Seq(keyCol, "__b"))
      .select(col(keyCol),
        (col("__off") + col("__rnw")).as("rn"),
        col("v"),
        greatest(col("__sin") + col("__p"), col("__p") - col("__mp")).as("cusum"),
        (greatest(col("__sin") + col("__p"), col("__p") - col("__mp")) > threshold)
          .as("alarm"))
  }

  /** Float-domain EWMA as a two-level affine chunked scan — the
    * skew-proof production form of [[ewmaTrace]], and the trade its
    * scaladoc names made explicit: the integer-exact recurrence's
    * floor does NOT compose, but the standard float EWMA
    * s_j = α·v_j + (1−α)·s_{j−1} is affine in the state, so a chunk
    * reduces to the pair (A = (1−α)^cnt by repeated multiply,
    * B = the chunk's zero-state response) and composes as
    * s_out = A·s_in + B. Per-key sequential work is O(#buckets),
    * volume-independent; a hot key's time buckets fold and verify on
    * DIFFERENT tasks.
    *
    * Chunked float arithmetic is NOT the sequential float order — so
    * instead of hand-waving a tolerance, the operator makes its OWN
    * dataflow the contract: every double here is produced by a fixed
    * sequence of IEEE-754 round-to-nearest mul/adds on exactly
    * representable inputs (α dyadic = num/2^k, v a long), and the
    * registered oracle replays the IDENTICAL sequence in DuckDB —
    * per-bucket (A_j, B_j, Bp_j) recurrences, the same bucket-carry
    * recursion, the same final `A_j·s_in + B_j` — so the gate is an
    * EXACT hash match on raw doubles, not an epsilon compare. (JDK
    * 17 FP is strict; neither engine fuses or reassociates.) The
    * first bucket of each key carries the sibling's s_1 = v_1 init
    * through the Bp ("B-primed") recurrence.
    *
    * Bucket assignment is integer µs floor-division on BOTH sides
    * (`unix_micros div (bucketSeconds·10⁶)`) — a float boundary
    * wobble would change chunk shapes and therefore the doubles.
    * Pre-epoch timestamps raise loudly (integer div truncates toward
    * zero, DuckDB's // floors — they disagree below zero).
    *
    * Output: keyCol, rn, v (long), ewma (double).
    */
  def ewmaTraceChunked(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valCol: String,
                       num: Int, log2Den: Int,
                       bucketSeconds: Long = 86400L,
                       maxBuckets: Int = 1 << 16): DataFrame = {
    require(log2Den >= 1 && log2Den <= 30,
      s"ewmaTraceChunked: log2Den must be in [1,30], got $log2Den")
    val den = 1L << log2Den
    require(num >= 1 && num <= den,
      s"ewmaTraceChunked: num must be in [1, $den], got $num")
    require(bucketSeconds > 0,
      s"ewmaTraceChunked: bucketSeconds must be positive, got $bucketSeconds")
    require(maxBuckets > 0, "ewmaTraceChunked: maxBuckets must be positive")
    val alpha = num.toDouble / den   // dyadic: exactly representable
    val beta = 1.0 - alpha           // exact for dyadic alpha
    val bucketMicros = bucketSeconds * 1000000L

    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val tsGuard = when(col(tsCol).isNull, raise_error(concat(
        lit(s"ewmaTraceChunked: NULL $tsCol for key "),
        col(keyCol).cast("string"),
        lit(" — bucket assignment needs the event time"))))
      .when(micros < 0, raise_error(concat(
        lit(s"ewmaTraceChunked: pre-epoch $tsCol for key "),
        col(keyCol).cast("string"),
        lit(" — truncating vs flooring integer division diverge below zero"))))
      .otherwise(col(tsCol))
    val tieGuard = when(col(tieCol).isNull, raise_error(concat(
        lit(s"ewmaTraceChunked: NULL $tieCol for key "),
        col(keyCol).cast("string"),
        lit(" — the within-bucket order needs the tie-breaker"))))
      .otherwise(col(tieCol))
    val vGuard = when(col(valCol).isNull, raise_error(concat(
        lit(s"ewmaTraceChunked: NULL $valCol for key "),
        col(keyCol).cast("string"),
        lit(" — the recurrence would poison the trace tail; filter or impute first"))))
      .otherwise(col(valCol)).cast("long")

    // within-bucket fold: per element j, the affine pair from zero
    // state (A_j, B_j) and the first-bucket trace Bp_j (init s_1=v_1)
    val perBucket = df
      .select(col(keyCol),
        // exact-in-double floor: epoch µs < 2^53 and the ≥1 µs
        // boundary margin (rel. 1e-11) dwarfs the division's 0.5 ulp
        // (rel. 1e-16), so this floor equals DuckDB's integer //
        floor(micros / lit(bucketMicros.toDouble)).as("__b"),
        struct(tsGuard.as("ts"), tieGuard.as("tie"), vGuard.as("v")).as("e"))
      .groupBy(col(keyCol), col("__b"))
      .agg(sort_array(collect_list(col("e"))).as("seq"))
      .withColumn("__abp", aggregate(
        col("seq"),
        typedLit(Seq.empty[(Double, Double, Double)])
          .cast("array<struct<a:double,b:double,bp:double>>"),
        (acc, el) => {
          val prev = element_at(acc, -1)
          val v = el.getField("v").cast("double")
          val first = size(acc) === 0
          val a = when(first, lit(beta)).otherwise(prev.getField("a") * lit(beta))
          val b = when(first, lit(alpha) * v)
            .otherwise(lit(alpha) * v + lit(beta) * prev.getField("b"))
          val bp = when(first, v)
            .otherwise(lit(alpha) * v + lit(beta) * prev.getField("bp"))
          concat(acc, array(struct(a.as("a"), b.as("b"), bp.as("bp"))))
        }))

    // bucket summaries fold per key in bucket order: carry the state
    // across buckets (first bucket seeds from Bp; later buckets are
    // one mul+add each) + the rank offset
    val folded = perBucket
      .select(col(keyCol), col("__b"),
        element_at(col("__abp"), -1).as("sumr"),
        size(col("__abp")).cast("long").as("cnt"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col("__b").as("b"), col("sumr.a").as("ac"), col("sumr.b").as("bc"),
        col("sumr.bp").as("bpc"), col("cnt").as("c")))).as("bs"))
      .withColumn("bs",
        when(size(col("bs")) > maxBuckets, raise_error(concat(
          lit(s"ewmaTraceChunked: key "), col(keyCol).cast("string"),
          lit(" spans "), size(col("bs")).cast("string"),
          lit(s" buckets > maxBuckets=$maxBuckets — widen bucketSeconds or raise the cap"))))
        .otherwise(col("bs")))
      .withColumn("carry", aggregate(
        col("bs"),
        typedLit(Seq.empty[(Long, Double, Double, Long)])
          .cast("array<struct<b:bigint,sin:double,sout:double,off:bigint>>"),
        (acc, el) => {
          val prev = element_at(acc, -1)
          val first = size(acc) === 0
          val sin = when(first, lit(null).cast("double"))
            .otherwise(prev.getField("sout"))
          val sout = when(first, el.getField("bpc"))
            .otherwise(el.getField("ac") * sin + el.getField("bc"))
          val off = when(first, lit(0L))
            .otherwise(prev.getField("off") +
              element_at(col("bs"), size(acc)).getField("c"))
          concat(acc, array(struct(
            el.getField("b").as("b"), sin.as("sin"),
            sout.as("sout"), off.as("off"))))
        }))
      .select(col(keyCol), explode(col("carry")).as("ci"))
      .select(col(keyCol), col("ci.b").as("__b"),
        col("ci.sin").as("__sin"), col("ci.off").as("__off"))

    perBucket.join(folded, Seq(keyCol, "__b"))
      .select(col(keyCol), col("__off"),
        posexplode(arrays_zip(col("seq"), col("__abp"))),
        col("__sin"))
      .select(col(keyCol),
        (col("__off") + col("pos") + 1).as("rn"),
        col("col.seq.v").as("v"),
        when(col("__sin").isNull, col("col.__abp.bp"))
          .otherwise(col("col.__abp.a") * col("__sin") + col("col.__abp.b"))
          .as("ewma"))
  }

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
