package graft

import java.sql.Timestamp
import graft.ops.Smoothing
import org.apache.spark.sql.functions._

class SmoothingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("ewmaTrace alpha=1/2 matches the hand-computed recurrence") {
    // s1=100; s2=(30+100)>>1=65; s3=(7+65)>>1=36 (floor of 36.0)
    val df = Seq((1L, ts(1), 1L, 100L), (1L, ts(2), 2L, 30L), (1L, ts(3), 3L, 7L))
      .toDF("k", "ts", "tie", "v")
    val got = Smoothing.ewmaTrace(df, "k", "ts", "tie", "v", 1, 1)
      .orderBy("rn").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 100L, 100L), (1L, 2L, 30L, 65L), (1L, 3L, 7L, 36L)))
  }

  test("ewmaTrace truncation floors, never rounds") {
    // s1=1; s2=(0+1)>>1 = 0 (0.5 floors to 0)
    val df = Seq((1L, ts(1), 1L, 1L), (1L, ts(2), 2L, 0L)).toDF("k", "ts", "tie", "v")
    val got = Smoothing.ewmaTrace(df, "k", "ts", "tie", "v", 1, 1)
      .orderBy("rn").as[(Long, Long, Long, Long)].collect().map(_._4).toSeq
    assert(got == Seq(1L, 0L))
  }

  test("ewmaTrace general alpha num/2^k (alpha=3/4)") {
    // s1=40; s2=(3*8 + 1*40)>>2 = 64>>2 = 16
    val df = Seq((1L, ts(1), 1L, 40L), (1L, ts(2), 2L, 8L)).toDF("k", "ts", "tie", "v")
    val got = Smoothing.ewmaTrace(df, "k", "ts", "tie", "v", 3, 2)
      .orderBy("rn").as[(Long, Long, Long, Long)].collect().map(_._4).toSeq
    assert(got == Seq(40L, 16L))
  }

  test("ewmaTrace keys are independent and ties break by tieCol") {
    val df = Seq(
      (1L, ts(1), 2L, 10L), (1L, ts(1), 1L, 50L), // same ts: order by tie -> 50 then 10
      (2L, ts(1), 1L, 7L)
    ).toDF("k", "ts", "tie", "v")
    val got = Smoothing.ewmaTrace(df, "k", "ts", "tie", "v", 1, 1)
      .orderBy("k", "rn").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 50L, 50L), (1L, 2L, 10L, 30L), (2L, 1L, 7L, 7L)))
  }

  test("ewmaTrace rejects negative values loudly") {
    val df = Seq((1L, ts(1), 1L, -5L)).toDF("k", "ts", "tie", "v")
    val e = intercept[Exception] {
      Smoothing.ewmaTrace(df, "k", "ts", "tie", "v", 1, 1).collect()
    }
    assert(e.getMessage.contains("negative") || e.getCause != null)
  }

  test("ewmaTrace enforces the per-key sequence cap loudly") {
    val df = (1L to 10L).map(i => (1L, ts(1), i, i)).toDF("k", "ts", "tie", "v")
    val e = intercept[Exception] {
      Smoothing.ewmaTrace(df, "k", "ts", "tie", "v", 1, 1, maxSeqLen = 5).collect()
    }
    assert(e.getMessage.contains("maxSeqLen") || e.getCause != null)
  }

  test("cusumTrace accumulates excess over target and clamps at zero") {
    // target 10: v=15 -> s=5; v=3 -> max(0, 5-7)=0; v=25 -> 15; v=12 -> 17
    val df = Seq((1L, ts(1), 1L, 15L), (1L, ts(2), 2L, 3L),
      (1L, ts(3), 3L, 25L), (1L, ts(4), 4L, 12L)).toDF("k", "ts", "tie", "v")
    val got = graft.ops.Smoothing.cusumTrace(df, "k", "ts", "tie", "v",
        target = 10L, threshold = 16L)
      .orderBy("rn").as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._4) == Seq(5L, 0L, 15L, 17L))
    assert(got.map(_._5) == Seq(false, false, false, true))
  }

  test("cusumTrace handles negative values exactly (no division)") {
    val df = Seq((1L, ts(1), 1L, -5L), (1L, ts(2), 2L, 30L)).toDF("k", "ts", "tie", "v")
    val got = graft.ops.Smoothing.cusumTrace(df, "k", "ts", "tie", "v", 0L, 100L)
      .orderBy("rn").as[(Long, Long, Long, Long, Boolean)].collect().map(_._4).toSeq
    assert(got == Seq(0L, 30L))
  }

  test("ewmaTrace rejects values that would overflow num*v loudly") {
    val big = Long.MaxValue / 2 + 1
    val df = Seq((1L, ts(1), 1L, big)).toDF("k", "ts", "tie", "v")
    val e = intercept[Exception] {
      graft.ops.Smoothing.ewmaTrace(df, "k", "ts", "tie", "v", 1, 1).collect()
    }
    assert(e.getMessage.contains("overflow") || e.getCause != null)
  }

  test("holtTrace: hand two-state recurrence including negative trend") {
    // v: 100, 60, 20 -> l1=100,b1=0; l2=(60+100+0)>>1=80, b2=(80-100+0)>>1=-10
    // l3=(20+80-10)>>1=45, b3=(45-80-10)>>1=floor(-45/2)=-23
    val df = Seq((1L, ts(1), 1L, 100L), (1L, ts(2), 2L, 60L), (1L, ts(3), 3L, 20L))
      .toDF("k", "ts", "tie", "v")
    val got = graft.ops.Smoothing.holtTrace(df, "k", "ts", "tie", "v")
      .orderBy("rn").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._4, r._5)) == Seq((100L, 0L), (80L, -10L), (45L, -23L)))
  }

  test("holtTrace tracks a perfect ramp with converging trend") {
    // steady +10 ramp: trend should home in near 10 and level near v
    val df = (1L to 12L).map(i => (1L, ts(i.toInt), i, 100L + 10L * i))
      .toDF("k", "ts", "tie", "v")
    val last = graft.ops.Smoothing.holtTrace(df, "k", "ts", "tie", "v")
      .orderBy("rn").as[(Long, Long, Long, Long, Long)].collect().last
    assert(math.abs(last._5 - 10L) <= 3, last)   // trend near +10
    assert(math.abs(last._4 - last._3) <= 15, last) // level near value
  }

  // ---- cusumTraceChunked: the two-level (max,+) scan must be
  // BIT-IDENTICAL to the sequential fold on every input ----

  /** deterministic LCG stream (no RNG in the repo's test contract) */
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def chunkedEqualsSequential(
      rows: Seq[(Long, Timestamp, Long, Long)],
      target: Long, threshold: Long, bucketSeconds: Long): Unit = {
    val df = rows.toDF("k", "ts", "tie", "v")
    val seqr = graft.ops.Smoothing.cusumTrace(df, "k", "ts", "tie", "v",
        target, threshold)
      .orderBy("k", "rn").as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    val chk = graft.ops.Smoothing.cusumTraceChunked(df, "k", "ts", "tie", "v",
        target, threshold, bucketSeconds = bucketSeconds)
      .orderBy("k", "rn").as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(chk == seqr,
      s"chunked(bucket=$bucketSeconds) diverged from sequential on ${rows.size} rows")
  }

  test("cusumTraceChunked == cusumTrace: multi-key, negative deltas, clamps, boundary-exact ts, ties") {
    val vs = lcg(42L)
    // 3 keys x 200 events over ~6 days, incl. rows EXACTLY on the
    // daily bucket boundary and same-ts ties broken by tie
    val rows = (0 until 600).map { i =>
      val k = (i % 3).toLong + 1
      val dayOffset = (i / 3) % 6
      val secInDay = if (i % 17 == 0) 0L else math.floorMod(vs.next(), 86400L)
      val t = Timestamp.valueOf(f"2024-01-${dayOffset + 1}%02d 00:00:00")
      val tt = new Timestamp(t.getTime + secInDay * 1000L)
      val v = math.floorMod(vs.next(), 400L) - 150L // negatives exercise the clamp
      (k, tt, i.toLong, v)
    } ++ Seq( // duplicate-ts pair: order decided by tie alone
      (1L, ts(1), 9001L, 300L), (1L, ts(1), 9000L, -300L))
    chunkedEqualsSequential(rows, target = 10L, threshold = 500L, bucketSeconds = 86400L)
    chunkedEqualsSequential(rows, target = 10L, threshold = 500L, bucketSeconds = 3600L)
    // one giant bucket degenerates to the sequential plan shape
    chunkedEqualsSequential(rows, target = 10L, threshold = 500L,
      bucketSeconds = 365L * 86400L)
  }

  test("cusumTraceChunked == cusumTrace on a hot key (the skew-suite victim shape)") {
    val vs = lcg(7L)
    // one key holds 80% of events — the shape that made sequential
    // q_cusum 5.2x slower on the skew twin
    val rows = (0 until 1000).map { i =>
      val k = if (i % 5 == 0) (i % 7).toLong + 2 else 1L
      val t = new Timestamp(ts(1).getTime + (i.toLong * 97000L) % (10L * 86400000L))
      (k, t, i.toLong, math.floorMod(vs.next(), 300L) - 80L)
    }
    chunkedEqualsSequential(rows, target = 20L, threshold = 1000L, bucketSeconds = 86400L)
  }

  // ---- ewmaTraceChunked: the float-domain affine scan. Keys that
  // fit ONE bucket replay the sequential op order exactly; multi-
  // bucket chains are pinned by a JVM replay of the same dataflow
  // and bounded against the mathematical recurrence ----

  /** sequential float EWMA, same op order as the within-bucket Bp
    * recurrence: s_1 = v_1; s_j = α·v_j + β·s_{j-1} */
  private def seqFp(vs: Seq[Long], alpha: Double): Seq[Double] = {
    val beta = 1.0 - alpha
    vs.tail.scanLeft(vs.head.toDouble)((s, v) => alpha * v + beta * s)
  }

  /** JVM replay of the chunked dataflow: per-bucket (A,B,Bp) then the
    * bucket-carry recursion then A_j·s_in + B_j — an independent
    * re-derivation the engine output must match BIT-FOR-BIT */
  private def chunkedFpReplay(buckets: Seq[Seq[Long]], alpha: Double): Seq[Double] = {
    val beta = 1.0 - alpha
    var sIn: Option[Double] = None
    buckets.flatMap { vs =>
      var a = 0.0; var b = 0.0; var bp = 0.0; var first = true
      val out = vs.map { v =>
        if (first) { a = beta; b = alpha * v; bp = v.toDouble; first = false }
        else { a = a * beta; b = alpha * v + beta * b; bp = alpha * v + beta * bp }
        sIn match {
          case None => bp
          case Some(s) => a * s + b
        }
      }
      sIn = Some(sIn match { case None => bp; case Some(s) => a * s + b })
      out
    }
  }

  test("ewmaTraceChunked: single-bucket key IS the sequential float order, bit-exact") {
    val vs = lcg(11L).map(x => math.floorMod(x, 10000L)).take(50).toSeq
    val df = vs.zipWithIndex.map { case (v, i) =>
      (1L, new Timestamp(ts(1).getTime + i * 1000L), i.toLong, v) // all in one day
    }.toDF("k", "ts", "tie", "v")
    val got = graft.ops.Smoothing.ewmaTraceChunked(df, "k", "ts", "tie", "v", 1, 1)
      .orderBy("rn").as[(Long, Long, Long, Double)].collect().map(_._4).toSeq
    val want = seqFp(vs, 0.5)
    assert(got == want, "single-bucket chunked diverged from the sequential float order")
  }

  test("ewmaTraceChunked: multi-bucket chain matches the JVM dataflow replay bit-for-bit " +
       "and the mathematical recurrence to 1e-9 relative") {
    val raw = lcg(23L).map(x => math.floorMod(x, 100000L)).take(120).toSeq
    val buckets = raw.grouped(17).toSeq // uneven final bucket included
    val rows = buckets.zipWithIndex.flatMap { case (vs, d) =>
      vs.zipWithIndex.map { case (v, i) =>
        (1L, new Timestamp(ts(1).getTime + d * 86400000L + i * 1000L),
          (d * 1000 + i).toLong, v)
      }
    }
    val got = graft.ops.Smoothing.ewmaTraceChunked(
        rows.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v", 1, 1)
      .orderBy("rn").as[(Long, Long, Long, Double)].collect().map(_._4).toSeq
    assert(got == chunkedFpReplay(buckets, 0.5),
      "engine doubles diverged from the JVM replay of the same dataflow")
    val seqr = seqFp(raw, 0.5)
    got.zip(seqr).zipWithIndex.foreach { case ((c, s), i) =>
      assert(math.abs(c - s) <= 1e-9 * math.max(1.0, math.abs(s)),
        s"chunked vs sequential drift at rn=${i + 1}: $c vs $s")
    }
  }

  test("ewmaTraceChunked: general alpha (3/4), multiple keys, rn offsets line up") {
    val rows = (0 until 60).map { i =>
      val k = (i % 2).toLong + 1
      (k, new Timestamp(ts(1).getTime + i * 3600000L), i.toLong, (i * 7 % 90).toLong)
    }
    val got = graft.ops.Smoothing.ewmaTraceChunked(
        rows.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v", 3, 2,
        bucketSeconds = 6 * 3600L)
      .orderBy("k", "rn").as[(Long, Long, Long, Double)].collect()
    val byKey = got.groupBy(_._1)
    assert(byKey.keySet == Set(1L, 2L))
    byKey.foreach { case (k, rs) =>
      assert(rs.map(_._2).toSeq == (1L to rs.length).toSeq, s"rn gap for key $k")
      val vs = rows.filter(_._1 == k).sortBy(_._3).map(_._4)
      val seqr = seqFp(vs, 0.75)
      rs.map(_._4).zip(seqr).foreach { case (c, s) =>
        assert(math.abs(c - s) <= 1e-9 * math.max(1.0, math.abs(s)))
      }
    }
  }

  test("ewmaTraceChunked guards: maxBuckets trips; NULL value raises") {
    val df = (1 to 10).map(i => (1L, ts(i), i.toLong, 1L)).toDF("k", "ts", "tie", "v")
    val e = intercept[Exception] {
      graft.ops.Smoothing.ewmaTraceChunked(df, "k", "ts", "tie", "v", 1, 1,
        bucketSeconds = 3600L, maxBuckets = 3).collect()
    }
    assert(e.getMessage.contains("maxBuckets") || e.getCause != null)
    val dfn = Seq((Some(1L), Some(ts(1)), Some(1L), Option.empty[Long]))
      .toDF("k", "ts", "tie", "v")
    val e2 = intercept[Exception] {
      graft.ops.Smoothing.ewmaTraceChunked(dfn, "k", "ts", "tie", "v", 1, 1).collect()
    }
    assert(e2.getMessage.contains("NULL v") || e2.getCause != null)
  }

  // ---- holtTraceChunked: 2-state affine chunked scan ----

  /** sequential float Holt, same op order as the lp/bp recurrence:
    * l_1 = v_1, b_1 = 0; l = (α·v + α·l') + α·b'; b = α·(l − l') + α·b' */
  private def seqHoltFp(vs: Seq[Long]): Seq[(Double, Double)] =
    vs.tail.scanLeft((vs.head.toDouble, 0.0)) { case ((l0, b0), v) =>
      val l = (0.5 * v + 0.5 * l0) + 0.5 * b0
      val b = 0.5 * (l - l0) + 0.5 * b0
      (l, b)
    }

  /** JVM replay of the chunked coefficient dataflow (identity-init
    * P..U + lp/bp first-bucket trace + bucket carries) */
  private def chunkedHoltFpReplay(buckets: Seq[Seq[Long]]): Seq[(Double, Double)] = {
    var carry: Option[(Double, Double)] = None
    buckets.flatMap { vs =>
      var p = 1.0; var q = 0.0; var r = 0.0; var s = 0.0; var t = 1.0; var u = 0.0
      var lp = 0.0; var bp = 0.0; var first = true
      val out = vs.map { v =>
        val p1 = 0.5 * p + 0.5 * s
        val q1 = 0.5 * q + 0.5 * t
        val r1 = (0.5 * v + 0.5 * r) + 0.5 * u
        val s1 = 0.5 * (p1 - p) + 0.5 * s
        val t1 = 0.5 * (q1 - q) + 0.5 * t
        val u1 = 0.5 * (r1 - r) + 0.5 * u
        val lp1 = if (first) v.toDouble else (0.5 * v + 0.5 * lp) + 0.5 * bp
        val bp1 = if (first) 0.0 else 0.5 * (lp1 - lp) + 0.5 * bp
        p = p1; q = q1; r = r1; s = s1; t = t1; u = u1; lp = lp1; bp = bp1
        first = false
        carry match {
          case None => (lp, bp)
          case Some((li, bi)) => ((p * li + q * bi) + r, (s * li + t * bi) + u)
        }
      }
      carry = Some(carry match {
        case None => (lp, bp)
        case Some((li, bi)) => ((p * li + q * bi) + r, (s * li + t * bi) + u)
      })
      out
    }
  }

  test("holtTraceChunked: single-bucket key IS the sequential float order, bit-exact") {
    val vs = lcg(31L).map(x => math.floorMod(x, 10000L)).take(40).toSeq
    val df = vs.zipWithIndex.map { case (v, i) =>
      (1L, new Timestamp(ts(1).getTime + i * 1000L), i.toLong, v)
    }.toDF("k", "ts", "tie", "v")
    val got = graft.ops.Smoothing.holtTraceChunked(df, "k", "ts", "tie", "v")
      .orderBy("rn").as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._4, r._5)).toSeq
    assert(got == seqHoltFp(vs))
  }

  test("holtTraceChunked: multi-bucket matches the JVM dataflow replay bit-for-bit " +
       "and the mathematical recurrence to 1e-9 relative") {
    val raw = lcg(37L).map(x => math.floorMod(x, 100000L)).take(100).toSeq
    val buckets = raw.grouped(13).toSeq
    val rows = buckets.zipWithIndex.flatMap { case (vs, d) =>
      vs.zipWithIndex.map { case (v, i) =>
        (1L, new Timestamp(ts(1).getTime + d * 86400000L + i * 1000L),
          (d * 1000 + i).toLong, v)
      }
    }
    val got = graft.ops.Smoothing.holtTraceChunked(
        rows.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v")
      .orderBy("rn").as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._4, r._5)).toSeq
    assert(got == chunkedHoltFpReplay(buckets),
      "engine doubles diverged from the JVM replay of the same dataflow")
    val seqr = seqHoltFp(raw)
    got.zip(seqr).zipWithIndex.foreach { case (((cl, cb), (sl, sb)), i) =>
      assert(math.abs(cl - sl) <= 1e-9 * math.max(1.0, math.abs(sl)),
        s"level drift at rn=${i + 1}: $cl vs $sl")
      assert(math.abs(cb - sb) <= 1e-9 * math.max(1.0, math.abs(sb)),
        s"trend drift at rn=${i + 1}: $cb vs $sb")
    }
  }

  test("cusumTraceChunked raises loudly on NULL ts (bucket assignment needs it)") {
    val df = Seq((Some(1L), Option.empty[Timestamp], Some(1L), Some(5L)))
      .toDF("k", "ts", "tie", "v")
    val e = intercept[Exception] {
      graft.ops.Smoothing.cusumTraceChunked(df, "k", "ts", "tie", "v", 0L, 10L).collect()
    }
    assert(e.getMessage.contains("NULL ts") || e.getCause != null)
  }

  test("cusumTraceChunked trips the maxBuckets cap loudly") {
    val df = (1 to 10).map(i => (1L, ts(i), i.toLong, 1L)).toDF("k", "ts", "tie", "v")
    val e = intercept[Exception] {
      graft.ops.Smoothing.cusumTraceChunked(df, "k", "ts", "tie", "v", 0L, 10L,
        bucketSeconds = 3600L, maxBuckets = 3).collect()
    }
    assert(e.getMessage.contains("maxBuckets") || e.getCause != null)
  }

  test("cusumTraceChunked raises loudly on NULL value (the sibling vGuard contract)") {
    // before the guard, a NULL delta was silently SKIPPED by the
    // windowed sum — every later row's cusum shifted with no signal
    val df = Seq(
      (Some(1L), Some(ts(1)), Some(1L), Some(5L)),
      (Some(1L), Some(ts(2)), Some(2L), Option.empty[Long]))
      .toDF("k", "ts", "tie", "v")
    val e = intercept[Exception] {
      graft.ops.Smoothing.cusumTraceChunked(df, "k", "ts", "tie", "v", 0L, 10L).collect()
    }
    assert(e.getMessage.contains("NULL v") || e.getCause != null)
  }
}
