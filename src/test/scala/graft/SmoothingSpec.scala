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
}
