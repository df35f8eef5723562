package graft

import graft.ops.Resample
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(epoch: Long) = new Timestamp(epoch * 1000L)

  test("linear interpolation between neighbors; verbatim at observations; NULL outside range") {
    val obs = Seq(("a", ts(1000), 100.0), ("a", ts(1100), 300.0))
      .toDF("k", "t", "v")
    val out = Resample.interpolate(obs, Seq("k"), "t", "v", 950L, 1150L, 50)
      .orderBy($"grid_ts")
      .select(unix_timestamp($"grid_ts").as("e"), $"value")
      .as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      (950L, None),          // before first obs
      (1000L, Some(100.0)),  // exact obs
      (1050L, Some(200.0)),  // midpoint
      (1100L, Some(300.0)),  // exact obs
      (1150L, None)))        // after last obs
  }

  test("uneven spacing interpolates by exact time fractions") {
    val obs = Seq(("a", ts(0), 0.0), ("a", ts(400), 100.0)).toDF("k", "t", "v")
    val out = Resample.interpolate(obs, Seq("k"), "t", "v", 100L, 300L, 100)
      .orderBy($"grid_ts").select($"value").as[Double].collect().toSeq
    assert(out == Seq(25.0, 50.0, 75.0))
  }

  test("keys interpolate independently; a single-observation key is NULL except at its instant") {
    val obs = Seq(("a", ts(0), 0.0), ("a", ts(200), 200.0), ("b", ts(100), 7.0))
      .toDF("k", "t", "v")
    val out = Resample.interpolate(obs, Seq("k"), "t", "v", 0L, 200L, 100)
      .orderBy($"k", $"grid_ts")
      .select($"k", $"value").as[(String, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("a", Some(0.0)), ("a", Some(100.0)), ("a", Some(200.0)),
      ("b", None), ("b", Some(7.0)), ("b", None)))
  }

  test("duplicate observations at one instant fail loud") {
    val obs = Seq(("a", ts(0), 1.0), ("a", ts(0), 2.0)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      Resample.interpolate(obs, Seq("k"), "t", "v", 0L, 100L, 100).collect()
    }
    assert(e.getMessage.contains("duplicate observation"), e.getMessage)
  }

  test("NULL observations fail loud instead of silently vanishing") {
    val obs = Seq(("a", ts(0), Some(1.0)), ("a", ts(50), Option.empty[Double]))
      .toDF("k", "t", "v")
    val e = intercept[Exception] {
      Resample.interpolate(obs, Seq("k"), "t", "v", 0L, 100L, 100).collect()
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }

  test("timeWeightedAvg: step-function weighting, pre-window carry, uncovered head") {
    val obs = Seq(
      ("a", ts(0), 100.0), ("a", ts(50), 200.0),   // equal halves -> 150
      ("b", ts(-100), 40.0), ("b", ts(50), 80.0),  // carries 40 into [0,50)
      ("c", ts(30), 10.0),                         // head [0,30) uncovered
      ("d", ts(200), 9.0)                          // entirely past the window
    ).toDF("k", "t", "v")
    val out = Resample.timeWeightedAvg(obs, Seq("k"), "t", "v", 0L, 100L)
      .orderBy($"k").as[(String, Option[Double], Long)].collect().toSeq
    assert(out == Seq(
      ("a", Some(150.0), 100L),
      ("b", Some(60.0), 100L),
      ("c", Some(10.0), 70L)))   // d: no coverage -> absent
  }

  test("timeWeightedAvg: observations after the window never contribute") {
    val obs = Seq(("a", ts(10), 100.0), ("a", ts(90), 300.0), ("a", ts(150), 999999.0))
      .toDF("k", "t", "v")
    val out = Resample.timeWeightedAvg(obs, Seq("k"), "t", "v", 0L, 100L)
      .as[(String, Option[Double], Long)].collect().head
    // [10,90) at 100 + [90,100) at 300, head [0,10) uncovered
    assert(out == (("a", Some((100.0 * 80 + 300.0 * 10) / 90), 90L)))
  }

  test("timeWeightedAvg: duplicate instants fail loud") {
    val obs = Seq(("a", ts(10), 1.0), ("a", ts(10), 2.0)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      Resample.timeWeightedAvg(obs, Seq("k"), "t", "v", 0L, 100L).collect()
    }
    assert(e.getMessage.contains("duplicate observation"), e.getMessage)
  }

  test("result is independent of input partitioning") {
    val obs = Seq(("a", ts(0), 0.0), ("a", ts(300), 90.0), ("a", ts(700), -10.0))
      .toDF("k", "t", "v")
    val a = Resample.interpolate(obs, Seq("k"), "t", "v", 0L, 700L, 100)
      .orderBy($"grid_ts").select($"value").as[Option[Double]].collect().toSeq
    val b = Resample.interpolate(obs.repartition(7), Seq("k"), "t", "v", 0L, 700L, 100)
      .orderBy($"grid_ts").select($"value").as[Option[Double]].collect().toSeq
    assert(a == b && a.flatten.nonEmpty)
  }

  test("ohlc: hand-checked bars — open/close by instant, high/low by value") {
    // one key, one 60s bucket [960,1020) gets 1000,1010; [1020,1080) gets 1050
    val obs = Seq(
      ("a", ts(1000), 5L), ("a", ts(1010), 9L), ("a", ts(1019), 2L),
      ("a", ts(1050), 7L),
      ("b", ts(1000), 1L)
    ).toDF("k", "t", "v")
    val bars = Resample.ohlc(obs, Seq("k"), "t", "v", 60L)
      .select($"k", unix_timestamp($"bucket_start").as("b"),
        $"open", $"high", $"low", $"close", $"n_obs")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(bars == Set(
      ("a", 960L, 5L, 9L, 2L, 2L, 3L),
      ("a", 1020L, 7L, 7L, 7L, 7L, 1L),
      ("b", 960L, 1L, 1L, 1L, 1L, 1L)))
  }

  test("ohlc is partitioning-independent; duplicate instants fail loud") {
    val obs = (1L to 500L).map(i => (s"k${i % 3}", ts(1000 + i * 7), (i * 13) % 100))
      .toDF("k", "t", "v")
    val a = Resample.ohlc(obs.repartition(11), Seq("k"), "t", "v", 300L)
      .orderBy($"k", $"bucket_start").collect()
    val b = Resample.ohlc(obs, Seq("k"), "t", "v", 300L)
      .orderBy($"k", $"bucket_start").collect()
    assert(a.nonEmpty && a.sameElements(b))
    val dup = Seq(("a", ts(1000), 1L), ("a", ts(1000), 2L)).toDF("k", "t", "v")
    val e = intercept[Exception](Resample.ohlc(dup, Seq("k"), "t", "v", 60L).collect())
    assert(e.getMessage.contains("duplicate observation"), e.getMessage)
  }
}
