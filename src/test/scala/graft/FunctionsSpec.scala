package graft

import graft.functions.{DeterministicModeAgg, WeatherFunctions => WF}
import graft.functions.DeterministicMode.modeDet
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic mode: majority wins") {
    val df = Seq(("a", "rain"), ("a", "rain"), ("a", "sun")).toDF("k", "v")
    val r = df.groupBy($"k").agg(modeDet($"v").as("m")).head()
    assert(r.getAs[String]("m") == "rain")
  }

  test("deterministic mode: tie broken by lexicographically smallest") {
    val df = Seq(("a", "sun"), ("a", "rain"), ("a", "rain"), ("a", "sun")).toDF("k", "v")
    assert(df.groupBy($"k").agg(modeDet($"v").as("m")).head().getAs[String]("m") == "rain")
  }

  test("deterministic mode: nulls ignored; all-null group yields null") {
    val df = Seq(("a", Option("x")), ("a", None), ("b", None)).toDF("k", "v")
    val m = df.groupBy($"k").agg(modeDet($"v").as("m")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("a") == "x" && m("b") == null)
  }

  test("mode Aggregator merge is order-insensitive") {
    val b1 = Seq("x", "x", "y").foldLeft(DeterministicModeAgg.zero)(DeterministicModeAgg.reduce)
    val b2 = Seq("y", "y").foldLeft(DeterministicModeAgg.zero)(DeterministicModeAgg.reduce)
    assert(DeterministicModeAgg.finish(DeterministicModeAgg.merge(b1, b2)) ==
      DeterministicModeAgg.finish(DeterministicModeAgg.merge(b2, b1)))
    // x:2, y:3 → y
    assert(DeterministicModeAgg.finish(DeterministicModeAgg.merge(b1, b2)) == "y")
  }

  test("heat index matches a known NWS table point (±1.5°F tolerance)") {
    // NWS heat index chart: T=90°F, RH=70% → HI ≈ 105°F
    val df = Seq((WF.fToC(lit(90.0)), 70.0)).map(_ => (32.222222, 70.0)).toDF("t_c", "rh")
    val hiF = df.select(WF.cToF(WF.heatIndexC($"t_c", $"rh")).as("hi")).head().getAs[Double]("hi")
    assert(math.abs(hiF - 105.0) < 1.5, s"heat index was $hiF")
  }

  test("c/f conversion round-trips") {
    val df = Seq(25.0, -10.0, 0.0).toDF("c")
    val rows = df.select(WF.fToC(WF.cToF($"c")).as("rt"), $"c").collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("zeroPad2 pads to two digits") {
    val r = Seq(0, 5, 50).toDF("n").select(WF.zeroPad2($"n").as("p")).as[String].collect()
    assert(r.toSeq == Seq("00", "05", "50"))
  }

  test("timestamp parse/format round-trips the reference format") {
    val df = Seq("2024-01-02 03:04:05").toDF("s")
    val r = df.select(WF.formatTs(WF.parseTs($"s")).as("rt")).head().getString(0)
    assert(r == "2024-01-02 03:04:05")
  }
}
