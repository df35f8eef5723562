package graft

import graft.operators.{CountMin, PortableHll, QuantileSketch}
import graft.streaming.StreamSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** StreamSketch ≡ batch build: registers/bins streamed out of a real
  * MemoryStream (incremental execution, watermark accepted, late
  * rows inside the watermark folded in) must equal the batch
  * builders on the same rows — the property that lets batch rollups
  * consume streamed sketch frames interchangeably. */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(ts: Timestamp, grp: String, uid: Long)

  test("windowedRegisters over a MemoryStream equals the batch registers per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamSketch.windowedRegisters(
        input.toDF(), "ts", "10 minutes", "5 minutes", Seq("grp"), "uid", lgK = 6)
      .select(col("window.start").as("ws"), col("grp"), col("reg"), col("r"))
      .writeStream.format("memory").queryName("sk_regs").outputMode("update").start()
    try {
      input.addData(
        Ev(ts("2024-01-01 05:03:00"), "a", 101), Ev(ts("2024-01-01 05:04:00"), "a", 102),
        Ev(ts("2024-01-01 05:06:00"), "b", 103), Ev(ts("2024-01-01 05:13:00"), "a", 104))
      query.processAllAvailable()
      // late row, still inside the watermark: folds into the 05:00 window
      input.addData(Ev(ts("2024-01-01 05:08:00"), "a", 105))
      query.processAllAvailable()
      // update mode re-emits refinements; keep the LAST row per key
      val streamed = spark.table("sk_regs")
        .withColumn("__seq", monotonically_increasing_id())
        .groupBy($"ws", $"grp", $"reg")
        .agg(max_by($"r", $"__seq").as("r"))
        .orderBy($"ws", $"grp", $"reg")
        .as[(Timestamp, String, Int, Int)].collect()
      val batch = PortableHll.registers(
          Seq(("2024-01-01 05:00:00", "a", 101L), ("2024-01-01 05:00:00", "a", 102L),
            ("2024-01-01 05:00:00", "b", 103L), ("2024-01-01 05:10:00", "a", 104L),
            ("2024-01-01 05:00:00", "a", 105L))
            .toDF("w", "grp", "uid").select(to_timestamp($"w").as("ws"), $"grp", $"uid"),
          Seq("ws", "grp"), "uid", lgK = 6)
        .orderBy($"ws", $"grp", $"reg")
        .as[(Timestamp, String, Int, Int)].collect()
      assert(streamed.nonEmpty && streamed.sameElements(batch))
    } finally query.stop()
  }

  test("windowedGrid in append mode emits closed-window grids equal to batch CountMin.build") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamSketch.windowedGrid(
        input.toDF(), "ts", "10 minutes", "5 minutes", Seq("grp"), "uid",
        depth = 3, width = 16)
      .select(col("window.start").as("ws"), col("grp"), col("r"), col("c"), col("cnt"))
      .writeStream.format("memory").queryName("sk_grid").outputMode("append").start()
    try {
      input.addData(
        Ev(ts("2024-01-01 05:03:00"), "a", 7), Ev(ts("2024-01-01 05:04:00"), "a", 7),
        Ev(ts("2024-01-01 05:06:00"), "a", 9), Ev(ts("2024-01-01 05:07:00"), "b", 7))
      query.processAllAvailable()
      // advance the watermark far enough to close the 05:00 window
      input.addData(Ev(ts("2024-01-01 05:31:00"), "a", 12))
      query.processAllAvailable()
      val streamed = spark.table("sk_grid")
        .orderBy($"ws", $"grp", $"r", $"c")
        .as[(Timestamp, String, Int, Long, Long)].collect()
      // batch build per (window, grp) slice on the same rows
      def batchFor(grp: String, uids: Seq[Long]) =
        CountMin.build(uids.toDF("uid"), "uid", depth = 3, width = 16)
          .select(lit(ts("2024-01-01 05:00:00")).as("ws"), lit(grp).as("grp"),
            $"r", $"c", $"cnt")
      val batch = batchFor("a", Seq(7L, 7L, 9L)).unionByName(batchFor("b", Seq(7L)))
        .orderBy($"ws", $"grp", $"r", $"c")
        .as[(Timestamp, String, Int, Long, Long)].collect()
      assert(streamed.nonEmpty && streamed.sameElements(batch))
      // the still-open 05:30 window must not have emitted in append mode
      assert(!streamed.exists(_._1 == ts("2024-01-01 05:30:00")))
      // downstream contract: the streamed frames sum-merge into a grid
      // whose estimates never undershoot the true window frequencies
      val cells = spark.table("sk_grid").where($"grp" === "a")
        .groupBy($"r", $"c").agg(sum($"cnt").as("cnt"))
      val est = CountMin.estimate(cells, Seq(7L, 9L).toDF("uid"), "uid",
          depth = 3, width = 16)
        .as[(Long, Long)].collect().toMap
      assert(est(7L) >= 2L && est(9L) >= 1L)
    } finally query.stop()
  }

  test("windowedBins in append mode emits closed windows equal to the batch build") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamSketch.windowedBins(
        input.toDF(), "ts", "10 minutes", "5 minutes", Seq("grp"), "uid", subBits = 3)
      .select(col("window.start").as("ws"), col("grp"), col("bin"), col("cnt"))
      .writeStream.format("memory").queryName("sk_bins").outputMode("append").start()
    try {
      input.addData(
        Ev(ts("2024-01-01 05:03:00"), "a", 7), Ev(ts("2024-01-01 05:04:00"), "a", 9),
        Ev(ts("2024-01-01 05:06:00"), "b", 1000))
      query.processAllAvailable()
      // advance the watermark far enough to close the 05:00 window
      input.addData(Ev(ts("2024-01-01 05:31:00"), "a", 12))
      query.processAllAvailable()
      val streamed = spark.table("sk_bins")
        .orderBy($"ws", $"grp", $"bin").as[(Timestamp, String, Long, Long)].collect()
      val batch = QuantileSketch.build(
          Seq(("a", 7L), ("a", 9L), ("b", 1000L)).toDF("grp", "uid"),
          Seq("grp"), "uid", subBits = 3)
        .select(lit(ts("2024-01-01 05:00:00")).as("ws"), $"grp", $"bin", $"cnt")
        .orderBy($"ws", $"grp", $"bin").as[(Timestamp, String, Long, Long)].collect()
      assert(streamed.nonEmpty && streamed.sameElements(batch))
      // the still-open 05:30 window must not have emitted in append mode
      assert(!streamed.exists(_._1 == ts("2024-01-01 05:30:00")))
    } finally query.stop()
  }
}
