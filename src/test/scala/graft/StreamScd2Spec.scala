package graft

import graft.streaming.StreamScd2
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamScd2Spec extends SparkSpec {
  import spark.implicits._
  import StreamScd2Spec.Upd

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streamed micro-batches build the same versioned dimension as sequential batch Scd2") {
    implicit val sqlCtx = spark.sqlContext
    val statePath = Files.createTempDirectory("graft-scd2").toString + "/dim"
    StreamScd2.bootstrap(
      Seq((1L, "bronze", ts("2024-01-01 00:00:00")),
        (2L, "silver", ts("2024-01-01 00:00:00"))).toDF("user_id", "tier", "since"),
      statePath, "user_id", Seq("tier"), "since")

    val input = MemoryStream[Upd]
    val query = StreamScd2.maintain(input.toDF(), statePath,
      "user_id", Seq("tier"), "ts", "update_id").start()
    try {
      input.addData(Upd(1, "silver", ts("2024-02-01 00:00:00"), 1))
      query.processAllAvailable()
      input.addData(
        Upd(1, "gold", ts("2024-03-01 00:00:00"), 1), // second change for 1
        Upd(9, "bronze", ts("2024-03-02 00:00:00"), 1)) // new key
      query.processAllAvailable()
    } finally query.stop()

    val out = StreamScd2.current(spark, statePath)
      .orderBy($"user_id", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00")), false),
      (1L, "silver", ts("2024-02-01 00:00:00"), Some(ts("2024-03-01 00:00:00")), false),
      (1L, "gold", ts("2024-03-01 00:00:00"), None, true),
      (2L, "silver", ts("2024-01-01 00:00:00"), None, true),
      (9L, "bronze", ts("2024-03-02 00:00:00"), None, true)))

    // generations 0 (bootstrap), 1, 2 exist — time travel until pruned
    val gen1 = spark.read.parquet(s"$statePath/gen=1")
      .where($"user_id" === 1L && $"is_current").select($"tier").as[String].collect()
    assert(gen1.toSeq == Seq("silver"), "generation 1 preserves the intermediate state")

    StreamScd2.prune(spark, statePath, keep = 1)
    val left = new java.io.File(statePath).listFiles().filter(_.getName.startsWith("gen="))
    assert(left.map(_.getName).toSeq == Seq("gen=2"))
    // current still resolves after pruning
    assert(StreamScd2.current(spark, statePath).count() == 5)
  }

  test("current before bootstrap fails loudly") {
    val statePath = Files.createTempDirectory("graft-scd2-empty").toString + "/dim"
    val err = intercept[IllegalArgumentException] {
      StreamScd2.current(spark, statePath)
    }
    assert(err.getMessage.contains("bootstrap"))
  }
}

object StreamScd2Spec {
  case class Upd(user_id: Long, tier: String, ts: Timestamp, update_id: Long)
}
