package graft

import graft.ops.{Chunking, Sampling}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The row-local curation operators (hash split, score sampling,
  * chunking) are pure projections/filters/generators — they must run
  * UNCHANGED on a stream, so a streaming ingest can curate in-flight
  * with the exact same semantics (and therefore the same membership)
  * as the batch pass. This spec pins that contract: each operator is
  * applied to a MemoryStream and its output equals the batch result
  * on the same rows.
  */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._
  import StreamCurationSpec.InDoc

  private def ts(s: String) = Timestamp.valueOf(s)

  private def docs = Seq(
    InDoc(1, ts("2024-01-01 05:00:00"), "alpha beta gamma delta", 0.9),
    InDoc(2, ts("2024-01-01 05:01:00"), "one two three", 0.1),
    InDoc(3, ts("2024-01-01 05:02:00"), "red orange yellow green blue", 0.7),
    InDoc(4, ts("2024-01-01 05:03:00"), "tiny", 0.5),
    InDoc(5, ts("2024-01-01 05:04:00"), "the quick brown fox jumps over", 0.3)
  )

  test("assignSplit, sampleByScore, and chunkByTokens run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[InDoc]
    // the same composition a batch curation pass would use
    val curated = Chunking.chunkByTokens(
      Sampling.sampleByScore(
        Sampling.assignSplit(input.toDF(), "doc_id"),
        "doc_id", "q"),
      "text", "doc_id", maxTokens = 3, overlap = 1)
    val query = curated.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      val streamed = spark.table("curated")
        .select($"doc_id", $"chunk_idx", $"chunk_text").collect().toSet
      val batch = Chunking.chunkByTokens(
        Sampling.sampleByScore(
          Sampling.assignSplit(docs.toDF(), "doc_id"),
          "doc_id", "q"),
        "text", "doc_id", maxTokens = 3, overlap = 1)
        .select($"doc_id", $"chunk_idx", $"chunk_text").collect().toSet
      assert(streamed == batch, "stream and batch curation must agree row-for-row")
      assert(batch.nonEmpty, "fixture too strict — nothing survived")
    } finally query.stop()
  }

  test("gopher repetitionSignals and qualityRules run unchanged on a stream (row-local)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[InDoc]
    val combined = input.toDF().select(col("doc_id"), col("text"))
    val streamedDf = graft.ops.Gopher.repetitionSignals(combined, "text", lineSep = " ")
    val query = streamedDf.writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      val streamed = spark.table("gopher_stream").collect().toSet
      val batch = graft.ops.Gopher.repetitionSignals(
        docs.toDF().select(col("doc_id"), col("text")), "text", lineSep = " ")
        .collect().toSet
      assert(streamed == batch, "stream and batch gopher signals must agree row-for-row")
    } finally query.stop()
    val query2 = graft.ops.Gopher.qualityRules(input.toDF(), "text", minWords = 3)
      .writeStream.format("memory").queryName("gopher_rules_stream")
      .outputMode("append").start()
    try {
      query2.processAllAvailable()
      val streamed2 = spark.table("gopher_rules_stream").collect().toSet
      val batch2 = graft.ops.Gopher.qualityRules(docs.toDF(), "text", minWords = 3)
        .collect().toSet
      assert(streamed2 == batch2, "stream and batch gopher rules must agree row-for-row")
    } finally query2.stop()
  }

  test("repeatByWeight is streaming-legal too (generator, no state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[InDoc]
    val out = Sampling.repeatByWeight(
      input.toDF().withColumn("w", $"q" * 2.0), "doc_id", "w")
    val query = out.writeStream.format("memory").queryName("repeated")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      val streamed = spark.table("repeated")
        .select($"doc_id", $"copy_idx").collect().toSet
      val batch = Sampling.repeatByWeight(
        docs.toDF().withColumn("w", $"q" * 2.0), "doc_id", "w")
        .select($"doc_id", $"copy_idx").collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally query.stop()
  }
}

object StreamCurationSpec {
  case class InDoc(doc_id: Long, ts: java.sql.Timestamp, text: String, q: Double)
}
