package graft

import graft.operators.Incremental
import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

object StreamDedupSpec {
  case class Doc(doc_id: Long, text: String)
}

/** The streaming dedup ingest loop: each micro-batch self-dedups,
  * probes the persisted index, and admits only novel content —
  * which the NEXT batch is then deduped against. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamDedupSpec.Doc

  private val a = "the quick brown fox jumps over the lazy dog in the park today"
  private val aDup = "the quick brown fox jumps over the lazy cat in the park today"
  private val b = "spark catalyst plans declarative queries into physical operator trees"
  private val c = "weather in bandung is rainy with moderate temperatures all week long"

  test("intra-batch and cross-batch near-dups are dropped; novel docs accumulate") {
    val root = Files.createTempDirectory("graft-sdedup").toString
    val idx = s"$root/index"
    val out = s"$root/clean"
    Incremental.writeIndex(Seq.empty[Doc].toDF("doc_id", "text"), "text", 3, idx)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = StreamDedup.dedupedIngest(input.toDF(), "text", 3, 0.5, idx, out)
    try {
      // batch 0: A and its near-dup (intra-batch: min id wins), plus B
      input.addData(Doc(1, a), Doc(2, aDup), Doc(3, b))
      query.processAllAvailable()
      val after0 = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
      assert(after0 == Set(1L, 3L), after0)

      // batch 1: another copy of A (cross-batch, against the index) and novel C
      input.addData(Doc(4, a), Doc(5, c))
      query.processAllAvailable()
      val after1 = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
      assert(after1 == Set(1L, 3L, 5L), after1)

      // batch 2: near-dup of C — dropped against content admitted ONE tick ago
      input.addData(Doc(6, c))
      query.processAllAvailable()
      val after2 = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
      assert(after2 == Set(1L, 3L, 5L), after2)
    } finally query.stop()
  }
}
