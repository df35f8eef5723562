package graft

import java.nio.file.{Files, Path, StandardOpenOption}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.v2.{PagedMicroBatchStream, PagedStreamOffset}

/** Micro-batch ingest of a paged landing zone: manifest line-count
  * offsets, incremental pickup of newly landed pages, exactly-once
  * across checkpointed restarts, and the append-only manifest
  * contract failing loud on truncation. */
class PagedStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType)))

  private def landPage(dir: Path, name: String, rows: Seq[(Long, String)]): Unit = {
    val page = dir.resolve(name)
    val body = rows.map { case (k, c) => s"""{"k": $k, "cat": "$c"}""" }.mkString("", "\n", "\n")
    Files.write(page, body.getBytes)
    val line = s"""{"path": "${page.toString}", "rows": ${rows.length}, """ +
      s""""key_min": ${rows.map(_._1).min}, "key_max": ${rows.map(_._1).max}}""" + "\n"
    Files.write(dir.resolve("manifest.json"), line.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def streamDf(dir: Path) = spark.readStream.format("graft-pages")
    .schema(schema).option("manifest", dir.toString).option("keyCol", "k").load()

  test("stream picks up newly landed pages incrementally, exactly once across restart") {
    val dir = Files.createTempDirectory("graft-paged-stream")
    val cp = Files.createTempDirectory("graft-paged-stream-cp").toString
    val out = Files.createTempDirectory("graft-paged-stream-out").toString
    landPage(dir, "p0.json", Seq((1L, "a"), (2L, "a")))
    landPage(dir, "p1.json", Seq((10L, "b")))

    def sunk(): Seq[Long] =
      spark.read.schema(schema).parquet(out).collect().map(_.getLong(0)).sorted.toSeq

    // parquet sink: the one memory can't do — recover from checkpoint
    val q1 = streamDf(dir).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp).start()
    q1.processAllAvailable()
    assert(sunk() == Seq(1L, 2L, 10L))

    // fetcher lands another page while the stream is running
    landPage(dir, "p2.json", Seq((20L, "c"), (21L, "c")))
    q1.processAllAvailable()
    assert(sunk() == Seq(1L, 2L, 10L, 20L, 21L))
    q1.stop()

    // restart from the same checkpoint: committed pages are not
    // replayed, only the page landed while the stream was down
    landPage(dir, "p3.json", Seq((30L, "d")))
    val q2 = streamDf(dir).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp).start()
    q2.processAllAvailable()
    q2.stop()
    assert(sunk() == Seq(1L, 2L, 10L, 20L, 21L, 30L),
      "a restarted stream must append exactly the new page, no replays")
  }

  test("Trigger.AvailableNow drains the landed pages and stops") {
    val dir = Files.createTempDirectory("graft-paged-an")
    val cp = Files.createTempDirectory("graft-paged-an-cp").toString
    landPage(dir, "p0.json", Seq((1L, "a")))
    landPage(dir, "p1.json", Seq((2L, "b")))
    val q = streamDf(dir).writeStream.format("memory").queryName("paged_an")
      .option("checkpointLocation", cp).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
    assert(spark.table("paged_an").count() == 2)
  }

  test("subscribing before the first page lands yields an empty stream, then data") {
    val dir = Files.createTempDirectory("graft-paged-empty")
    val cp = Files.createTempDirectory("graft-paged-empty-cp").toString
    val q = streamDf(dir).writeStream.format("memory").queryName("paged_e")
      .option("checkpointLocation", cp).start()
    q.processAllAvailable()
    assert(spark.table("paged_e").count() == 0)
    landPage(dir, "p0.json", Seq((5L, "x")))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("paged_e").count() == 1)
  }

  test("a truncated manifest fails loud instead of replaying wrong data") {
    val dir = Files.createTempDirectory("graft-paged-trunc")
    landPage(dir, "p0.json", Seq((1L, "a")))
    val stream = new PagedMicroBatchStream(dir.toString, schema, Array.empty, Some("k"))
    val e = intercept[IllegalArgumentException] {
      stream.planInputPartitions(PagedStreamOffset(0L), PagedStreamOffset(5L))
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }
}
