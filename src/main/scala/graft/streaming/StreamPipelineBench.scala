package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Incremental

/** Shared driver for the end-to-end streaming-throughput measurement
  * (r13 verdict item #8 — streaming was the one surface with zero
  * perf numbers): the full production chain StreamPipelineSpec
  * proves CORRECT, driven at data scale and instrumented per trigger:
  *
  *   paged landing zone (graft-pages micro-batch DSv2 source)
  *     → StreamDedup.dedupedIngest   (intra-batch + vs-index near-dup
  *        gate; idempotent partition writes to the clean corpus)
  *     → file stream over the clean corpus
  *     → StreamingRecap.hourlyWindowed (event-time windows, watermark)
  *     → StreamSnapshot.sink          (exactly-once tagged versions)
  *
  * One landed page = one ingest trigger = one gold trigger (the
  * page is landed, then each query drains via processAllAvailable —
  * the micro-batch cadence under test, not wall-clock scheduling).
  * Event times ADVANCE across pages (each page covers the next slice
  * of a multi-hour span), so the watermark closes old windows as the
  * run proceeds — streaming state must stay bounded by the windows
  * in the watermark horizon × locations, NOT grow with total rows
  * ingested. That bound is what StreamThroughputSpec asserts across
  * ≥3 triggers at two volumes, and what the per-trigger state
  * columns in the published table demonstrate at bench volume.
  *
  * Corpus shape: ~10% of rows are exact near-dup plants (doc i
  * copies doc i−1's text when i % 10 == 9) so the dedup gate does
  * real work; all other texts are shingle-disjoint by construction
  * (tokens embed the doc id).
  */
object StreamPipelineBench {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("location_id", LongType), StructField("ts_epoch", LongType),
    StructField("temp_c", DoubleType), StructField("precip_mm", DoubleType)))

  /** Per-trigger measurements; state rows/bytes are the gold query's
    * window-aggregation state operator after the trigger. */
  final case class Trigger(page: Int, rows: Int, ingestSec: Double,
                           goldSec: Double, stateRows: Long, stateBytes: Long)

  final case class Result(volume: Int, pages: Int, locations: Int,
                          spanHours: Int, triggers: Seq[Trigger],
                          cleanRows: Long, snapshotVersions: Long,
                          totalSec: Double) {
    def rowsPerSec: Double = if (totalSec > 0) volume / totalSec else -1.0
  }

  private def docText(id: Long): String =
    // 12 tokens, each embedding the doc id → shingle sets are
    // globally disjoint across distinct docs (no accidental near-dups
    // muddying the measured drop rate)
    (0 until 12).map(j => s"w${id}x$j").mkString(" ")

  /** Deterministic page body: rows [lo, hi) of the volume, event
    * times advancing linearly across the whole span. */
  private def landPage(dir: Path, page: Int, lo: Long, hi: Long,
                       volume: Int, locations: Int, spanHours: Int,
                       baseEpoch: Long): Int = {
    val sb = new StringBuilder(((hi - lo) * 96).toInt)
    var id = lo
    while (id < hi) {
      val text = if (id % 10 == 9 && id > lo) docText(id - 1) else docText(id)
      val ts = baseEpoch + id * (spanHours * 3600L) / volume
      val loc = id % locations
      // integer-cent doubles keep the recap arithmetic exact
      val temp = (id % 400) / 10.0
      val precip = (id % 7) / 10.0
      sb.append(s"""{"doc_id": $id, "text": "$text", "location_id": $loc, """)
        .append(s""""ts_epoch": $ts, "temp_c": $temp, "precip_mm": $precip}""")
        .append('\n')
      id += 1
    }
    val pageFile = dir.resolve(f"page$page%04d.json")
    Files.write(pageFile, sb.toString.getBytes("UTF-8"))
    val manifest = s"""{"path": "${pageFile.toString}", "rows": ${hi - lo}, """ +
      s""""key_min": $lo, "key_max": ${hi - 1}}""" + "\n"
    Files.write(dir.resolve("manifest.json"), manifest.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    (hi - lo).toInt
  }

  /** Run the full chain at one volume. Pages are landed one at a
    * time; both queries drain after each landing, so trigger i's
    * numbers measure page i's micro-batch. */
  def run(spark: SparkSession, volume: Int, pages: Int, locations: Int,
          spanHours: Int, root: String): Result = {
    require(pages >= 3, s"need >=3 triggers for a cadence claim, got $pages")
    val land = Paths.get(root, "land")
    Files.createDirectories(land)
    val (idx, clean, table) = (s"$root/index", s"$root/clean", s"$root/gold")
    Files.createDirectories(Paths.get(clean))
    locally {
      import spark.implicits._
      Incremental.writeIndex(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", 3, idx)
    }
    val baseEpoch = 1704067200L // 2024-01-01 00:00:00 UTC

    val ingest = StreamDedup.dedupedIngest(
      spark.readStream.format("graft-pages").schema(schema)
        .option("manifest", land.toString).option("keyCol", "doc_id").load(),
      "text", 3, 0.5, idx, clean, Some(s"$root/cp-ingest"))
    val gold = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(clean)
      .withColumn("ts", timestamp_seconds(col("ts_epoch")))
      .transform(df => StreamingRecap.hourlyWindowed(df, watermark = "2 hours"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/cp-gold")
      .foreachBatch(StreamSnapshot.sink(table))
      .start()

    val t00 = System.nanoTime()
    val triggers = (0 until pages).map { p =>
      val lo = volume.toLong * p / pages
      val hi = volume.toLong * (p + 1) / pages
      val n = landPage(land, p, lo, hi, volume, locations, spanHours, baseEpoch)
      val t0 = System.nanoTime()
      ingest.processAllAvailable()
      val tIngest = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      gold.processAllAvailable()
      val tGold = (System.nanoTime() - t1) / 1e9
      val state = Option(gold.lastProgress)
        .map(_.stateOperators.toSeq).getOrElse(Seq.empty)
      Trigger(p, n, tIngest, tGold,
        state.map(_.numRowsTotal).sum, state.map(_.memoryUsedBytes).sum)
    }
    val totalSec = (System.nanoTime() - t00) / 1e9
    ingest.stop(); gold.stop()

    val cleanRows = spark.read.schema(schema)
      .option("recursiveFileLookup", "true").parquet(clean).count()
    val versions = graft.sources.Snapshots.currentVersion(table)
    Result(volume, pages, locations, spanHours, triggers, cleanRows,
      versions, totalSec)
  }
}
