package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-sink").toString

  test("append accumulates batches") {
    val path = tmp()
    val b1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0)).toDF("id", "d", "v")
    val b2 = Seq((3L, "2024-01-02", 30.0)).toDF("id", "d", "v")
    Sinks.append(b1, path, Seq("d"))
    Sinks.append(b2, path, Seq("d"))
    assert(spark.read.parquet(path).count() == 3)
  }

  test("upsertPartitions replaces only incoming partitions (S7 upsert semantics)") {
    val path = tmp()
    val day1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0)).toDF("id", "d", "v")
    Sinks.upsertPartitions(day1, path, Seq("d"))
    // re-run day 2 with corrected value — day 1 must survive untouched
    val day2fix = Seq((2L, "2024-01-02", 99.0)).toDF("id", "d", "v")
    Sinks.upsertPartitions(day2fix, path, Seq("d"))
    // note: the partition column comes back type-inferred as DATE
    val out = spark.read.parquet(path).collect()
      .map(r => r.getAs[Any]("d").toString -> r.getAs[Double]("v")).toMap
    assert(out("2024-01-01") == 10.0)
    assert(out("2024-01-02") == 99.0)
    assert(spark.read.parquet(path).count() == 2)
  }

  test("upsert is idempotent (re-running the same batch changes nothing)") {
    val path = tmp()
    val batch = Seq((1L, "2024-01-01", 10.0)).toDF("id", "d", "v")
    Sinks.upsertPartitions(batch, path, Seq("d"))
    Sinks.upsertPartitions(batch, path, Seq("d"))
    assert(spark.read.parquet(path).count() == 1)
  }

  test("enforceUnique + truncateReload") {
    val path = tmp()
    val df = Seq((1L, "k1", 1.0), (2L, "k1", 2.0), (3L, "k2", 3.0)).toDF("id", "k", "v")
    val unique = Sinks.enforceUnique(df, Seq("k"), "id")
    Sinks.truncateReload(unique, path)
    val out = spark.read.parquet(path).collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("id")).toMap
    assert(out == Map("k1" -> 1L, "k2" -> 3L))
  }

  test("writeRangeClustered: files carry disjoint ranges and a range scan prunes files") {
    val path = tmp()
    // shuffled input: without range clustering every file would span
    // the whole ts domain and nothing could be skipped
    val df = spark.range(10000).select(
      $"id",
      (($"id" * 2654435761L) % 10000).as("ts_val"))
    Sinks.writeRangeClustered(df, path, "ts_val", nFiles = 8)

    // per-file [min,max] envelopes must be pairwise disjoint
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 4, s"expected several files, got ${files.length}")
    val envelopes = files.map { f =>
      val r = spark.read.parquet(f).agg(min($"ts_val"), max($"ts_val")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    envelopes.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: ${envelopes.toSeq}")
      case _                        =>
    }

    // a narrow range filter must touch ~1 file's worth of data: the
    // scan's "number of files read" metric is the skip evidence
    val q = spark.read.parquet(path).where($"ts_val" >= 100 && $"ts_val" < 200)
    assert(q.count() == 100)
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val filesRead = scan.metrics.get("numFiles").map(_.value)
    assert(filesRead.exists(_ <= 2), s"expected <=2 files read, got $filesRead")
  }
}
