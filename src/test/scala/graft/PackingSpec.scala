package graft

import graft.ops.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packByBudget cuts the running total at budget boundaries per partition") {
    val df = Seq(
      // shard a: weights 600, 600, 600, 600 -> cum_before 0,600,1200,1800
      ("a", 1L, 600L), ("a", 2L, 600L), ("a", 3L, 600L), ("a", 4L, 600L),
      // shard b restarts at bin 0
      ("b", 1L, 100L), ("b", 2L, 100L)
    ).toDF("shard", "id", "w")
    val out = Packing.packByBudget(df, "id", "w", 1000L, Seq("shard"))
      .select($"shard", $"id", $"bin", $"bin_offset")
      .as[(String, Long, Long, Long)].collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("a", 1L)) == ((0L, 0L)))
    assert(out(("a", 2L)) == ((0L, 600L)))
    assert(out(("a", 3L)) == ((1L, 200L)))   // cum_before 1200
    assert(out(("a", 4L)) == ((1L, 800L)))   // cum_before 1800
    assert(out(("b", 1L)) == ((0L, 0L)))     // bins restart per shard
    assert(out(("b", 2L)) == ((0L, 100L)))
  }

  test("an oversized row occupies its starting bin; followers continue after it") {
    val df = Seq(("a", 1L, 5000L), ("a", 2L, 10L)).toDF("shard", "id", "w")
    val out = Packing.packByBudget(df, "id", "w", 1000L, Seq("shard"))
      .select($"id", $"bin", $"bin_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((5L, 0L)))  // cum_before 5000 -> bin 5
  }

  test("unpartitioned pack is rejected (would serialize through one task)") {
    val df = Seq(("a", 1L, 1L)).toDF("shard", "id", "w")
    intercept[IllegalArgumentException] {
      Packing.packByBudget(df, "id", "w", 1000L, Seq.empty)
    }
  }

  private def allMessages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("negative weights fail loudly (truncating div would walk bins backwards)") {
    val df = Seq(("a", 1L, 100L), ("a", 2L, -5L)).toDF("shard", "id", "w")
    val e = intercept[Throwable] {
      Packing.packByBudget(df, "id", "w", 1000L, Seq("shard")).collect()
    }
    assert(allMessages(e).contains("negative w"), allMessages(e))
  }

  test("duplicate orderCol values fail loudly (running sum would be merge-order-dependent)") {
    val df = Seq(("a", 1L, 100L), ("a", 1L, 200L)).toDF("shard", "id", "w")
    val e = intercept[Throwable] {
      Packing.packByBudget(df, "id", "w", 1000L, Seq("shard")).collect()
    }
    assert(allMessages(e).contains("duplicate id"), allMessages(e))
  }

  test("null orderCol values fail loudly (no position in a total order)") {
    val df = Seq(("a", Option.empty[Long], 100L), ("a", Some(2L), 200L))
      .toDF("shard", "id", "w")
    val e = intercept[Throwable] {
      Packing.packByBudget(df, "id", "w", 1000L, Seq("shard")).collect()
    }
    assert(allMessages(e).contains("null id"), allMessages(e))
  }
}
