package graft

import graft.ops.Ids
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class IdsSpec extends SparkSpec {
  import spark.implicits._

  // skewed order column (sqrt compresses high ids into repeated
  // values) so bucket boundaries land inside tie runs
  private def df = (1L to 4000L).map(i => (i, math.sqrt(i.toDouble).toLong))
    .toDF("id", "v")

  test("globalRowNumber equals the single-window row_number") {
    val got = Ids.globalRowNumber(df, "v", Seq("id"), buckets = 16)
    val want = df.withColumn("row_id",
      row_number().over(Window.orderBy($"v", $"id")).cast("long"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("no global window: every Window in the plan is partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = Ids.globalRowNumber(df, "v", Seq("id"), buckets = 16)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"single-partition window leaked:\n$plan")
  }

  test("row ids are contiguous 1..N and unique") {
    val ids = Ids.globalRowNumber(df, "v", Seq("id"), buckets = 8)
      .select($"row_id").as[Long].collect().sorted
    assert(ids.head == 1L && ids.last == 4000L && ids.distinct.length == 4000)
  }

  test("deterministic across invocations and bucket counts") {
    val a = Ids.globalRowNumber(df, "v", Seq("id"), buckets = 4)
    val b = Ids.globalRowNumber(df, "v", Seq("id"), buckets = 64)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("globalNtile matches Spark's ntile, including ragged tiles") {
    // 4000 % 7 != 0 -> first (4000 % 7) tiles are one row longer
    val got = Ids.globalNtile(df, "v", Seq("id"), n = 7, buckets = 16)
      .select($"id", $"tile")
    val want = df.withColumn("tile", ntile(7).over(Window.orderBy($"v", $"id")))
      .select($"id", $"tile")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("more tiles than rows degrades to tile = row number") {
    val tiny = Seq((1L, 10L), (2L, 5L)).toDF("id", "v")
    val got = Ids.globalNtile(tiny, "v", Seq("id"), n = 5, buckets = 4)
      .select($"id", $"tile").as[(Long, Int)].collect().toMap
    assert(got == Map(2L -> 1, 1L -> 2))
  }

  test("rejects an order without tie-breaks") {
    intercept[IllegalArgumentException] {
      Ids.globalRowNumber(df, "v", Seq.empty)
    }
  }

  test("NULL order value fails with a descriptive contract error") {
    val withNull = df.withColumn("v",
      when($"id" === 7L, lit(null).cast("long")).otherwise($"v"))
    val e = intercept[IllegalArgumentException] {
      Ids.globalRowNumber(withNull, "v", Seq("id"), buckets = 8)
    }
    assert(e.getMessage.contains("contains NULL") && e.getMessage.contains("'v'"))
  }
}
