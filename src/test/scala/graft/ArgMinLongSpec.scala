package graft

import graft.plans.ArgMinLong.argMinLong
import org.apache.spark.sql.functions._

class ArgMinLongSpec extends SparkSpec {
  import spark.implicits._

  test("equals min(struct(ord, value)) on a dense random-ish frame") {
    // deterministic pseudo-random (hash-derived) groups/ords/values,
    // dense enough that ties on ord occur within groups
    val df = spark.range(5000).selectExpr(
      "id % 97 as g",
      "pmod(hash(id, 1), 11) as ord",
      "pmod(hash(id, 2), 1000) as v")
      .selectExpr("g", "cast(ord as long) as ord", "cast(v as long) as v")
    val got = df.groupBy($"g").agg(argMinLong($"ord", $"v").as("m"))
      .as[(Long, Long)].collect().toMap
    val want = df.groupBy($"g").agg(min(struct($"ord", $"v")).as("m"))
      .select($"g", $"m.v")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("ties on ord pick the smallest value") {
    val df = Seq((1L, 5L, 30L), (1L, 5L, 10L), (1L, 5L, 20L), (1L, 7L, 1L))
      .toDF("g", "ord", "v")
    val got = df.groupBy($"g").agg(argMinLong($"ord", $"v").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L))
  }

  test("null ord or value rows are ignored; all-null group yields null") {
    val df = Seq(
      (1L, Some(9L), Some(4L)), (1L, None, Some(1L)), (1L, Some(2L), None),
      (2L, Option.empty[Long], Option.empty[Long]))
      .toDF("g", "ord", "v")
    val got = df.groupBy($"g").agg(argMinLong($"ord", $"v").as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(1L -> Some(4L), 2L -> None))
  }

  test("plans as HashAggregate, not ObjectHashAggregate (the point)") {
    val df = spark.range(100).selectExpr("id % 7 as g", "id as ord", "id * 3 as v")
    val plan = df.groupBy($"g").agg(argMinLong($"ord", $"v").as("m"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }

  test("partitioning-invariant (order-independent merge)") {
    val df = spark.range(2000).selectExpr(
      "id % 13 as g", "pmod(hash(id, 3), 5) as ord", "id as v")
      .selectExpr("g", "cast(ord as long) as ord", "v")
    val a = df.repartition(1).groupBy($"g").agg(argMinLong($"ord", $"v").as("m"))
      .as[(Long, Long)].collect().toSet
    val b = df.repartition(17).groupBy($"g").agg(argMinLong($"ord", $"v").as("m"))
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
