package graft

import graft.ops.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, "a", 10, true), (2L, "a", 50, true), (3L, "a", 50, false),
    (4L, "b", 80, true), (5L, "b", 5, false)
  ).toDF("id", "g", "score", "flag")

  test("counts are cumulative: each stage is the AND-prefix, monotone non-increasing") {
    val out = Funnel.counts(rows,
      Seq("scored" -> ($"score" >= 40), "flagged" -> $"flag"), Seq("g"))
      .orderBy($"g")
      .as[(String, Long, Long, Long)].collect()
    // g=a: raw 3, score>=40: 2 (ids 2,3), +flag: 1 (id 2)
    assert(out(0) == (("a", 3L, 2L, 1L)))
    // g=b: raw 2, score>=40: 1 (id 4), +flag: 1
    assert(out(1) == (("b", 2L, 1L, 1L)))
  }

  test("a stage passing rows a LATER stage would re-admit still narrows (order matters)") {
    // flag first, then score: id 3 (flag=false) is gone before scoring
    val out = Funnel.counts(rows,
      Seq("flagged" -> $"flag", "scored" -> ($"score" >= 40)), Seq("g"))
      .orderBy($"g").as[(String, Long, Long, Long)].collect()
    assert(out(0) == (("a", 3L, 2L, 1L))) // flagged: ids 1,2 -> scored: id 2
  }

  test("NULL predicate results fail the stage instead of poisoning the count") {
    val df = Seq((1L, Some(10)), (2L, None), (3L, Some(90))).toDF("id", "score")
    val out = Funnel.counts(df, Seq("scored" -> ($"score" >= 40)))
      .as[(Long, Long)].head()
    assert(out == ((3L, 1L)))
  }

  test("ungrouped funnel returns one global row; duplicate stage names rejected") {
    val out = Funnel.counts(rows, Seq("flagged" -> $"flag"))
    assert(out.count() == 1L)
    intercept[IllegalArgumentException] {
      Funnel.counts(rows, Seq("s" -> $"flag", "s" -> $"flag"))
    }
    // 'raw' would collide with the built-in n_raw column
    intercept[IllegalArgumentException] {
      Funnel.counts(rows, Seq("raw" -> $"flag"))
    }
  }

  test("single scan: exactly one aggregate, no join, no extra exchange") {
    val plan = Funnel.counts(rows,
      Seq("scored" -> ($"score" >= 40), "flagged" -> $"flag"), Seq("g"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan)
    val aggregates = plan.linesIterator.count(_.trim.startsWith("Aggregate"))
    assert(aggregates == 1, s"expected one logical Aggregate:\n$plan")
  }
}
