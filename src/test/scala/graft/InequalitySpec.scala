package graft

import graft.ops.Inequality
import org.apache.spark.sql.functions._

class InequalitySpec extends SparkSpec {
  import spark.implicits._

  test("gini: hand values, equality zero, near-monopoly (n-1)/n") {
    val g1 = Inequality.gini(Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
        .toDF("tie", "v"), "v", "tie")
      .as[(Long, Long, Option[Long])].head()
    assert(g1 == ((4L, 10L, Some(250000000L))))
    val eq = Inequality.gini(Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("tie", "v"), "v", "tie")
      .as[(Long, Long, Option[Long])].head()
    assert(eq._3 == Some(0L))
    val mono = Inequality.gini(Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 10L))
        .toDF("tie", "v"), "v", "tie")
      .as[(Long, Long, Option[Long])].head()
    assert(mono._3 == Some(750000000L))
  }

  test("gini: all-zero totals yield NULL; negatives raise") {
    val z = Inequality.gini(Seq((1L, 0L), (2L, 0L)).toDF("tie", "v"), "v", "tie")
      .as[(Long, Long, Option[Long])].head()
    assert(z._3.isEmpty)
    intercept[Exception] {
      Inequality.gini(Seq((1L, -5L)).toDF("tie", "v"), "v", "tie").collect()
    }
  }

  test("hhi: equal split 1/k, monopoly 1, group independence") {
    val df = Seq(("g1", 1L, 5L), ("g1", 2L, 5L), ("g1", 3L, 5L), ("g1", 4L, 5L),
      ("g2", 9L, 7L)).toDF("g", "m", "v")
    val got = Inequality.hhi(df, "g", "m", "v")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("g1") == (("g1", 4L, 20L, 4L * 62500000L))) // 4 * (1/4)^2
    assert(got("g2") == (("g2", 1L, 7L, 1000000000L)))
  }
}
