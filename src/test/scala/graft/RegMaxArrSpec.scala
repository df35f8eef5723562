package graft

import org.apache.spark.sql.functions._

/** Pins the r14 RegMax rewrite (udaf(Aggregator) →
  * TypedImperativeAggregate reading unsafe arrays in place): the
  * aggregate HyperBall's absorb rounds rest on must keep EXACTLY the
  * old semantics — element-wise max, NULL rows ignored, empty array
  * as the zero, loud mixed-length failure — and be partitioning-
  * independent, or the q_hyperball/q_harmonic cross-engine oracles
  * break silently. */
class RegMaxArrSpec extends SparkSpec {

  import spark.implicits._

  test("element-wise max over groups, NULL rows ignored, empty zero") {
    val df = Seq(
      (1L, Some(Seq(1, 5, 0))),
      (1L, Some(Seq(3, 2, 0))),
      (1L, None),
      (2L, Some(Seq(7, 0, 9))),
      (3L, None)
    ).toDF("id", "regs")
      .select(col("id"), col("regs").cast("array<int>").as("regs"))
    val out = df.groupBy(col("id"))
      .agg(graft.plans.RegMaxArr.regMax(col("regs")).as("m"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(out(0) == ((1L, Seq(3, 5, 0))))
    assert(out(1) == ((2L, Seq(7, 0, 9))))
    // all-NULL group yields the empty zero array, like the old udaf
    assert(out(2) == ((3L, Seq.empty[Int])))
  }

  test("partitioning-independent: repartitioned input, same registers") {
    val rows = (0 until 500).map(i => (i % 7L, Seq.tabulate(16)(j => (i * 31 + j * 17) % 50)))
    val base = rows.toDF("id", "regs")
      .select(col("id"), col("regs").cast("array<int>").as("regs"))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("id")).agg(graft.plans.RegMaxArr.regMax(col("regs")).as("m"))
        .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    val a = run(base.repartition(1))
    val b = run(base.repartition(13, col("regs")))
    assert(a == b)
    // cross-check against a driver-side element-wise max
    val expect = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).reduce((x, y) => x.zip(y).map(t => t._1 max t._2))).toMap
    assert(a.toMap == expect)
  }

  test("mixed-length registers fail loud") {
    val df = Seq((1L, Seq(1, 2)), (1L, Seq(1, 2, 3))).toDF("id", "regs")
      .select(col("id"), col("regs").cast("array<int>").as("regs"))
    val ex = intercept[Exception] {
      df.groupBy(col("id")).agg(graft.plans.RegMaxArr.regMax(col("regs"))).collect()
    }
    assert(ex.getMessage.contains("different lengths") ||
      Option(ex.getCause).exists(_.getMessage.contains("different lengths")))
  }
}
