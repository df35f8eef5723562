package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch

/** QuantileSketch contracts: (1) the error guarantee — the estimate
  * is the exact nearest-rank value truncated to its log bin, so
  * est ≤ exact and (exact − est)/exact ≤ 2^−subBits; (2) merge-
  * invariance — rollup over fine-grain sketches is bit-identical to
  * building over the union; (3) partition-independence; (4) loud
  * negative rejection. Cross-engine equality is q_quantile_sketch's
  * exact DuckDB oracle. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.5, 0.9, 0.99)

  test("estimates are exact nearest-rank values within 2^-subBits relative, from below") {
    for (s <- Seq(4, 5, 8)) {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
        .select($"l_returnflag", round($"l_extendedprice" * 100).cast("long").as("cents"))
      val est = QuantileSketch.estimate(
          QuantileSketch.build(li, Seq("l_returnflag"), "cents", s),
          Seq("l_returnflag"), qs, s)
        .as[(String, Double, Long)].collect()
        .map { case (g, q, e) => (g, q) -> e }.toMap
      val exact = li.as[(String, Long)].collect().groupBy(_._1).flatMap { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        qs.map { q =>
          val rank = math.max(math.ceil(q * sorted.length).toLong, 1L) // nearest-rank
          (g, q) -> sorted((rank - 1).toInt)
        }
      }
      assert(est.keySet == exact.keySet && est.nonEmpty)
      exact.foreach { case (k, x) =>
        val e = est(k)
        assert(e <= x, s"subBits=$s $k: est=$e above exact=$x")
        assert((x - e).toDouble / x <= math.pow(2.0, -s),
          s"subBits=$s $k: est=$e exact=$x outside 2^-$s")
      }
    }
  }

  test("rollup of fine-grain sketches equals direct build (bit-identical)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_returnflag", $"l_linestatus",
        round($"l_extendedprice" * 100).cast("long").as("cents"))
    val viaRollup = QuantileSketch.rollup(
        QuantileSketch.build(li, Seq("l_returnflag", "l_linestatus"), "cents"),
        Seq("l_returnflag"))
      .orderBy($"l_returnflag", $"bin").as[(String, Long, Long)].collect()
    val direct = QuantileSketch.build(li, Seq("l_returnflag"), "cents")
      .orderBy($"l_returnflag", $"bin").as[(String, Long, Long)].collect()
    assert(viaRollup.nonEmpty && viaRollup.sameElements(direct))
  }

  test("sketch and estimates independent of partitioning") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_returnflag", round($"l_extendedprice" * 100).cast("long").as("cents"))
    val a = QuantileSketch.estimate(
        QuantileSketch.build(li.repartition(3), Seq("l_returnflag"), "cents"),
        Seq("l_returnflag"), qs)
      .orderBy($"l_returnflag", $"q").as[(String, Double, Long)].collect()
    val b = QuantileSketch.estimate(
        QuantileSketch.build(li.repartition(17), Seq("l_returnflag"), "cents"),
        Seq("l_returnflag"), qs)
      .orderBy($"l_returnflag", $"q").as[(String, Double, Long)].collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("negative values are rejected loudly, empty-group and tiny domains work") {
    val neg = Seq(("a", 5L), ("a", -3L)).toDF("g", "v")
    val ex = intercept[Exception] {
      QuantileSketch.build(neg, Seq("g"), "v").collect()
    }
    assert(ex.getMessage.contains("negative value"))
    // values below 2^subBits are their own bins -> estimates exact
    val tiny = Seq(("a", 0L), ("a", 1L), ("a", 2L), ("a", 30L)).toDF("g", "v")
    val est = QuantileSketch.estimate(
        QuantileSketch.build(tiny, Seq("g"), "v"), Seq("g"), Seq(0.5, 1.0))
      .orderBy($"q").as[(String, Double, Long)].collect()
    assert(est.toSeq == Seq(("a", 0.5, 1L), ("a", 1.0, 30L)))
  }
}
