package graft

import org.apache.spark.sql.functions._
import graft.operators.KmvSketch

/** KmvSketch: the bottom-k set-operation sketch. Contracts —
  * (1) small groups are EXACT (sketch holds the whole distinct set);
  * (2) count accuracy within 3×rsd (rsd ≈ 1/√(k−2)) on groups larger
  * than k; (3) merge-invariance: rollup over fine-grain sketch rows
  * is bit-identical to building at the coarse grain directly, and
  * idempotent under re-delivery; (4) partition-independence;
  * (5) pairwise overlap: exact when both sides fit in k, and within
  * the binomial error band on larger sets with known overlap.
  * Cross-ENGINE equality is q_kmv_distinct / q_kmv_jaccard's exact
  * DuckDB oracles, not re-tested here. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 256
  private val rsd = 1.0 / math.sqrt((k - 2).toDouble) // ~6.3%

  test("groups smaller than k estimate exactly; larger within 3×rsd") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01").where($"user_id".isNotNull)
    val est = KmvSketch.estimate(
        KmvSketch.sketch(ev, Seq("event_type"), "user_id", k),
        Seq("event_type"), k)
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(exact.nonEmpty && est.keySet == exact.keySet)
    exact.foreach { case (grp, n) =>
      if (n < k) assert(est(grp) == n, s"$grp: small group must be exact")
      else {
        val relErr = math.abs(est(grp) - n).toDouble / n
        assert(relErr <= 3 * rsd, s"$grp: est=${est(grp)} exact=$n relErr=$relErr")
      }
    }
  }

  test("rollup of fine-grain sketch equals direct build (bit-identical), idempotent") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01").where($"user_id".isNotNull)
      .withColumn("day", to_date($"ts"))
    val fine = KmvSketch.sketch(ev, Seq("event_type", "day"), "user_id", k)
    val direct = KmvSketch.sketch(ev, Seq("event_type"), "user_id", k)
      .orderBy($"event_type", $"hv").as[(String, Long)].collect()
    val viaRollup = KmvSketch.rollup(fine, Seq("event_type"), k)
      .orderBy($"event_type", $"hv").as[(String, Long)].collect()
    assert(viaRollup.nonEmpty && viaRollup.sameElements(direct))
    val again = KmvSketch.rollup(fine.unionByName(fine), Seq("event_type"), k)
      .orderBy($"event_type", $"hv").as[(String, Long)].collect()
    assert(again.sameElements(direct))
  }

  test("sketch rows independent of partitioning") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01").where($"user_id".isNotNull)
    val s3 = KmvSketch.sketch(ev.repartition(3), Seq("event_type"), "user_id", k)
      .orderBy($"event_type", $"hv").as[(String, Long)].collect()
    val s17 = KmvSketch.sketch(ev.repartition(17), Seq("event_type"), "user_id", k)
      .orderBy($"event_type", $"hv").as[(String, Long)].collect()
    assert(s3.nonEmpty && s3.sameElements(s17))
  }

  test("pairwise overlap exact when both sets fit inside k") {
    // a: 1..100, b: 51..150  ->  |A∪B|=150, |A∩B|=50, J=1/3
    val rows = (1 to 100).map(i => ("a", s"id_$i")) ++
      (51 to 150).map(i => ("b", s"id_$i"))
    val df = rows.toDF("g", "v")
    val out = KmvSketch.pairwiseOverlap(
        KmvSketch.sketch(df, Seq("g"), "v", k), "g", k)
      .as[(String, String, Long, Double, Long, Long)].collect()
    assert(out.toSeq == Seq(("a", "b", 50L, 50.0 / 150.0, 150L, 50L)))
  }

  test("pairwise overlap within binomial band on sets larger than k") {
    // a: 1..20000, b: 10001..30000 -> J = 10000/30000 = 1/3
    val df = ((1 to 20000).map(i => ("a", s"id_$i")) ++
      (10001 to 30000).map(i => ("b", s"id_$i"))).toDF("g", "v")
    val Array((g1, g2, _, j, unionEst, interEst)) = KmvSketch.pairwiseOverlap(
        KmvSketch.sketch(df, Seq("g"), "v", k), "g", k)
      .as[(String, String, Long, Double, Long, Long)].collect()
    assert((g1, g2) == ("a", "b"))
    val seJ = math.sqrt((1.0 / 3) * (2.0 / 3) / k) // ~0.029
    assert(math.abs(j - 1.0 / 3) <= 4 * seJ, s"jaccard=$j")
    assert(math.abs(unionEst - 30000).toDouble / 30000 <= 3 * rsd, s"union=$unionEst")
    assert(math.abs(interEst - 10000).toDouble / 10000 <= 6 * rsd, s"inter=$interEst")
  }

  test("disjoint and identical groups: J = 0 and J = 1") {
    val df = ((1 to 5000).map(i => ("x", s"l_$i")) ++
      (1 to 5000).map(i => ("y", s"r_$i")) ++
      (1 to 5000).map(i => ("z", s"l_$i"))).toDF("g", "v")
    val out = KmvSketch.pairwiseOverlap(
        KmvSketch.sketch(df, Seq("g"), "v", k), "g", k)
      .as[(String, String, Long, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out(("x", "y")) == 0.0)
    assert(out(("x", "z")) == 1.0)
    assert(out(("y", "z")) == 0.0)
  }

  test("nulls skipped; empty input yields empty sketch") {
    val df = Seq(("a", Option("v1")), ("a", None), ("a", Option("v1")))
      .toDF("g", "v")
    val sk = KmvSketch.sketch(df, Seq("g"), "v", k)
    assert(sk.count() == 1)
    assert(KmvSketch.sketch(df.where(lit(false)), Seq("g"), "v", k).count() == 0)
  }
}
