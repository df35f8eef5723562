package graft

import graft.ops.Drift
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("ksStatistic: exact integers on a hand-computable pair of samples") {
    // a = {1,2,3,4}, b = {3,4,5,6}: ECDFs diverge most at v=2
    // (F_a=2/4, F_b=0) and v=4 (F_a=1, F_b=2/4): |ca*Nb - cb*Na| = 8
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Drift.ksStatistic(a, b, "v").as[(Long, Long, Long, Double)].collect().head
    assert(r == ((8L, 4L, 4L, 0.5)))
  }

  test("identical samples have zero drift; disjoint samples have ks = 1") {
    val a = Seq(1L, 2L, 2L, 9L).toDF("v")
    assert(Drift.ksStatistic(a, a, "v").select($"ks").as[Double].head() == 0.0)
    val lo = Seq(1L, 2L).toDF("v"); val hi = Seq(10L, 11L).toDF("v")
    assert(Drift.ksStatistic(lo, hi, "v").select($"ks").as[Double].head() == 1.0)
  }

  test("ksStatistic is independent of partitioning and ignores NULLs") {
    val a = Seq(Option(1L), Option(5L), None, Option(9L)).toDF("v")
    val b = Seq(Option(2L), Option(6L)).toDF("v")
    val r1 = Drift.ksStatistic(a, b, "v").as[(Long, Long, Long, Double)].head()
    val r2 = Drift.ksStatistic(a.repartition(7), b.repartition(3), "v")
      .as[(Long, Long, Long, Double)].head()
    assert(r1 == r2 && r1._2 == 3L && r1._3 == 2L) // NULL excluded from n_a
  }

  test("an empty side fails loud instead of reporting no drift") {
    val a = Seq(1L).toDF("v")
    val empty = Seq(Option.empty[Long]).toDF("v")
    val e = intercept[Exception](Drift.ksStatistic(a, empty, "v").collect())
    assert(e.getMessage.contains("undefined"), e.getMessage)
  }

  test("histogramCompare zero-fills buckets the other side never saw") {
    val a = Seq(0L, 5L, 10L, 15L).toDF("v")  // buckets 0,0,1,1 at width 10
    val b = Seq(25L).toDF("v")               // bucket 2 only
    val rows = Drift.histogramCompare(a, b, "v", 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((0L, 2L, 0L), (1L, 2L, 0L), (2L, 0L, 1L)))
  }

  test("psi: identical sides score exactly zero in every bucket") {
    val a = Seq(1L, 5L, 12L, 12L, 25L).toDF("v")
    val rows = Drift.psi(a, a, "v", 10L).as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._4 == 0L))
  }

  test("psi: hand-checked smoothed contributions, incl. a one-sided bucket") {
    val a = Seq(0L, 5L, 10L).toDF("v")  // buckets 0(x2), 1
    val b = Seq(0L, 25L).toDF("v")      // buckets 0, 2
    // B=3 buckets, Na=3, Nb=2 -> p = (n+1)/(N+3)
    def contrib(na: Long, nb: Long): Long = {
      val (an, ad, bn, bd) = (na + 1.0, 6.0, nb + 1.0, 5.0)
      math.round((an / ad - bn / bd) * math.log((an * bd) / (ad * bn)) * 1.0e9)
    }
    val rows = Drift.psi(a, b, "v", 10L).as[(Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(rows == Map(
      0L -> ((2L, 1L, contrib(2L, 1L))),
      1L -> ((1L, 0L, contrib(1L, 0L))),
      2L -> ((0L, 1L, contrib(0L, 1L)))))
    // every contribution is non-negative ((p_a-p_b) and ln share sign)
    assert(rows.values.forall(_._3 >= 0L))
  }

  test("psi total is an exact long sum - partitioning cannot change it") {
    val a = (1L to 400L).map(i => (i * 7) % 120).toDF("v")
    val b = (1L to 300L).map(i => (i * i) % 150).toDF("v")
    def total(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Drift.psi(x, y, "v", 10L).agg(sum($"psi_e9")).as[Long].head()
    assert(total(a, b) == total(a.repartition(13), b.repartition(5)))
    assert(total(a, b) > 0L) // genuinely shifted distributions
  }

  test("psi: an empty side fails loud") {
    val a = Seq(1L).toDF("v")
    val empty = Seq(Option.empty[Long]).toDF("v")
    val e = intercept[Exception](Drift.psi(a, empty, "v", 10L).collect())
    assert(e.getMessage.contains("undefined"), e.getMessage)
  }

  test("benford: string-head digits, zero-filled spine, hand shares") {
    import spark.implicits._
    // values: 1x digit-1 (10), 2x digit-2 (25, 299), 1x digit-9 (900); zeros/negatives dropped
    val df = Seq(10L, 25L, 299L, 900L, 0L, -7L).toDF("v")
    val got = graft.ops.Drift.benford(df, "v")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == (1L to 9L).toSet)
    assert(got(1L)._2 == 1L && got(2L)._2 == 2L && got(9L)._2 == 1L && got(3L)._2 == 0L)
    assert(got(2L)._3 == math.round(1e9 * 2.0 / 4.0))
    assert(got(1L)._4 == math.round(1e9 * math.log10(2.0)))
    assert(got(3L)._5 == got(3L)._4) // missing digit: deviation = full benford mass
  }
}
