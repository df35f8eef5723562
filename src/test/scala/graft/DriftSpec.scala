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
}
