package graft

import graft.ops.Outliers
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("groupStats: exact lower-median and MAD on a hand fixture") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 100L)).toDF("k", "v")
    val s = Outliers.groupStats(df, Seq("k"), "v")
      .as[(String, Long, Long, Long)].collect().head
    // sorted [1,2,3,4,100]: median idx (5-1)/2 = 2 -> 3
    // devs sorted [0,1,1,2,97] -> mad = 1
    assert(s == (("g", 5L, 3L, 1L)))
  }

  test("flag: Hampel's rule marks exactly the far point at k=3") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 100L)).toDF("k", "v")
    val flagged = Outliers.flag(df, Seq("k"), "v", 3)
      .as[(String, Long, Boolean)].collect().toMap2
    assert(flagged == Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 100L -> true))
  }

  test("a zero-MAD group flags ANY deviation from the median") {
    val df = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 9L)).toDF("k", "v")
    val flagged = Outliers.flag(df, Seq("k"), "v", 3)
      .as[(String, Long, Boolean)].collect().toMap2
    assert(flagged == Map(5L -> false, 9L -> true))
  }

  test("NULL values are never flagged; groups stay independent") {
    val df = Seq(("g", Option(1L)), ("g", Option(2L)), ("g", Option(3L)),
      ("g", Option.empty[Long]), ("h", Option(1000L))).toDF("k", "v")
    val rows = Outliers.flag(df, Seq("k"), "v", 3)
      .select($"k", $"v", $"is_outlier").as[(String, Option[Long], Boolean)].collect()
    assert(rows.forall(!_._3)) // nothing anomalous in-group; NULL unflagged
    assert(rows.count(_._2.isEmpty) == 1)
  }

  implicit private class MapOps(rows: Array[(String, Long, Boolean)]) {
    def toMap2: Map[Long, Boolean] = rows.map(r => r._2 -> r._3).toMap
  }

  test("winsorize clips to occurring values at the discrete quantile index") {
    import spark.implicits._
    // sorted: 1..10; p[0.1] idx floor(9*0.1)=0 -> lo=1... use p=0.2: idx floor(9*0.2)=1 -> lo=2; p=0.8: idx 7 -> hi=8
    val df = (1L to 10L).map(v => ("g", v)).toDF("k", "v")
    val got = graft.ops.Outliers.winsorize(df, Seq("k"), "v", 0.2, 0.8)
      .orderBy("v").select("v", "clipped", "was_clipped")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._2) == Seq(2L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 8L, 8L))
    assert(got.map(_._3) == Seq(true, false, false, false, false, false, false, false, true, true))
  }

  test("winsorize: NULL values pass through NULL and groups are independent") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(100L)), ("a", Some(50L)), ("a", None),
      ("b", Some(7L))).toDF("k", "v")
    val got = graft.ops.Outliers.winsorize(df, Seq("k"), "v", 0.0, 0.5)
      .select("k", "v", "clipped").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    // group a sorted [1,50,100]: lo idx 0 -> 1, hi idx floor(2*0.5)=1 -> 50
    assert(got.contains(("a", Some(100L), Some(50L))))
    assert(got.contains(("a", None, None)))
    assert(got.contains(("b", Some(7L), Some(7L))))
  }

  test("imputeMedian fills NULLs with the group lower median, all-null groups stay NULL") {
    import spark.implicits._
    val df = Seq(("a", Some(10L)), ("a", Some(30L)), ("a", Some(20L)), ("a", None),
      ("b", None)).toDF("k", "v")
    val got = graft.ops.Outliers.imputeMedian(df, Seq("k"), "v")
      .select("k", "v", "filled", "was_imputed").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))).toSet
    assert(got.contains(("a", None, Some(20L), true)))   // lower median of [10,20,30]
    assert(got.contains(("a", Some(10L), Some(10L), false)))
    assert(got.contains(("b", None, None, false)))       // no median exists
  }
}
