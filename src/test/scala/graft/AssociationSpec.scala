package graft

import graft.ops.Association
import org.apache.spark.sql.functions._

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("independent columns have ~zero MI; identical columns have ln(k)") {
    // X uniform over {a,b}, Y == X exactly: MI = ln 2 nats
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")).toDF("x", "y")
    val miDep = Association.mutualInformation(dep, "x", "y")
      .agg(sum($"mi_nano")).as[Long].head() / 1e9
    assert(math.abs(miDep - math.log(2)) < 1e-6, miDep)

    // X and Y independent uniform: every cell count equal -> MI 0
    val ind = (for (x <- Seq("a", "b"); y <- Seq("p", "q")) yield (x, y)).toDF("x", "y")
    val miInd = Association.mutualInformation(ind, "x", "y")
      .agg(sum($"mi_nano")).as[Long].head()
    assert(miInd == 0L, miInd)
  }

  test("cell contributions carry signed PMI weight and NULLs are excluded") {
    val df = Seq(Some("a") -> Some("p"), Some("a") -> Some("p"), Some("a") -> Some("q"),
      Some("b") -> Some("q"), None -> Some("p"), Some("b") -> None)
      .map { case (x, y) => (x.orNull, y.orNull) }.toDF("x", "y")
    val rows = Association.mutualInformation(df, "x", "y")
      .as[(String, String, Long, Long)].collect().toMap2
    // over-represented cell (a,p): positive contribution
    assert(rows(("a", "p"))._2 > 0)
    // 4 non-null rows only
    assert(rows.values.map(_._1).sum == 4L)
  }

  implicit private class M(rows: Array[(String, String, Long, Long)]) {
    def toMap2: Map[(String, String), (Long, Long)] =
      rows.map { case (x, y, n, mi) => (x, y) -> ((n, mi)) }.toMap
  }

  test("rollingCorrelation: perfect linear windows give +1/-1, flat gives NULL") {
    val df = Seq((1L, 1L, 2L), (2L, 2L, 4L), (3L, 3L, 6L),   // y = 2x -> r = 1
      (4L, 4L, 1L), (5L, 5L, 0L)).toDF("k", "x", "y")
    val got = Association.rollingCorrelation(df, "k", "x", "y", windowRows = 3)
      .orderBy("k").as[(Long, Long, Option[Long])].collect().toSeq
    assert(got(0)._3.isEmpty)                   // single point: zero variance
    assert(got(2)._3 == Some(1000000000L))      // window {1,2,3}: exact +1
    assert(got(4)._3.get < -800000000L)         // window {3,4,5}: y falls (6,1,0) -> strongly negative
    val flat = Seq((1L, 5L, 9L), (2L, 5L, 9L), (3L, 5L, 9L)).toDF("k", "x", "y")
    val g2 = Association.rollingCorrelation(flat, "k", "x", "y", 3)
      .orderBy("k").as[(Long, Long, Option[Long])].collect()
    assert(g2.forall(_._3.isEmpty))
  }
}
