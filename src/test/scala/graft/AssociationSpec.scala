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
}
