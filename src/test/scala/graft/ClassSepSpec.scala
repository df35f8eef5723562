package graft

import graft.operators.ClassSep
import org.apache.spark.sql.functions._

class ClassSepSpec extends SparkSpec {
  import spark.implicits._

  test("hand centroid distance with uneven class sizes") {
    // label 0: vectors (0,0) and (0.0002, 0) -> centroid (1, 0) in quantized units
    // label 1: vector (0.0004, 0.0003) -> centroid (4, 3); dist^2 = 9 + 9 = 18
    val emb = Seq(
      (0, Array(0.0, 0.0)), (0, Array(0.0002, 0.0)),
      (1, Array(0.0004, 0.0003))
    ).toDF("label", "embedding")
    val got = ClassSep.centroidDistances(emb, "label", "embedding")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 2L, 1L, 18L * 1000000000L)))
  }

  test("identical classes have zero distance; NULL labels excluded") {
    val emb = Seq(
      (Some(0), Array(0.5, 0.5)), (Some(1), Array(0.5, 0.5)),
      (None, Array(9.0, 9.0))
    ).toDF("label", "embedding")
    val got = ClassSep.centroidDistances(emb, "label", "embedding")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L, 1L, 0L)))
  }

  test("partitioning-invariant (exact integer folds)") {
    val emb = (1 to 120).map(i =>
      (i % 4, Array.tabulate(8)(j => ((i * 7 + j * 3) % 13).toDouble / 10)))
      .toDF("label", "embedding")
    val a = ClassSep.centroidDistances(emb.repartition(1), "label", "embedding")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = ClassSep.centroidDistances(emb.repartition(13), "label", "embedding")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
