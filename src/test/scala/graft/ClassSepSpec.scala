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

  test("per-dimension square past int64 stays exact (the sf10 wrap, r14)") {
    // 400 rows/class at coords ±1.0: cross-scaled diff per dim =
    // (4e6+4e6)·400 = 3.2e9, whose square 1.024e19 EXCEEDS
    // Long.MaxValue (9.22e18) — the old long fold wrapped silently
    // here (measured live at sf10: squares ~1e22). The decimal(38,0)
    // fold must carry the true integer 2.048e19 into the final
    // mirrored-double division: 2.048e19 has no exact double (>2⁵³),
    // so both the engine (decimal→double) and the oracle
    // (HUGEINT→double) round it identically to nearest-even —
    // ...128 is the IEEE-exact answer, not noise. A wrapped long
    // fold lands nowhere near it.
    val emb = ((1 to 400).map(_ => (0, Array(1.0, -1.0))) ++
      (1 to 400).map(_ => (1, Array(-1.0, 1.0)))).toDF("label", "embedding")
    val got = ClassSep.centroidDistances(emb, "label", "embedding")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // left-associated exactly as the engine column: ((1e9·D)/p)/p
    val expected = math.round(
      1e9 * BigInt("20480000000000000000").toDouble / 160000.0 / 160000.0)
    assert(expected == 800000000000000128L) // pin the IEEE value itself
    assert(got == Seq((0L, 1L, 400L, 400L, expected)))
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
