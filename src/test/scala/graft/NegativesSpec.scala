package graft

import graft.ops.Negatives

class NegativesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 500L).map(i => i * 10).toDF("doc_id")

  test("every draw is a corpus member and never the anchor itself") {
    val got = Negatives.sample(docs, "doc_id", k = 3)
    val members = docs.as[Long].collect().toSet
    val rows = got.as[(Long, Int, Long)].collect()
    assert(rows.forall { case (a, _, n) => members(n) && n != a })
    assert(rows.forall { case (_, j, _) => j >= 1 && j <= 3 })
  }

  test("k per anchor in expectation; never more; deterministic across runs") {
    val a = Negatives.sample(docs, "doc_id", k = 3)
    val perAnchor = a.groupBy($"anchor_id").count().as[(Long, Long)].collect()
    assert(perAnchor.length == 500 && perAnchor.forall(_._2 <= 3))
    // self-collision is ~k/N per anchor: almost all anchors keep all
    // 3 (this fixed hash drops a draw for 8 of 500)
    assert(perAnchor.count(_._2 == 3) >= 485)
    val b = Negatives.sample(docs, "doc_id", k = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("seed re-deals the draw") {
    val a = Negatives.sample(docs, "doc_id", k = 2, seed = 1L)
    val b = Negatives.sample(docs, "doc_id", k = 2, seed = 2L)
    assert(a.exceptAll(b).count() > 0)
  }

  test("draws are roughly uniform over the corpus") {
    val counts = Negatives.sample(docs, "doc_id", k = 10)
      .groupBy($"neg_id").count().as[(Long, Long)].collect().map(_._2)
    // 5000 draws over 500 docs: mean 10; no doc should be wildly hot
    assert(counts.max <= 30, s"max=${counts.max}")
  }

  test("guards: k > 0 and at least two rows") {
    intercept[IllegalArgumentException](Negatives.sample(docs, "doc_id", 0))
    intercept[IllegalArgumentException](
      Negatives.sample(Seq(1L).toDF("doc_id"), "doc_id", 1))
  }
}
