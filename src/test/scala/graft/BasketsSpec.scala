package graft

import graft.ops.Baskets
import org.apache.spark.sql.functions._

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  // baskets: {1,2,3}, {1,2}, {1,2,4}, {3,4}, {5} — item counts:
  // 1->3, 2->3, 3->2, 4->2, 5->1
  private lazy val tx = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (11L, 1L), (11L, 2L),
    (12L, 1L), (12L, 2L), (12L, 4L),
    (13L, 3L), (13L, 4L),
    (14L, 5L)
  ).toDF("basket", "item")

  test("frequentPairs: hand-counted supports, threshold applied to pairs too") {
    val got = Baskets.frequentPairs(tx, "basket", "item", minSupport = 2)
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) in 3 baskets; (1,3),(2,3),(1,4),(2,4),(3,4) each in 1 -> cut
    assert(got == Set((1L, 2L, 3L)))
  }

  test("apriori prune: a singleton item never reaches the pair join") {
    // with minSupport=1 every pair shows; item 5 still pairs with nothing
    val got = Baskets.frequentPairs(tx, "basket", "item", minSupport = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L),
      (1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("duplicate facts count once; NULLs are excluded") {
    val withDups = tx.unionAll(Seq((10L, 1L), (10L, 1L)).toDF("basket", "item"))
      .unionAll(Seq((Option.empty[Long], Option(1L))).toDF("basket", "item"))
    val got = Baskets.frequentPairs(withDups, "basket", "item", minSupport = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L)))
  }

  test("cosinePairs: hand-computed nano-unit cosine") {
    val got = Baskets.cosinePairs(tx, "basket", "item", minSupport = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // cos(1,2) = 3/sqrt(3*3) = 1.0
    assert(got == Set((1L, 2L, 3L, 1000000000L)))
    val loose = Baskets.cosinePairs(tx, "basket", "item", minSupport = 1)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    // cos(3,4) = 1/sqrt(2*2) = 0.5 exactly
    assert(loose((3L, 4L)) == 500000000L)
    // cos(1,3) = 1/sqrt(3*2)
    assert(loose((1L, 3L)) == math.round(1.0 / math.sqrt(6.0) * 1e9))
  }

  test("a quadratic basket fails loud after the prune, naming the basket") {
    val hot = (1L to 50L).map(i => (99L, i)).toDF("basket", "item")
    val e = intercept[IllegalArgumentException](
      Baskets.frequentPairs(hot, "basket", "item", minSupport = 1, maxBasketItems = 10))
    assert(e.getMessage.contains("99") && e.getMessage.contains("quadratic"))
    // the prune can rescue it: every item is a singleton at minSupport 2
    assert(Baskets.frequentPairs(hot, "basket", "item", minSupport = 2,
      maxBasketItems = 10).count() == 0L)
  }

  test("aggregate pair volume fails loud when many medium baskets are quadratic in total") {
    // 40 baskets x 10 items: no basket trips a per-basket cap of 10,
    // but the total volume is 40 * 45 = 1800 exact self-join rows
    val medium = (for (b <- 1L to 40L; i <- 1L to 10L) yield (b, b * 100 + i))
      .toDF("basket", "item")
    val e = intercept[IllegalArgumentException](
      Baskets.frequentPairs(medium, "basket", "item", minSupport = 1,
        maxBasketItems = 10, maxPairVolume = 1000L))
    assert(e.getMessage.contains("1800") && e.getMessage.contains("maxPairVolume=1000"))
    // the reported volume is exact: capping at it passes
    assert(Baskets.frequentPairs(medium, "basket", "item", minSupport = 1,
      maxBasketItems = 10, maxPairVolume = 1800L).count() == 1800L)
  }

  test("results are partitioning-independent") {
    val big = (1L to 600L).map(i => (i % 40, (i * 7) % 25)).toDF("basket", "item")
    val a = Baskets.cosinePairs(big.repartition(13), "basket", "item", 3)
      .orderBy($"item_a", $"item_b").collect()
    val b = Baskets.cosinePairs(big, "basket", "item", 3)
      .orderBy($"item_a", $"item_b").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }
}
