package graft

import graft.ops.InvertedIndex
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "quick brown quick brown"),
    (3L, "the  dog"),             // double space: raw offsets keep the gap
    (4L, null.asInstanceOf[String]),
    (5L, "dog dog dog")
  ).toDF("doc_id", "text")

  private lazy val post = InvertedIndex.postings(docs, "doc_id", "text")

  test("postings carry tf and raw sorted positions") {
    val m = post.where($"token" === "quick")
      .select($"doc_id", $"tf", $"positions")
      .as[(Long, Long, Seq[Int])].collect()
      .map { case (d, tf, pos) => d -> ((tf, pos)) }.toMap
    assert(m(1L) == ((1L, Seq(1))) && m(2L) == ((2L, Seq(0, 2))))
    // "the" in doc 1 at 0 and 6
    val the1 = post.where($"token" === "the" && $"doc_id" === 1L)
      .select($"positions").as[Seq[Int]].head()
    assert(the1 == Seq(0, 6))
  }

  test("conjunctive AND-search requires every term") {
    val hits = InvertedIndex.conjunctive(post, Seq("quick", "brown"))
      .as[Long].collect().toSet
    assert(hits == Set(1L, 2L))
    assert(InvertedIndex.conjunctive(post, Seq("quick", "dog")).as[Long].collect().toSet == Set(1L))
    // duplicate query terms don't inflate the required hit count
    assert(InvertedIndex.conjunctive(post, Seq("dog", "dog")).as[Long].collect().toSet ==
      Set(1L, 3L, 5L))
    intercept[IllegalArgumentException](InvertedIndex.conjunctive(post, Seq.empty))
  }

  test("phrase search matches consecutive tokens only, counting occurrences") {
    val qb = InvertedIndex.phrase(post, Seq("quick", "brown"))
      .as[(Long, Long)].collect().toMap
    assert(qb == Map(1L -> 1L, 2L -> 2L))
    // reversed phrase: matches only doc 2's interior "brown quick"
    // (positions 1->2), never doc 1's non-adjacent pair
    val bq = InvertedIndex.phrase(post, Seq("brown", "quick")).as[(Long, Long)].collect().toMap
    assert(bq == Map(2L -> 1L))
    // repeated-token phrase: "dog dog" twice in "dog dog dog"
    val dd = InvertedIndex.phrase(post, Seq("dog", "dog")).as[(Long, Long)].collect().toMap
    assert(dd == Map(5L -> 2L))
    // 3-token phrase spanning the doc start
    val tqb = InvertedIndex.phrase(post, Seq("the", "quick", "brown")).as[(Long, Long)].collect().toMap
    assert(tqb == Map(1L -> 1L))
    intercept[IllegalArgumentException](InvertedIndex.phrase(post, Seq("dog")))
  }

  test("bm25 ranks higher-tf and rarer-term docs first, deterministically") {
    val corpus = Seq(
      (1L, "spark spark spark engine"),   // high tf for 'spark'
      (2L, "spark engine engine engine"), // low tf for 'spark', high 'engine'
      (3L, "spark"),                      // short doc: length norm boosts it
      (4L, "nothing relevant here at all whatsoever in this one")
    ).toDF("doc_id", "text")
    val p = InvertedIndex.postings(corpus, "doc_id", "text")
    val top = InvertedIndex.bm25(p, Seq("spark"), k = 3)
      .as[(Long, Double)].collect()
    // only docs containing the term score; short doc 3 beats doc 2
    assert(top.map(_._1).toSet == Set(1L, 2L, 3L))
    val m = top.toMap
    assert(m(3L) > m(2L) && m(1L) > m(2L))
    // stable under repartitioning (fixed-order conditional sums)
    val again = InvertedIndex.bm25(
      InvertedIndex.postings(corpus.repartition(7), "doc_id", "text"),
      Seq("spark"), k = 3).as[(Long, Double)].collect()
    assert(top.sortBy(_._1).sameElements(again.sortBy(_._1)))
    intercept[IllegalArgumentException](InvertedIndex.bm25(p, Seq.empty, 3))
  }

  test("double spaces shift raw offsets, breaking false adjacency consistently") {
    // doc 3 "the  dog": split on ' +' yields positions 0 and 1 —
    // adjacency HOLDS under the engine's whitespace convention (runs
    // collapse); the oracle replicates the same convention
    val td = InvertedIndex.phrase(post, Seq("the", "dog")).as[(Long, Long)].collect().toMap
    assert(td.contains(3L))
  }
}
