package graft

import graft.operators.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry apple"),
    (2L, "banana cherry banana durian"),
    (3L, "cherry cherry cherry cherry")
  ).toDF("doc_id", "text")

  test("rare repeated terms outrank ubiquitous ones") {
    val top1 = TfIdf.topTerms(docs, "text", 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    // "apple" appears 3× in doc 1 only; "cherry" is in every doc
    assert(top1(1L) == "apple")
    assert(top1(2L) == "banana")
    assert(top1(3L) == "cherry")
  }

  test("tf, df, and rational idf are exact") {
    val r = TfIdf.topTerms(docs, "text", 5)
      .where($"doc_id" === 1 && $"term" === "apple").head()
    assert(r.getAs[Long]("tf") == 3L)
    assert(r.getAs[Long]("df") == 1L)
    // tfidf = tf * (N+1)/(df+1) = 3 * 4/2 = 6.0
    assert(r.getAs[Double]("tfidf") == 6.0)
  }

  test("ties rank deterministically by term") {
    val d = Seq((7L, "zeta alpha")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(d, "text", 2).orderBy($"rnk")
      .collect().map(_.getAs[String]("term")).toSeq
    // same tf=1, same df=1 → same tfidf → alphabetical
    assert(out == Seq("alpha", "zeta"))
  }

  test("k bounds the per-document output") {
    val out = TfIdf.topTerms(docs, "text", 2).collect()
    assert(out.groupBy(_.getAs[Long]("doc_id")).values.forall(_.length <= 2))
  }
}
