package graft

import graft.ops.Vocab
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a a a b b c"),
    (2L, "a b d"),
    (3L, "  a  "), // leading/trailing whitespace → empty tokens, dropped
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("coverage ranks by (count desc, token asc) with exact cumulative shares") {
    val out = Vocab.coverage(docs, "text", 10)
      .orderBy($"rank")
      .as[(String, Long, Int, Double)].collect()
    // counts: a=5, b=3, c=1, d=1 → total 10
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("a", 5L, 1), ("b", 3L, 2), ("c", 1L, 3), ("d", 1L, 4)))
    assert(out.map(_._4).toSeq == Seq(0.5, 0.8, 0.9, 1.0))
  }

  test("k cuts the frontier deterministically (ties broken by token)") {
    val out = Vocab.coverage(docs, "text", 3).orderBy($"rank")
      .select($"token").as[String].collect()
    assert(out.toSeq == Seq("a", "b", "c")) // c beats d on the tie by name
  }

  test("the global top-k plans as TakeOrderedAndProject, not a total sort") {
    val plan = Vocab.coverage(docs, "text", 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("rejects a non-positive k") {
    intercept[IllegalArgumentException] { Vocab.coverage(docs, "text", 0) }
  }

  test("oovRate: exact rates, empty and NULL docs report 0 tokens / rate 0") {
    val vocab = Seq("a", "b").toDF("token")
    val out = Vocab.oovRate(docs, "text", vocab)
      .orderBy($"doc_id").as[(Long, Long, Long, Double)].collect()
    // doc 1: "a a a b b c" → 6 tokens, 1 oov (c)
    assert(out(0) == ((1L, 6L, 1L, 1.0 / 6.0)))
    // doc 2: "a b d" → 3 tokens, 1 oov (d)
    assert(out(1) == ((2L, 3L, 1L, 1.0 / 3.0)))
    // doc 3: whitespace only → 1 real token 'a', 0 oov
    assert(out(2) == ((3L, 1L, 0L, 0.0)))
    // doc 4: NULL text → 0 tokens, rate 0 (row present)
    assert(out(3) == ((4L, 0L, 0L, 0.0)))
  }

  test("oovRate against the corpus' own full vocabulary is all zero") {
    val vocab = Vocab.coverage(docs, "text", 100).select($"token")
    val out = Vocab.oovRate(docs, "text", vocab)
    assert(out.where($"n_oov" =!= 0L).isEmpty)
  }

  test("surprisal: exact floor-log2 bits on a skewed fixture; rare beats common") {
    // counts: a=5, b=1, rare=1 → total=7; floor-log2 lengths:
    // bin(7)=111 (3), bin(5)=101 (3), bin(1)=1 (1)
    // ⇒ bits: a = 3−3 = 0, b = rare = 3−1 = 2
    val fx = Seq(
      (1L, "a a a a"),      // 4·0 bits, avg 0.0 — pure boilerplate
      (2L, "a b"),          // 0+2 bits, avg 1.0
      (3L, "rare"),         // 2 bits,  avg 2.0 — rare content scores highest
      (4L, ""),             // no tokens
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Vocab.surprisal(fx, "text")
      .orderBy($"doc_id").as[(Long, Long, Long, Double)].collect()
    assert(out(0) == ((1L, 4L, 0L, 0.0)))
    assert(out(1) == ((2L, 2L, 2L, 1.0)))
    assert(out(2) == ((3L, 1L, 2L, 2.0)))
    assert(out(3) == ((4L, 0L, 0L, 0.0)))
    assert(out(4) == ((5L, 0L, 0L, 0.0)))
  }

  test("surprisal bounds hold on the real corpus") {
    val docs01 = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Vocab.surprisal(docs01, "text")
    // every doc present; bits within [0, floor_log2(total)] per token
    assert(out.count() == docs01.count())
    assert(out.where($"avg_surprisal" < 0).isEmpty)
    val totalTokens = docs01
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .where(length($"t") > 0).count()
    val maxBits = 63 - java.lang.Long.numberOfLeadingZeros(totalTokens)
    assert(out.where($"avg_surprisal" > maxBits).isEmpty)
  }
}
