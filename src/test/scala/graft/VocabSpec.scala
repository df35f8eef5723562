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

  // ---- bigramPerplexity ----
  // Fixture model (stats = even doc_ids d0/d2/d4):
  //   U: a=3 b=3 c=2; N=8; B: (a,b)=2 (b,a)=1 (b,c)=2
  //   flog2 images: len(bin(8))=4, len(bin(3))=2, len(bin(2))=2
  private def pplDocs = Seq(
    (0L, "a b a b c"), // in stats
    (1L, "a b z q"),   // (b,z),(z,q) are OOV (z,q never in stats)
    (2L, "a"),         // <2 tokens → zero row
    (3L, null.asInstanceOf[String]),
    (4L, "b c"),       // in stats
    (5L, "c a")        // (c,a) unseen bigram, 'a' seen → backoff
  ).toDF("doc_id", "text")

  test("bigramPerplexity: exact bits on all three branches (seen / backoff / OOV)") {
    val out = Vocab.bigramPerplexity(pplDocs, pplDocs.where($"doc_id" % 2 === 0), "text")
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long, Double)].collect()
    // d0: (a,b)=0, (b,a)=2-1=1, (a,b)=0, (b,c)=0 bits
    assert(out(0) == ((0L, 4L, 1L, 0L, 0L, 0.25)))
    // d1: (a,b)=0; (b,z) OOV=4; (z,q) OOV=4
    assert(out(1) == ((1L, 3L, 8L, 0L, 2L, 8.0 / 3.0)))
    assert(out(2) == ((2L, 0L, 0L, 0L, 0L, 0.0)))
    assert(out(3) == ((3L, 0L, 0L, 0L, 0L, 0.0)))
    // d4: (b,c): len(bin U(b)=3) - len(bin B=2) = 0 bits
    assert(out(4) == ((4L, 1L, 0L, 0L, 0L, 0.0)))
    // d5: (c,a) backoff: 1 + len(bin 8) - len(bin U(a)=3) = 3 bits
    assert(out(5) == ((5L, 1L, 3L, 1L, 0L, 3.0)))
  }

  test("bigramPerplexity: empty stats corpus scores every bigram as a 1-bit OOV") {
    val score = Seq((7L, "x y z")).toDF("doc_id", "text")
    val out = Vocab.bigramPerplexity(score, score.where(lit(false)), "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // N clamps to 1 → len(bin(1)) = 1 bit per OOV bigram
    assert(out.toSeq == Seq((7L, 2L, 2L, 0L, 2L, 1.0)))
  }

  test("bigramPerplexity: incoherent docs outscore coherent ones over the same vocabulary") {
    // stats: strongly ordered text; probe: same tokens shuffled
    val stats = (0L until 40L).map(i => (i, "the cat sat on the mat")).toDF("doc_id", "text")
    val probe = Seq((100L, "the cat sat on the mat"), (101L, "mat the on sat cat the")).toDF("doc_id", "text")
    val out = Vocab.bigramPerplexity(probe, stats, "text")
      .orderBy($"doc_id").select($"avg_bits").as[Double].collect()
    assert(out(0) < out(1), s"coherent ${out(0)} should beat shuffled ${out(1)}")
  }

  test("bigramPerplexity: scoring the stats corpus itself never backs off (self-consistency)") {
    // every bigram of a stats document is by construction in the
    // model, so the backoff and OOV branches must be unreachable
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val out = Vocab.bigramPerplexity(docs, docs, "text")
    assert(out.where($"n_backoff" =!= 0L || $"n_oov" =!= 0L).isEmpty)
    // and the seen-branch score is bounded: ctx>=cnt means >=0 bits,
    // and no bigram can cost more than flog2 of the total token count
    assert(out.where($"ppl_bits" < 0L).isEmpty)
  }

  test("bigramPerplexity plan: bigrams build map-side (Generate, no window), joins are hash joins") {
    val plan = Vocab.bigramPerplexity(pplDocs, pplDocs.where($"doc_id" % 2 === 0), "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("Window"), plan)
    // the only nested-loop is the 1-row broadcast total (surprisal's
    // scalar cross join); a corpus-sized cartesian would be a bug
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("knBigramTable: hand-checked interpolated Kneser-Ney on a tiny corpus") {
    import spark.implicits._
    // corpus: "a b a b", "c b" -> bigrams: (a,b)x2? doc1: a-b, b-a, a-b; doc2: c-b
    // cb: (a,b):2, (b,a):1, (c,b):1; left a: c1=2 n1fw=1; b: c1=1 n1fw=1; c: c1=1 n1fw=1
    // right b: n1bw=2 (after a, after c); a: n1bw=1; ntypes=3
    val docs = Seq((1L, "a b a b"), (2L, "c b")).toDF("doc_id", "text")
    val got = graft.ops.Vocab.knBigramTable(docs, "text", k = 10)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = got(("a", "b"))
    assert((ab._3, ab._4, ab._5, ab._6) == ((2L, 2L, 1L, 2L)))
    val pAb = (2.0 - 0.75) / 2.0 + (0.75 * 1.0 / 2.0) * (2.0 / 3.0)
    assert(ab._7 == math.round(1e9 * pAb))
    val ba = got(("b", "a"))
    val pBa = (1.0 - 0.75) / 1.0 + (0.75 * 1.0 / 1.0) * (1.0 / 3.0)
    assert(ba._7 == math.round(1e9 * pBa))
    // discounted+backed-off mass per context sums to 1 over observed
    // w2 ONLY when the context saw every word; just sanity the range
    assert(got.values.forall(r => r._7 > 0 && r._7 <= 1000000000L))
  }
}
