package graft

import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup

/** Exact repeated-substring removal: first-occurrence survival, mask
  * union across overlaps, full-doc erasure, empty/NULL pass-through. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  test("duplicated 3-grams keep only their first (doc_id, pos) occurrence") {
    // a_b_c occurs at (1,1), (2,1), (3,0), (3,3): (1,1) is canonical;
    // doc 2 loses its middle span; doc 3 is covered twice over and
    // erases completely (mask union of [0,2] and [3,5])
    val docs = Seq(
      (1L, "x a b c y"),
      (2L, "q a b c r"),
      (3L, "a b c a b c"),
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = SubstringDedup.removeRepeatedNgrams(docs, "text", 3)
      .orderBy($"doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "x a b c y", 5L, 0L)))
    assert(out(1) == ((2L, "q r", 5L, 3L)))
    assert(out(2) == ((3L, "", 6L, 6L)))
    assert(out(3) == ((4L, "", 0L, 0L)))
    assert(out(4) == ((5L, "", 0L, 0L)))
  }

  test("a repeat WITHIN one document is masked after its first occurrence") {
    val docs = Seq((1L, "a b c z z z a b c")).toDF("doc_id", "text")
    // a_b_c at pos 0 (kept) and pos 6 (masked) — z_z_z occurs once
    val out = SubstringDedup.removeRepeatedNgrams(docs, "text", 3)
      .as[(Long, String, Long, Long)].head()
    assert(out == ((1L, "a b c z z z", 9L, 3L)))
  }

  test("short docs (fewer than n tokens) are never masked") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val out = SubstringDedup.removeRepeatedNgrams(docs, "text", 3)
      .orderBy($"doc_id").as[(Long, String, Long, Long)].collect()
    assert(out.map(_._4).forall(_ == 0L))
    assert(out(0)._2 == "a b" && out(2)._2 == "a")
  }

  test("whitespace is canonicalized, not preserved (library reassembly convention)") {
    val docs = Seq((1L, "  a   b  c ")).toDF("doc_id", "text")
    val out = SubstringDedup.removeRepeatedNgrams(docs, "text", 3)
      .as[(Long, String, Long, Long)].head()
    assert(out == ((1L, "a b c", 3L, 0L)))
  }

  test("total tokens are conserved: kept + removed = original, per doc and corpus-wide") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val out = SubstringDedup.removeRepeatedNgrams(docs, "text", 3)
    val bad = out.where(
      size(filter(split($"text_clean", " +"), t => length(t) > 0))
        =!= ($"n_tokens" - $"n_removed"))
    assert(bad.isEmpty, "reassembled token count must equal n_tokens - n_removed")
    assert(out.count() == docs.count())
  }

  test("n=1 is rejected") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      SubstringDedup.removeRepeatedNgrams(docs, "text", 1))
  }
}
