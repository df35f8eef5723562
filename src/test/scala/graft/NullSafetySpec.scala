package graft

import graft.functions.{Redact, TextFunctions => TF}
import graft.operators.{Contamination, NearDup, TfIdf}
import graft.ops.Chunking
import org.apache.spark.sql.functions._

/** Null-text contracts of the round-4 operators: a corpus ALWAYS has
  * null documents at 100 TB, and each operator must take a documented
  * stance rather than propagate surprises. */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, null.asInstanceOf[String]),
    (2L, "a b c d e f")
  ).toDF("doc_id", "text")

  test("chunking: null-text documents yield zero chunks, not null rows") {
    val out = Chunking.chunkByTokens(df, "text", "doc_id", 4, 1).collect()
    assert(out.forall(_.getAs[Long]("doc_id") == 2L))
    assert(out.length == 2)
  }

  test("redaction is null-in-null-out (text and counts)") {
    val r = df.where($"doc_id" === 1)
      .select(Redact.redact($"text").as("red"), Redact.emailCount($"text").as("e")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("shingling maps null text to the EMPTY set (never a null set)") {
    val r = NearDup.shingled(df, "text", 3).where($"doc_id" === 1).head()
    assert(!r.isNullAt(r.fieldIndex("hs")))
    assert(r.getSeq[Long](r.fieldIndex("hs")).isEmpty)
    assert(r.getAs[Int]("n_shingles") == 0)
  }

  test("contamination: a null-text eval doc reports 0, never contaminated") {
    val r = Contamination.evalContamination(
        df.where($"doc_id" === 2), df.where($"doc_id" === 1), "text", 3, 0.8).head()
    assert(r.getAs[Long]("n_contaminated") == 0L)
    assert(r.getAs[Double]("containment") == 0.0)
    assert(!r.getAs[Boolean]("is_contaminated"))
  }

  test("tf-idf: null-text documents contribute no terms but still count in N") {
    val out = TfIdf.topTerms(df, "text", 3).collect()
    assert(out.forall(_.getAs[Long]("doc_id") == 2L))
    // N = 2 (both docs): tfidf = 1 * (2+1)/(1+1) = 1.5
    assert(out.head.getAs[Double]("tfidf") == 1.5)
  }

  test("repetition ratio of null text is 0") {
    val r = df.where($"doc_id" === 1).select(TF.repetitionRatio($"text", 3)).head()
    assert(r.getDouble(0) == 0.0)
  }
}
