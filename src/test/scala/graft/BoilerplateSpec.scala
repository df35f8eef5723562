package graft

import graft.ops.Boilerplate
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // "cookie notice" appears in 3 of 4 docs (df 75%) — boilerplate at
  // any threshold below that; content lines are unique
  private def pages = Seq(
    (1L, "cookie notice|welcome to my blog|cookie notice|post one body"),
    (2L, "cookie notice|an article about spark"),
    (3L, "cookie notice|something else entirely"),
    (4L, "only original content here")
  ).toDF("doc_id", "text")

  test("high-df units are removed; order and intra-doc repeats of kept units survive") {
    val out = Boilerplate.removeFrequentUnits(pages, "text", "|", maxDfPermille = 500)
      .orderBy($"doc_id").as[(Long, String)].collect()
    assert(out(0)._2 == "welcome to my blog|post one body") // both notices gone, order kept
    assert(out(1)._2 == "an article about spark")
    assert(out(3)._2 == "only original content here")
  }

  test("a doc that is all boilerplate becomes the empty string, not a dropped row") {
    val docs = Seq(
      (1L, "footer"), (2L, "footer"), (3L, "footer"), (4L, "real content")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentUnits(docs, "text", " ", 500)
    assert(out.count() == 4)
    assert(out.where($"doc_id" === 1L).select($"text").as[String].head() == "")
  }

  test("intra-doc repetition does not inflate df (distinct docs, not occurrences)") {
    // 'echo' appears 5 times but only in doc 1 of 3: df 33% — kept at 40%
    val docs = Seq(
      (1L, "echo echo echo echo echo"), (2L, "alpha beta"), (3L, "gamma delta")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentUnits(docs, "text", " ", 400)
      .where($"doc_id" === 1L).select($"text").as[String].head()
    assert(out == "echo echo echo echo echo")
  }

  test("NULL text stays NULL; doubled separators collapse") {
    val docs = Seq(
      (1L, "a  b"), (2L, null.asInstanceOf[String]), (3L, "c d"), (4L, "e f")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentUnits(docs, "text", " ", 1000)
      .orderBy($"doc_id").as[(Long, String)].collect()
    assert(out(0)._2 == "a b")
    assert(out(1)._2 == null)
  }

  test("threshold boundary is exact: df equal to the cut is KEPT (<=)") {
    // 'x' in 2 of 4 docs = exactly 500 permille
    val docs = Seq(
      (1L, "x p"), (2L, "x q"), (3L, "r s"), (4L, "t u")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentUnits(docs, "text", " ", 500)
      .where($"doc_id" === 1L).select($"text").as[String].head()
    assert(out == "x p")
  }

  test("rejects a bad threshold or empty separator") {
    intercept[IllegalArgumentException] {
      Boilerplate.removeFrequentUnits(pages, "text", " ", 1001)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.removeFrequentUnits(pages, "text", "", 500)
    }
  }
}
