package graft

import graft.ops.Expectations
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(-3.0), "b"), // range violation
    (3L, None, "a"), // null violation (and NULL predicate -> violation)
    (3L, Some(5.0), "c") // duplicate id
  ).toDF("id", "v", "cat")

  test("rowChecks: one scan, exact violation counts, NULL predicate counts as violation") {
    val out = Expectations.rowChecks(df, Seq(
        "v_nonnull" -> $"v".isNotNull,
        "v_nonneg" -> ($"v" >= 0.0), // NULL for row 3 -> violation
        "cat_known" -> $"cat".isin("a", "b", "c")))
      .orderBy($"check").as[(String, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("cat_known", 0L, 4L, true),
      ("v_nonneg", 2L, 4L, false), // -3 and the NULL
      ("v_nonnull", 1L, 4L, false)))
  }

  test("rowChecks is a single Aggregate scan (no per-check passes)") {
    val plan = Expectations.rowChecks(df, Seq(
        "a" -> $"v".isNotNull, "b" -> ($"id" > 0L)))
      .queryExecution.optimizedPlan.toString
    assert("(?s)LocalRelation|Relation".r.findAllIn(plan).size <= 1, plan)
  }

  test("uniqueCheck counts rows beyond the first per duplicated key") {
    val u = Expectations.uniqueCheck(df, "id_unique", Seq("id"))
      .as[(String, Long, Long, Boolean)].collect().head
    assert(u == (("id_unique", 1L, 4L, false)))
    val ok = Expectations.uniqueCheck(df, "idcat", Seq("id", "cat"))
      .as[(String, Long, Long, Boolean)].collect().head
    assert(ok._4, "id+cat is unique in the fixture")
  }

  test("dotted check names work (no struct-field mis-parse)") {
    val out = Expectations.rowChecks(df, Seq("v.non-null" -> $"v".isNotNull))
      .as[(String, Long, Long, Boolean)].collect().head
    assert(out == (("v.non-null", 1L, 4L, false)))
  }

  test("report unions row and uniqueness checks; empty frame passes row checks") {
    val rep = Expectations.report(df,
        Seq("v_nonnull" -> $"v".isNotNull),
        Seq("id_unique" -> Seq("id")))
      .orderBy($"check").as[(String, Long, Long, Boolean)].collect().toSeq
    assert(rep.map(_._1) == Seq("id_unique", "v_nonnull"))
    val empty = Expectations.rowChecks(df.where(lit(false)),
      Seq("x" -> $"id".isNotNull)).as[(String, Long, Long, Boolean)].collect().head
    assert(empty == (("x", 0L, 0L, true)), "vacuously true on empty input")
  }
}
