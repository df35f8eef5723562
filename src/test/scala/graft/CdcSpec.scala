package graft

import graft.ops.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "price")

  private def log(rows: (Long, String, Long, String, Double)*) =
    rows.toDF("k", "op", "seq", "name", "price")

  test("insert, update, delete, and untouched keys compose into the next snapshot") {
    val l = log(
      (2L, "U", 1L, "b2", 21.0),   // update existing
      (3L, "D", 1L, "x", 0.0),     // delete existing
      (9L, "I", 1L, "i", 90.0))    // insert new
    val got = Cdc.applyLog(snap, l, "k", Seq("name", "price"))
      .orderBy($"k").as[(Long, String, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0), (9L, "i", 90.0)))
  }

  test("latest sequence wins per key, including delete-then-resurrect") {
    val l = log(
      (2L, "U", 1L, "b1", 1.0), (2L, "U", 3L, "b3", 3.0), (2L, "U", 2L, "b2", 2.0),
      (4L, "D", 1L, "x", 0.0), (4L, "I", 2L, "d2", 42.0)) // resurrection
    val got = Cdc.applyLog(snap, l, "k", Seq("name", "price"))
      .orderBy($"k").as[(Long, String, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b3", 3.0), (3L, "c", 30.0), (4L, "d2", 42.0)))
  }

  test("an insert for an existing key replaces it (MERGE upsert semantics)") {
    val l = log((1L, "I", 1L, "a9", 99.0))
    val got = Cdc.applyLog(snap, l, "k", Seq("name", "price"))
      .where($"k" === 1L).as[(Long, String, Double)].collect()
    assert(got.toSeq == Seq((1L, "a9", 99.0)))
  }

  test("unknown ops and ambiguous max-sequence feeds fail loudly") {
    val bad = log((1L, "Z", 1L, "a", 1.0))
    val e1 = intercept[Exception] {
      Cdc.applyLog(snap, bad, "k", Seq("name", "price")).collect()
    }
    assert(e1.getMessage.contains("unknown op") ||
      Option(e1.getCause).exists(_.getMessage.contains("unknown op")), e1.toString)
    val dup = log((1L, "U", 5L, "a1", 1.0), (1L, "U", 5L, "a2", 2.0))
    val e2 = intercept[Exception] {
      Cdc.applyLog(snap, dup, "k", Seq("name", "price")).collect()
    }
    assert(e2.getMessage.contains("ambiguous") ||
      Option(e2.getCause).exists(_.getMessage.contains("ambiguous")), e2.toString)
    intercept[IllegalArgumentException](Cdc.applyLog(snap, bad, "k", Seq.empty))
    // a NULL sequence would be silently SKIPPED by max_by (dropping
    // the entry, e.g. an ignored delete) — it must raise instead
    val nullSeq = Seq((3L, "D", Option.empty[Long], "x", 0.0))
      .toDF("k", "op", "seq", "name", "price")
    val e3 = intercept[Exception] {
      Cdc.applyLog(snap, nullSeq, "k", Seq("name", "price")).collect()
    }
    assert(e3.getMessage.contains("NULL seq") ||
      Option(e3.getCause).exists(_.getMessage.contains("NULL seq")), e3.toString)
  }

  test("result is independent of log partitioning") {
    val l = log((2L, "U", 1L, "b1", 1.0), (2L, "U", 2L, "b2", 2.0),
      (3L, "D", 1L, "x", 0.0), (8L, "I", 4L, "h", 80.0))
    val a = Cdc.applyLog(snap, l.repartition(7), "k", Seq("name", "price"))
      .orderBy($"k").collect()
    val b = Cdc.applyLog(snap, l.repartition(2), "k", Seq("name", "price"))
      .orderBy($"k").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }
}
