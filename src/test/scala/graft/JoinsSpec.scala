package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  // left: queries at t; right: quotes at t with a payload
  private def leftDf = Seq(
    (1L, "a", 100L), // after both a-quotes
    (2L, "a", 55L),  // between the two
    (3L, "a", 10L),  // exactly ON the first quote's ts (inclusive)
    (4L, "a", 5L),   // before any quote -> null
    (5L, "b", 50L),  // key with no quotes at all -> null
    (6L, "c", 70L)   // tie-break case: two c-quotes share ts=70
  ).toDF("qid", "k", "t")

  private def rightDf = Seq(
    ("a", 10L, 101L, 1.0),
    ("a", 60L, 102L, 2.0),
    ("c", 70L, 103L, 3.0),
    ("c", 70L, 104L, 4.0) // same ts, larger id -> wins the tie
  ).toDF("k", "t", "quote_id", "px")

  test("asOfJoin: most recent at-or-before per key, ties by largest tieBreak") {
    val out = Joins.asOfJoin(leftDf, rightDf, Seq("k"),
        leftTs = "t", rightTs = "t", tieBreak = "quote_id",
        payload = Seq("quote_id", "px"))
      .select($"qid", $"quote_id", $"px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out(1L) == ((Some(102L), Some(2.0))))  // latest a-quote
    assert(out(2L) == ((Some(101L), Some(1.0))))  // only the first is <= 55
    assert(out(3L) == ((Some(101L), Some(1.0))))  // equal ts is inclusive
    assert(out(4L) == ((None, None)))             // nothing before
    assert(out(5L) == ((None, None)))             // key absent from right
    assert(out(6L) == ((Some(104L), Some(4.0))))  // tie -> max quote_id
  }

  test("asOfJoin rejects __-prefixed user columns (reserved namespace)") {
    val l = Seq((1L, "a", 1L)).toDF("qid", "k", "t").withColumn("__x", lit(1))
    intercept[IllegalArgumentException] {
      Joins.asOfJoin(l, rightDf, Seq("k"), "t", "t", "quote_id", Seq("px"))
    }
  }

  test("asOfJoin preserves every left row exactly once") {
    val out = Joins.asOfJoin(leftDf, rightDf, Seq("k"), "t", "t", "quote_id", Seq("px"))
    assert(out.count() == leftDf.count())
    assert(out.select($"qid").distinct().count() == leftDf.count())
  }

  test("rangeJoinByBucket equals the naive theta-join, across bucket widths") {
    val pts = (0L to 200L by 3L).map(p => (p, s"p$p")).toDF("x", "pname")
    val ivs = Seq(
      (1L, 0L, 10L), (2L, 5L, 6L), (3L, 50L, 120L), (4L, 200L, 200L), // empty
      (5L, 199L, 205L), (6L, 7L, 7L) // empty
    ).toDF("iv_id", "s", "e")
    val naive = pts.join(ivs, $"x" >= $"s" && $"x" < $"e")
      .select($"iv_id", $"x").orderBy($"iv_id", $"x")
    for (w <- Seq(1L, 4L, 64L, 1000L)) {
      val bucketed = Joins.rangeJoinByBucket(pts, ivs, "x", "s", "e", w)
        .select($"iv_id", $"x").orderBy($"iv_id", $"x")
      assert(bucketed.collect().toSeq == naive.collect().toSeq, s"bucketWidth=$w")
    }
  }

  test("rangeJoinByBucket: empty and inverted intervals match nothing") {
    val pts = Seq(Tuple1(5L)).toDF("x")
    val ivs = Seq((1L, 5L, 5L), (2L, 9L, 3L)).toDF("iv_id", "s", "e")
    assert(Joins.rangeJoinByBucket(pts, ivs, "x", "s", "e", 10L).count() == 0)
  }

  private def allMessages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("rangeJoinByBucket: an open-ended sentinel interval fails loudly, not OOM") {
    val pts = Seq(Tuple1(5L)).toDF("x")
    val ivs = Seq((1L, 0L, Long.MaxValue)).toDF("iv_id", "s", "e")
    val e = intercept[Throwable] {
      Joins.rangeJoinByBucket(pts, ivs, "x", "s", "e", 10L).collect()
    }
    assert(allMessages(e).contains("spans more than"), allMessages(e))
    // a deliberately raised cap admits the wide interval
    val wide = Seq((1L, 0L, 1000L)).toDF("iv_id", "s", "e")
    assert(Joins.rangeJoinByBucket(pts, wide, "x", "s", "e", 10L, maxReplication = 200L).count() == 1)
  }

  test("asOfJoin: duplicate (key, rightTs, tieBreak) right rows are rejected, not merge-order-resolved") {
    val dupRight = rightDf.unionByName(Seq(("c", 70L, 104L, 9.9)).toDF("k", "t", "quote_id", "px"))
    val e = intercept[Throwable] {
      Joins.asOfJoin(leftDf, dupRight, Seq("k"), "t", "t", "quote_id", Seq("quote_id", "px"))
        .collect()
    }
    assert(allMessages(e).contains("duplicate (key, t, quote_id)"), allMessages(e))
    // equal-ts rows with DISTINCT tie-breaks remain legal (the fixture
    // already has two c-quotes at ts=70) — only exact duplicates fail
    assert(Joins.asOfJoin(leftDf, rightDf, Seq("k"), "t", "t", "quote_id", Seq("px"))
      .count() == leftDf.count())
  }

  test("asOfJoin: duplicate right rows with NULL rightTs are caught too (null-safe guard)") {
    // null === null is null, so a null-unsafe guard would let these two
    // slip through and pick the payload by partition-merge order
    val right = Seq(
      ("a", Option.empty[Long], 1L, 1.0),
      ("a", Option.empty[Long], 1L, 2.0)
    ).toDF("k", "t", "quote_id", "px")
    val e = intercept[Throwable] {
      Joins.asOfJoin(leftDf, right, Seq("k"), "t", "t", "quote_id", Seq("px")).collect()
    }
    assert(allMessages(e).contains("duplicate (key, t, quote_id)"), allMessages(e))
  }

  test("intervalOverlapJoin: exactly-once pairs equal to brute force") {
    import spark.implicits._
    val a = Seq((1L, 0L, 50L), (2L, 40L, 60L), (3L, 100L, 101L))
      .toDF("aid", "a_start", "a_end")
    val b = Seq((10L, 45L, 55L), (20L, 49L, 120L), (30L, 200L, 210L))
      .toDF("bid", "b_start", "b_end")
    val got = graft.ops.Joins.intervalOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", bucketWidth = 7L)
      .select("aid", "bid", "overlap_start", "overlap_end")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // brute force
    val av = Seq((1L, 0L, 50L), (2L, 40L, 60L), (3L, 100L, 101L))
    val bv = Seq((10L, 45L, 55L), (20L, 49L, 120L), (30L, 200L, 210L))
    val brute = for {
      (ai, as_, ae) <- av; (bi, bs, be) <- bv
      if as_ < be && bs < ae
    } yield (ai, bi, math.max(as_, bs), math.min(ae, be))
    assert(got.sorted == brute.sorted)
    assert(got.size == got.distinct.size) // exactly once, no dup buckets
  }

  test("intervalOverlapJoin: bucket-width invariance and guards") {
    import spark.implicits._
    val a = (1L to 40L).map(i => (i, i * 3, i * 3 + 10)).toDF("aid", "a_start", "a_end")
    val b = (1L to 40L).map(i => (i + 100, i * 5, i * 5 + 4)).toDF("bid", "b_start", "b_end")
    def run(w: Long) = graft.ops.Joins.intervalOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", w)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(run(3L) == run(50L))
    intercept[IllegalArgumentException] {
      graft.ops.Joins.intervalOverlapJoin(a,
        b.withColumnRenamed("bid", "aid"), "a_start", "a_end", "b_start", "b_end", 5L)
    }
  }
}
