package graft

import graft.ops.Scd2
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def dim0 = Scd2.init(
    Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00")),
      (2L, "silver", ts("2024-01-01 00:00:00")),
      (3L, "gold", ts("2024-01-02 00:00:00"))
    ).toDF("user_id", "tier", "since"),
    "user_id", Seq("tier"), "since")

  test("init opens one current version per key") {
    val rows = dim0.as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r._4.isEmpty && r._5))
  }

  test("changed keys close and reopen; unchanged and untouched keys stay open; new keys insert") {
    val updates = Seq(
      (1L, "silver", ts("2024-02-01 00:00:00"), 1L), // change
      (2L, "silver", ts("2024-02-01 00:00:00"), 2L), // same attrs -> no-op
      (9L, "bronze", ts("2024-02-02 00:00:00"), 3L)  // new key
    ).toDF("user_id", "tier", "ts", "update_id")
    val out = Scd2.apply(dim0, updates, "user_id", Seq("tier"), "ts", "update_id")
      .orderBy($"user_id", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00")), false),
      (1L, "silver", ts("2024-02-01 00:00:00"), None, true),
      (2L, "silver", ts("2024-01-01 00:00:00"), None, true),
      (3L, "gold", ts("2024-01-02 00:00:00"), None, true),
      (9L, "bronze", ts("2024-02-02 00:00:00"), None, true)))
  }

  test("two sequential batches build a 3-version history; closed rows pass through") {
    val b1 = Seq((1L, "silver", ts("2024-02-01 00:00:00"), 1L))
      .toDF("user_id", "tier", "ts", "update_id")
    val b2 = Seq((1L, "gold", ts("2024-03-01 00:00:00"), 1L))
      .toDF("user_id", "tier", "ts", "update_id")
    val out = Scd2.apply(Scd2.apply(dim0, b1, "user_id", Seq("tier"), "ts", "update_id"),
        b2, "user_id", Seq("tier"), "ts", "update_id")
      .where($"user_id" === 1L).orderBy($"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(out.map(_._2) == Seq("bronze", "silver", "gold"))
    assert(out.map(_._4) == Seq(
      Some(ts("2024-02-01 00:00:00")), Some(ts("2024-03-01 00:00:00")), None))
    assert(out.map(_._5) == Seq(false, false, true))
    // intervals tile: each valid_to equals the next valid_from
    assert(out(0)._4.contains(out(1)._3) && out(1)._4.contains(out(2)._3))
  }

  test("multiple updates for a key in one batch collapse to the latest by (ts, tieBreak)") {
    val updates = Seq(
      (1L, "silver", ts("2024-02-01 00:00:00"), 1L),
      (1L, "gold", ts("2024-02-05 00:00:00"), 1L), // latest ts wins
      (2L, "gold", ts("2024-02-01 00:00:00"), 1L),
      (2L, "platinum", ts("2024-02-01 00:00:00"), 2L) // ts tie -> larger tieBreak
    ).toDF("user_id", "tier", "ts", "update_id")
    val out = Scd2.apply(dim0, updates, "user_id", Seq("tier"), "ts", "update_id")
      .where($"is_current" && $"user_id".isin(1L, 2L))
      .orderBy($"user_id").as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSeq
    assert(out.map(_._2) == Seq("gold", "platinum"))
  }

  test("an out-of-order update fails loudly instead of corrupting intervals") {
    val updates = Seq((3L, "silver", ts("2024-01-01 00:00:00"), 1L)) // before 3's valid_from
      .toDF("user_id", "tier", "ts", "update_id")
    val err = intercept[Exception] {
      Scd2.apply(dim0, updates, "user_id", Seq("tier"), "ts", "update_id").collect()
    }
    assert(err.getMessage.contains("Scd2") || err.getMessage.contains("precedes"),
      err.getMessage)
  }

  test("asOfJoin against the version table recovers each fact's in-effect version") {
    // the integration the Scaladoc promises: because versions TILE
    // (each valid_to == next valid_from, one open row per key), the
    // most-recent-valid_from-at-or-before lookup IS the interval
    // lookup — no between-join needed
    val b1 = Seq((1L, "silver", ts("2024-02-01 00:00:00"), 1L))
      .toDF("user_id", "tier", "ts", "update_id")
    val b2 = Seq((1L, "gold", ts("2024-03-01 00:00:00"), 1L))
      .toDF("user_id", "tier", "ts", "update_id")
    val versions = graft.ops.Scd2.apply(
      graft.ops.Scd2.apply(dim0, b1, "user_id", Seq("tier"), "ts", "update_id"),
      b2, "user_id", Seq("tier"), "ts", "update_id")
    val facts = Seq(
      (100L, 1L, ts("2024-01-15 00:00:00")), // bronze era
      (101L, 1L, ts("2024-02-01 00:00:00")), // boundary: silver opens AT this ts
      (102L, 1L, ts("2024-02-15 00:00:00")), // silver era
      (103L, 1L, ts("2024-06-01 00:00:00")) // open gold version
    ).toDF("order_id", "user_id", "order_ts")
    val joined = graft.ops.Joins.asOfJoin(
        facts, versions.select($"user_id", $"tier", $"valid_from", $"is_current"),
        Seq("user_id"), "order_ts", "valid_from", "tier", Seq("tier"))
      .orderBy($"order_id")
      .select($"order_id", $"tier").as[(Long, String)].collect().toSeq
    assert(joined == Seq(
      (100L, "bronze"), (101L, "silver"), (102L, "silver"), (103L, "gold")))
  }

  test("a NULL update timestamp fails loudly instead of being silently ignored") {
    val updates = Seq((1L, "silver", null.asInstanceOf[Timestamp], 1L))
      .toDF("user_id", "tier", "ts", "update_id")
    val err = intercept[Exception] {
      Scd2.apply(dim0, updates, "user_id", Seq("tier"), "ts", "update_id").collect()
    }
    assert(err.getMessage.contains("NULL ts"), err.getMessage)
  }

  test("pointInTime attaches the version valid AT each fact ts (boundaries to the new version)") {
    // user 1: bronze [01-01, 02-01) -> silver [02-01, open)
    val b1 = Seq((1L, "silver", ts("2024-02-01 00:00:00"), 1L))
      .toDF("user_id", "tier", "ts", "update_id")
    val dim = Scd2.apply(dim0, b1, "user_id", Seq("tier"), "ts", "update_id")
    val facts = Seq(
      (10L, 1L, ts("2024-01-15 00:00:00")), // inside v1
      (11L, 1L, ts("2024-02-01 00:00:00")), // boundary: belongs to v2
      (12L, 1L, ts("2024-03-01 00:00:00")), // open version
      (13L, 1L, ts("2023-12-01 00:00:00")), // before first version -> NULL
      (14L, 7L, ts("2024-03-01 00:00:00"))  // unknown key -> NULL
    ).toDF("fact_id", "user_id", "fts")
    val got = Scd2.pointInTime(facts, dim, "user_id", "fts", Seq("tier"))
      .select($"fact_id", $"tier").as[(Long, Option[String])].collect().toMap
    assert(got == Map(10L -> Some("bronze"), 11L -> Some("silver"),
      12L -> Some("silver"), 13L -> None, 14L -> None))
  }

  test("pointInTime in a dimension gap yields NULL, never the stale previous version") {
    // hand-built non-contiguous dim: v1 [01-01, 01-10), v2 [02-01, open)
    val dim = Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-01-10 00:00:00")), false),
      (1L, "silver", ts("2024-02-01 00:00:00"), Option.empty[Timestamp], true)
    ).toDF("user_id", "tier", "valid_from", "valid_to", "is_current")
    val facts = Seq((10L, 1L, ts("2024-01-20 00:00:00"))).toDF("fact_id", "user_id", "fts")
    val got = Scd2.pointInTime(facts, dim, "user_id", "fts", Seq("tier"))
      .select($"fact_id", $"tier").as[(Long, Option[String])].collect()
    assert(got.toSeq == Seq((10L, None)))
  }

  test("pointInTime zero-width versions lose the boundary to their successor") {
    // an update at exactly the open row's valid_from makes v1 [t, t)
    val dim = Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 00:00:00")), false),
      (1L, "silver", ts("2024-01-01 00:00:00"), Option.empty[Timestamp], true)
    ).toDF("user_id", "tier", "valid_from", "valid_to", "is_current")
    val facts = Seq((10L, 1L, ts("2024-01-01 00:00:00"))).toDF("fact_id", "user_id", "fts")
    val got = Scd2.pointInTime(facts, dim, "user_id", "fts", Seq("tier"))
      .select($"fact_id", $"tier").as[(Long, Option[String])].collect()
    assert(got.toSeq == Seq((10L, Some("silver"))))
  }

  test("NULL attrs compare with null-safe equality (no phantom versions)") {
    val d = Scd2.init(Seq((1L, null.asInstanceOf[String], ts("2024-01-01 00:00:00")))
      .toDF("user_id", "tier", "since"), "user_id", Seq("tier"), "since")
    val updates = Seq((1L, null.asInstanceOf[String], ts("2024-02-01 00:00:00"), 1L))
      .toDF("user_id", "tier", "ts", "update_id")
    val out = Scd2.apply(d, updates, "user_id", Seq("tier"), "ts", "update_id").collect()
    assert(out.length == 1, "NULL == NULL attrs must be a no-op") // still one open row
  }
}
