package graft

import java.sql.Timestamp
import graft.ops.Journeys
import org.apache.spark.sql.functions._

class JourneysSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  // u1: days 1,1,3  u2: days 2,5  u3: day 3 only
  private def events = Seq(
    (1L, 1L, ts(1, 8), "view"),
    (2L, 1L, ts(1, 9), "click"),
    (3L, 1L, ts(3), "purchase"),
    (4L, 2L, ts(2), "view"),
    (5L, 2L, ts(5), "view"),
    (6L, 3L, ts(3), "signup")
  ).toDF("event_id", "user_id", "ts", "event_type")

  test("cohortRetention counts distinct users per cohort x period") {
    val got = Journeys.cohortRetention(events, "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (d, p, n) => (d.toString, p, n) }.toSet
    assert(got == Set(
      ("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L), // u1
      ("2024-01-02", 0, 1L), ("2024-01-02", 3, 1L), // u2
      ("2024-01-03", 0, 1L)                         // u3
    ))
  }

  test("period 0 counts each user once however many day-0 events") {
    val got = Journeys.cohortRetention(events, "user_id", "ts")
      .where($"cohort_day" === "2024-01-01" && $"period" === 0)
      .select($"n_users").as[Long].head()
    assert(got == 1L) // u1 has two events on day 1
  }

  test("transitions counts ordered pairs per user, drops stream tails") {
    val got = Journeys.transitions(events, "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("view", "click", 1L),     // u1
      ("click", "purchase", 1L), // u1
      ("view", "view", 1L)       // u2; u3 has no next event
    ))
  }

  test("transitions breaks ts ties by the tie column") {
    val tied = Seq(
      (10L, 9L, ts(1), "a"),
      (11L, 9L, ts(1), "b"),
      (12L, 9L, ts(1), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Journeys.transitions(tied, "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("b", "c", 1L)))
  }

  // funnel fixture: u1 completes view→click→purchase in order;
  // u2 clicks BEFORE viewing (fails step 2); u3 views only
  private def funnelEvents = Seq(
    (1L, 1L, ts(1), "view"),
    (2L, 1L, ts(2), "click"),
    (3L, 1L, ts(3), "purchase"),
    (4L, 2L, ts(2), "click"),
    (5L, 2L, ts(3), "view"),
    (6L, 3L, ts(1), "view")
  ).toDF("event_id", "user_id", "ts", "event_type")

  test("eventFunnel counts strictly-ordered first-touch completions") {
    val got = Journeys.eventFunnel(funnelEvents, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("eventFunnel same-instant step does not count (strict after)") {
    val burst = Seq(
      (1L, 9L, ts(1), "view"),
      (2L, 9L, ts(1), "click") // same timestamp as the view
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Journeys.eventFunnel(burst, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .as[(Int, String, Long)].collect()
      .map { case (step, _, n) => step -> n }.toMap
    assert(got == Map(1 -> 1L, 2 -> 0L))
  }

  test("eventFunnel conversion window bounds from the STEP-1 time") {
    // u5: view day 1, click day 3, purchase day 5 — a 3-day window
    // from t1 admits the click (t1+2d) but not the purchase (t1+4d)
    val span = Seq(
      (1L, 5L, ts(1), "view"),
      (2L, 5L, ts(3), "click"),
      (3L, 5L, ts(5), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Journeys.eventFunnel(span, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSec = Some(3L * 24 * 3600))
      .as[(Int, String, Long)].collect()
      .map { case (step, _, n) => step -> n }.toMap
    assert(got == Map(1 -> 1L, 2 -> 1L, 3 -> 0L))
  }

  test("eventFunnel rejects repeated step types loudly") {
    intercept[IllegalArgumentException] {
      Journeys.eventFunnel(funnelEvents, "user_id", "ts", "event_type",
        Seq("view", "view"))
    }
  }
}
