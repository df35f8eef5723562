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
}
