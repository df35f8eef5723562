package graft

import graft.functions.Redact
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): (String, Int, Int, Int) = {
    val r = Seq(s).toDF("t")
      .select(Redact.redact($"t").as("red"), Redact.emailCount($"t").as("e"),
        Redact.ipv4Count($"t").as("i"), Redact.phoneCount($"t").as("p"))
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  test("emails, IPs, and phones are replaced with their tokens") {
    val (red, e, i, p) =
      redactOne("mail a.b-c_1@sub.example.org from 192.168.0.1 or call +62 812-3456-789 now")
    assert(red == "mail [EMAIL] from [IP] or call [PHONE] now")
    assert((e, i, p) == ((1, 1, 1)))
  }

  test("multiple occurrences all rewrite; counts are per-pattern on the original") {
    val (red, e, i, p) = redactOne("x@y.io and z@w.dev at 10.0.0.1 10.0.0.2")
    assert(red == "[EMAIL] and [EMAIL] at [IP] [IP]")
    assert((e, i, p) == ((2, 2, 0)))
  }

  test("clean text passes through untouched") {
    val s = "a plain sentence with version 1.2 and year 2024-01-01 intact"
    val (red, e, i, p) = redactOne(s)
    assert(red == s)
    assert((e, i, p) == ((0, 0, 0)))
  }

  test("dates and short numerics do not trip the phone heuristic") {
    val (red, _, _, p) = redactOne("meeting 2024-01-01 room 12 at 9 30")
    assert(p == 0, red)
  }
}
