package graft

import graft.streaming.StreamAsOf
import graft.streaming.StreamAsOf.{ProbeEvent, QuoteEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming as-of join (feature-store lookup): probes resolve to the
  * most recent at-or-before quote once the watermark passes them;
  * late arrivals on either side are evicted. Watermark delay in these
  * tests is 10 minutes; the operator watermark is the min over the
  * probe and quote streams. */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def collectMatches(name: String): Map[Long, (String, Option[Double], Option[String])] =
    spark.table(name).collect().map { r =>
      r.getAs[Long]("probe_id") -> ((
        r.getAs[Timestamp]("probe_ts").toString,
        Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue),
        Option(r.getAs[Timestamp]("quote_ts")).map(_.toString)))
    }.toMap

  test("probes finalize to the latest at-or-before quote when the watermark passes them") {
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[ProbeEvent]
    val quotes = MemoryStream[QuoteEvent]
    val query = StreamAsOf.asOfMatches(probes.toDS(), quotes.toDS())
      .writeStream.format("memory").queryName("asof1").outputMode("append").start()
    try {
      quotes.addData(QuoteEvent(1, ts("2024-01-01 05:00:00"), 1.0),
                     QuoteEvent(1, ts("2024-01-01 05:10:00"), 2.0))
      probes.addData(ProbeEvent(1, ts("2024-01-01 05:05:00"), 100),
                     ProbeEvent(1, ts("2024-01-01 05:15:00"), 101))
      query.processAllAvailable()
      // watermark still at epoch during batch 1 — nothing finalized yet
      assert(spark.table("asof1").isEmpty)

      // advance BOTH streams; wm -> min(06:30, 06:20) - 10min = 06:10
      quotes.addData(QuoteEvent(1, ts("2024-01-01 06:20:00"), 4.0))
      probes.addData(ProbeEvent(1, ts("2024-01-01 06:30:00"), 103))
      query.processAllAvailable()
      val m2 = collectMatches("asof1")
      assert(m2.keySet == Set(100L, 101L), m2)
      assert(m2(100L) == (("2024-01-01 05:05:00.0", Some(1.0), Some("2024-01-01 05:00:00.0"))))
      assert(m2(101L) == (("2024-01-01 05:15:00.0", Some(2.0), Some("2024-01-01 05:10:00.0"))))

      // advance again; probe 103 finalizes against the 06:20 quote,
      // which survived pruning as the floor
      quotes.addData(QuoteEvent(1, ts("2024-01-01 07:30:00"), 5.0))
      probes.addData(ProbeEvent(1, ts("2024-01-01 07:30:00"), 104))
      query.processAllAvailable()
      val m3 = collectMatches("asof1")
      assert(m3.keySet == Set(100L, 101L, 103L), m3)
      assert(m3(103L) == (("2024-01-01 06:30:00.0", Some(4.0), Some("2024-01-01 06:20:00.0"))))
    } finally query.stop()
  }

  test("late probes and late quotes are evicted; probes with no prior quote emit null") {
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[ProbeEvent]
    val quotes = MemoryStream[QuoteEvent]
    val query = StreamAsOf.asOfMatches(probes.toDS(), quotes.toDS())
      .writeStream.format("memory").queryName("asof2").outputMode("append").start()
    try {
      probes.addData(ProbeEvent(2, ts("2024-01-01 05:00:00"), 200))
      quotes.addData(QuoteEvent(2, ts("2024-01-01 05:00:00"), 0.5)) // ts == probe ts: counts (at-or-before)
      query.processAllAvailable()

      // advance; wm -> 06:40. probe 200 finalizes against the equal-ts quote
      probes.addData(ProbeEvent(2, ts("2024-01-01 07:00:00"), 201))
      quotes.addData(QuoteEvent(2, ts("2024-01-01 06:50:00"), 9.0))
      query.processAllAvailable()
      val m1 = collectMatches("asof2")
      assert(m1.keySet == Set(200L), m1)
      assert(m1(200L)._2 == Some(0.5))

      // LATE rows (below wm 06:40): probe 299 must never emit; quote
      // 8.8 must not become probe 201's answer
      probes.addData(ProbeEvent(2, ts("2024-01-01 05:30:00"), 299))
      quotes.addData(QuoteEvent(2, ts("2024-01-01 05:45:00"), 8.8))
      query.processAllAvailable()

      // advance; wm -> 08:50. probe 201 finalizes against 06:50/9.0
      probes.addData(ProbeEvent(2, ts("2024-01-01 09:00:00"), 202))
      quotes.addData(QuoteEvent(2, ts("2024-01-01 09:00:00"), 10.0))
      query.processAllAvailable()
      val m2 = collectMatches("asof2")
      assert(!m2.contains(299L), s"late probe emitted: $m2")
      assert(m2(201L) == (("2024-01-01 07:00:00.0", Some(9.0), Some("2024-01-01 06:50:00.0"))))
    } finally query.stop()
  }

  test("duplicate-(key, ts) quotes resolve to the largest value, not arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[ProbeEvent]
    val quotes = MemoryStream[QuoteEvent]
    val query = StreamAsOf.asOfMatches(probes.toDS(), quotes.toDS())
      .writeStream.format("memory").queryName("asof4").outputMode("append").start()
    try {
      quotes.addData(QuoteEvent(5, ts("2024-01-01 05:00:00"), 2.0),
                     QuoteEvent(5, ts("2024-01-01 05:00:00"), 1.0))
      probes.addData(ProbeEvent(5, ts("2024-01-01 05:30:00"), 500))
      query.processAllAvailable()
      probes.addData(ProbeEvent(5, ts("2024-01-01 07:00:00"), 501))
      quotes.addData(QuoteEvent(5, ts("2024-01-01 07:00:00"), 9.0))
      query.processAllAvailable()
      val m = collectMatches("asof4")
      assert(m(500L)._2 == Some(2.0), m) // max value, regardless of order
    } finally query.stop()
  }

  test("a probe with no quote at all on its key emits a null match") {
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[ProbeEvent]
    val quotes = MemoryStream[QuoteEvent]
    val query = StreamAsOf.asOfMatches(probes.toDS(), quotes.toDS())
      .writeStream.format("memory").queryName("asof3").outputMode("append").start()
    try {
      probes.addData(ProbeEvent(3, ts("2024-01-01 05:00:00"), 300))
      quotes.addData(QuoteEvent(4, ts("2024-01-01 05:00:00"), 1.0)) // different key
      query.processAllAvailable()
      probes.addData(ProbeEvent(3, ts("2024-01-01 07:00:00"), 301))
      quotes.addData(QuoteEvent(4, ts("2024-01-01 07:00:00"), 2.0))
      query.processAllAvailable()
      val m = collectMatches("asof3")
      assert(m(300L) == (("2024-01-01 05:00:00.0", None, None)))
    } finally query.stop()
  }
}
