package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over an event stream: cohort retention and
  * event-to-event transition counts. Both are the standard product-
  * analytics queries the reference's event data
  * (`dags/fetch_weather.py` landing + Mongo collections) would feed
  * once a `user_id`/`ts` stream exists; here they are expressed as
  * two-shuffle aggregate plans that hold at any scale.
  */
object Journeys {

  /** Cohort retention: users are assigned to the day of their first
    * event (the cohort), and retention counts how many distinct
    * users of each cohort were active `period` days later.
    *
    * Plan shape: one aggregate per user for the cohort day (shuffle
    * by user, map-side partials), a shuffle-reuse join back to the
    * events on the SAME key (no extra exchange on the events side
    * beyond the one the join needs), then a count-distinct by
    * (cohort, period). No window, no driver loop; distinct-user
    * counting is the only expensive step and is exact by design —
    * swap in `approx_count_distinct` when a 2% answer is acceptable
    * at 100 TB.
    *
    * Output: cohort_day DATE, period INT (0 = cohort day itself),
    * n_users BIGINT.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstDay = events
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    events
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
      .join(firstDay, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).cast("int").as("period"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Event-type transition counts: for each user's event sequence in
    * (tsCol, tieCol) order, count (event_type -> next event_type)
    * pairs across the whole stream. The window is PARTITIONED by
    * user — each user's sequence sorts independently, so the plan is
    * one shuffle by user plus one hash aggregate; nothing global.
    * `tieCol` must make the per-user order total, same contract as
    * `Ids.globalRowNumber`.
    *
    * Output: from_type, to_type, n (BIGINT), sequences ending the
    * stream (no next event) are dropped.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(typeCol), col(tieCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Ordered event-sequence funnel: how many users completed step 1,
    * then step 2 STRICTLY AFTER their first step-1 event, then step 3
    * strictly after that, … — the standard product-analytics funnel
    * (signup → view → purchase), optionally bounded to a conversion
    * window of `windowSec` seconds from the user's step-1 time.
    *
    * Semantics (first-touch): t1 = min ts of a step-1 event;
    * t_k = min ts of a step-k event with ts > t_{k-1} (and, when the
    * window is set, ts <= t1 + windowSec). A user counts toward step
    * k iff t_k exists. Strict `>` means two steps cannot share one
    * timestamp — a same-instant A,B burst converts A but not B,
    * which is the convention that makes re-ordered duplicate
    * deliveries idempotent.
    *
    * Plan shape — k sequential keyed reductions, NOT per-user event
    * arrays: each step is a filter on its own event type (pushed to
    * the scan), an equi-join on the user key against the previous
    * step's one-row-per-user frame, and a min() aggregate on the
    * SAME key, so every stage after the first reuses the user-hash
    * partitioning and the frames shrink monotonically with each
    * step's drop-off. Per-user event counts never materialize in
    * memory — a power user with 10^7 events costs the same as anyone
    * else — which is what lets this run over a 100 TB event log.
    * k is the funnel length (3-5 in practice), so "k joins" is a
    * constant, not a data-sized loop.
    *
    * Output: step INT (1-based), step_name, n_users BIGINT — one row
    * per funnel step, monotonically non-increasing counts.
    */
  def eventFunnel(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  windowSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "eventFunnel: steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"eventFunnel: repeated step types not supported (got $steps) — " +
        "a repeated step would need per-occurrence sequencing, not first-touch min()")
    val u = col(userCol)
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("__t"))
      .withColumn("__t1", col("__t"))
    val frames = steps.tail.scanLeft(first) { (prev, step) =>
      val stepEvents = events.where(col(typeCol) === step)
        .select(u, col(tsCol))
      val bounded = windowSec match {
        case Some(w) =>
          // exact integer-microsecond bound — replays verbatim as
          // epoch_us() arithmetic in the cross-engine oracle
          stepEvents.join(prev.select(u, col("__t"), col("__t1")), Seq(userCol))
            .where(col(tsCol) > col("__t") &&
              unix_micros(col(tsCol)) <= unix_micros(col("__t1")) + lit(w * 1000000L))
        case None =>
          stepEvents.join(prev.select(u, col("__t"), col("__t1")), Seq(userCol))
            .where(col(tsCol) > col("__t"))
      }
      bounded.groupBy(u, col("__t1")).agg(min(col(tsCol)).as("__t"))
    }
    frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }
}
