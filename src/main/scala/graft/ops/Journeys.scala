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
}
