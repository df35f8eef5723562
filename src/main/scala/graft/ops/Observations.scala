package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver-layer "observation" shaping: maps the driver's `events`
  * stream table onto the reference's flat weather record
  * (reference: dags/transform_raw_weather.py:36-58 builds the 17-col
  * flat record keyed by (location_id, timestamp)).
  *
  * Mapping: user_id → location_id, ts → timestamp, value → temp_c,
  * event_type → condition (the categorical "weather condition" analogue),
  * event_id → the insertion-order surrogate `_id` (reference keeps
  * MongoDB `_id` across stages, dags/transform_raw_weather.py:37 —
  * we use it as the explicit total order the reference gets implicitly
  * from insertion order).
  *
  * All functions are pure `DataFrame => DataFrame`, narrow (no shuffle),
  * and stay inside whole-stage codegen.
  */
object Observations {

  /** Time-bucket keys from a timestamp column (reference derives
    * date/hour/minute strings at dags/transform_raw_weather.py:38-41;
    * we standardize on numeric hour/minute per SURVEY §1.3). */
  def withTimeBuckets(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("obs_date", to_date(col(tsCol)))
      .withColumn("obs_hour", hour(col(tsCol)))
      .withColumn("obs_minute", minute(col(tsCol)))
      // 10-minute slot start (0,10,..,50) — the reference's fixed
      // minute grid (dags/daily_compile_weather.py:36-38)
      .withColumn("obs_slot", (minute(col(tsCol)) / 10).cast("int") * 10)

  /** events → flat observation frame (the O9 flatten analogue). */
  def fromEvents(events: DataFrame): DataFrame =
    withTimeBuckets(
      events.select(
        col("event_id").as("obs_id"),
        col("user_id").as("location_id"),
        col("ts"),
        col("value").as("temp_c"),
        col("event_type").as("condition"),
        // precip analogue: only 'purchase' events carry a precip
        // reading — exercises the reference's sum-over-sparse-metric
        // path (dags/daily_compile_weather.py:78)
        when(col("event_type") === "purchase", col("value")).as("precip_mm")
      )
    )

  /** O6 null/missing guard (reference drops docs with missing
    * location id, dags/transform_raw_weather.py:33-35). */
  def guardValid(df: DataFrame): DataFrame =
    df.where(col("location_id").isNotNull && col("ts").isNotNull)

  /** O7 future-row cutoff (reference: dags/fetch_weather.py:71-75). */
  def cutoffAfter(df: DataFrame, now: Column, tsCol: String = "ts"): DataFrame =
    df.where(col(tsCol) <= now)
}
