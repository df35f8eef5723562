package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-shaping operators: explode, envelope assembly, discriminated
  * union (SURVEY §2.2 O5/O10, §2.7).
  */
object Shaping {

  /** O5 — explode an array column to one row per element, keeping
    * parent columns (reference: per-hour rows out of the history
    * payload's hourly array, dags/fetch_weather.py:67,73-85). */
  def explodeArray(df: DataFrame, arrayCol: String, as: String): DataFrame =
    df.withColumn(as, explode(col(arrayCol))).drop(arrayCol)

  /** O10 — envelope projection: wrap payload columns into a nested
    * struct and stamp batch metadata (reference builds
    * {created_at, dag_times, fetch_method, location, current} at
    * dags/fetch_weather.py:78-85). Pure narrow projection. */
  def envelope(df: DataFrame, payloadCols: Seq[String], batchStart: Column, batchEnd: Column, method: String): DataFrame =
    df.select(
      struct(payloadCols.map(col): _*).as("payload"),
      struct(batchStart.as("start"), batchEnd.as("end")).as("batch_window"),
      lit(method).as("fetch_method")
    )

  /** §2.7 — discriminated union of two source frames (reference:
    * current + history paths both append to raw_weather with a
    * fetch_method discriminator, dags/fetch_weather.py:81,126).
    * unionByName tolerates column order differences; allowMissing
    * stays false — schema drift should fail loudly. */
  def discriminatedUnion(a: DataFrame, aTag: String, b: DataFrame, bTag: String): DataFrame =
    a.withColumn("fetch_method", lit(aTag))
      .unionByName(b.withColumn("fetch_method", lit(bTag)))
}
