package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File sources for the raw-payload landing zone (SURVEY §2.1 S1/S2's
  * in-engine half).
  *
  * The reference's most-executed code path fetches weather payloads
  * over HTTP and lands them as raw documents; the HTTP fetch itself is
  * external ingest (out of engine scope), but everything from "a
  * directory of landed raw JSON payloads" onward is query-engine work:
  * schema-on-read, malformed-payload policy, API-error-document drop
  * (reference dags/fetch_weather.py:60-62 returns None on
  * `"error" in result`), and the flatten to the observation frame that
  * feeds `Pipelines.ingest`.
  *
  * Scale shape: the schema is EXPLICIT — no inference pass (inference
  * reads the whole landing dir once before the real scan; at 100 TB
  * that doubles the ingest I/O). PERMISSIVE mode routes undecodable
  * lines into a corrupt-record column instead of failing the batch or
  * silently dropping them (FAILFAST kills a 10⁹-file ingest for one
  * bad payload; DROPMALFORMED loses data without a trace). The
  * flatten is a narrow projection — no shuffle until `ingest`'s
  * anti-join.
  */
object Sources {

  /** Corrupt-record column name (kept explicit so callers can audit). */
  val CorruptCol = "_corrupt_record"

  /** Bronze landing schema — the reference's raw payload envelope
    * (created_at/fetch_method/location/current assembled at
    * dags/fetch_weather.py:77-84 and 124-135), plus the API error
    * envelope ({"error": {code, message}}) and the corrupt-record
    * sink column. */
  val bronzeSchema: StructType = StructType(Seq(
    StructField("created_at", StringType),
    StructField("fetch_method", StringType),
    StructField("error", StructType(Seq(
      StructField("code", LongType),
      StructField("message", StringType)))),
    StructField("location", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("lat", DoubleType),
      StructField("lon", DoubleType)))),
    StructField("current", StructType(Seq(
      StructField("obs_id", LongType),
      StructField("time", StringType),
      StructField("temp_c", DoubleType),
      StructField("condition", StringType),
      StructField("precip_mm", DoubleType)))),
    StructField(CorruptCol, StringType)
  ))

  /** Raw landing-dir read: every input line becomes a row — decodable
    * payloads under the bronze schema, undecodable ones with the
    * original text in `_corrupt_record` and nulls elsewhere. Use this
    * form to audit/quarantine bad payloads (cache before filtering on
    * the corrupt column alone — Spark refuses corrupt-column-only
    * queries straight off a JSON scan). */
  def landedJsonRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(bronzeSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(dir)

  /** Landing dir → observation frame for `Pipelines.ingest`: drops
    * malformed lines and API error documents (the reference's
    * error-doc drop), guards the join keys, and flattens the envelope
    * to the flat observation shape. `fetch_method` survives so the
    * caller can split the current/history legs for the discriminated
    * union, exactly as the two reference DAG paths do. */
  def landedJson(spark: SparkSession, dir: String): DataFrame =
    landedJsonRaw(spark, dir)
      .where(col(CorruptCol).isNull)  // malformed payloads out
      .where(col("error").isNull)     // API error docs out (fetch_weather.py:60-62)
      .select(
        col("current.obs_id").as("obs_id"),
        col("location.id").as("location_id"),
        // try_to_timestamp, NOT to_timestamp: a decodable payload with a
        // drifted time format must be quarantined like any other bad
        // row, not kill the batch (Spark 4 ANSI makes to_timestamp
        // THROW on parse failure — the FAILFAST behavior this module
        // exists to avoid)
        try_to_timestamp(col("current.time"),
          lit("yyyy-MM-dd HH:mm:ss")).as("ts"),
        col("current.temp_c").as("temp_c"),
        col("current.condition").as("condition"),
        col("current.precip_mm").as("precip_mm"),
        col("fetch_method"))
      // key guard: a payload without a location id or a PARSEABLE
      // timestamp can join nothing downstream (reference transform
      // drops these too)
      .where(col("location_id").isNotNull && col("ts").isNotNull)
}
