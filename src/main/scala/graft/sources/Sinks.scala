package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parquet sinks with the reference's write semantics (SURVEY §2.1).
  *
  * The reference's sinks are MongoDB insert/upsert with unique-index
  * dup guards; the Spark-native equivalents:
  *  - S6 append           → `append`
  *  - S7 keyed upsert     → dynamic partition overwrite on the key's
  *    partition columns (idempotent re-runs of a day/location recap
  *    replace exactly that partition — reference
  *    dags/daily_compile_weather.py:136-142)
  *  - S8 unique-key guard → dropDuplicates before write (reference
  *    unique index + dup-key tolerance,
  *    dags/transform_raw_weather.py:66-76,107-111)
  *  - S9 truncate+reload  → `overwrite` (static)
  *
  * At 100 TB, partition columns are the pruning keys (date first,
  * then coarse location bucket); dynamic overwrite touches only the
  * partitions present in the incoming batch.
  */
object Sinks {

  /** S6 — append to a date-partitioned table. */
  def append(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** S7 — keyed upsert via dynamic partition overwrite: replaces only
    * the partitions present in `df`, leaving the rest of the table
    * untouched. Combined with S8 dedup this gives idempotent,
    * exactly-once-per-key output for re-runs. */
  def upsertPartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = conf.getOption(key)
    conf.set(key, "dynamic")
    try
      df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => conf.set(key, v)
      case None    => conf.unset(key)
    }
  }

  /** S8 — unique-key enforcement before write: keep the first row per
    * key by explicit order (never "arrival order", which has no
    * distributed meaning). */
  def enforceUnique(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame =
    graft.ops.Dedup.keepFirstAgg(df, keys, orderCol)

  /** S9 — truncate-and-reload (dimension seed). */
  def truncateReload(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Co-located (bucketed) layout — the 100 TB join strategy: pay the
    * shuffle ONCE at write time (`bucketBy` on the join/dedup key),
    * and every later equi-join or aggregation on that key reads
    * buckets pairwise with NO exchange. Two fact tables bucketed the
    * same way join shuffle-free at any size; `sortBy` additionally
    * lets sort-merge join skip its sort. BucketedJoinSpec asserts the
    * exchange-free plan. (Parquet path tables can't carry bucket
    * metadata, so this sink goes through the session catalog —
    * `saveAsTable` — which is where Spark records bucket specs.) */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Range-clustered layout — the 100 TB data-SKIPPING strategy for
    * range predicates (time travel, date slices, id ranges):
    * `repartitionByRange` + an in-partition sort give each output
    * file a narrow, near-disjoint min/max envelope on `col`, so
    * parquet row-group statistics let a range filter skip whole
    * files instead of scanning and discarding. Complements bucketing
    * (equi-join co-location) the way a sort index complements a hash
    * index. `nFiles` sizes the layout: at cluster scale pick
    * data_volume / target_file_size (e.g. 1 GiB files). */
  def writeRangeClustered(df: DataFrame, path: String, col: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(col))
      .sortWithinPartitions(col)
      .write.mode("overwrite").parquet(path)
}
