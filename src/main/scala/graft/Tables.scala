package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. All engine
  * operators take `DataFrame => DataFrame` so they are source-agnostic;
  * these helpers are the only place paths are constructed. At cluster
  * scale the same call reads a partitioned directory instead of a
  * single file — nothing else changes.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.ts` has shipped in two parquet encodings across driver
    * testdata generations: TIMESTAMP(NANOS) (which Spark 4 refuses
    * to read as a timestamp — read nanos as long, floor-truncate to
    * micros, matching DuckDB's nanos→micros cast) and plain
    * TIMESTAMP(MICROS) (read natively as NTZ). Both normalize to a
    * session-TZ TIMESTAMP column (session TZ is pinned UTC, so the
    * NTZ→LTZ cast is value-identity) — downstream operators and the
    * correctness oracle see one stable type either way. The legacy
    * conf is restored after schema resolution so the loader doesn't
    * permanently change how OTHER nanos parquet reads behave in the
    * session (scan execution uses the schema resolved here, not the
    * live conf). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = table(spark, sfDir, "events")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
