package graft.streaming

import graft.ops.Scd2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Streaming SCD2 dimension maintenance: the `foreachBatch` loop
  * that turns a stream of key/attr updates into a versioned
  * dimension table — the streaming cousin of
  * `StreamingRecap.hourlyToGold` (ST6), for state that is VERSIONED
  * rather than re-emitted.
  *
  * State layout: `statePath/gen=N` parquet generations. Micro-batch
  * B reads the newest generation AT OR BELOW B, applies
  * `Scd2.apply`, and writes generation `B + 1` — a fresh directory,
  * never an in-place overwrite of anything it could have read (the
  * same no-read-your-own-overwrite rule `Sinks.compactTo` enforces).
  * Readers always see a complete generation (parquet commit is
  * atomic per directory); `current` resolves the newest one.
  *
  * Exactly-once: both the generation read and the generation written
  * are pure functions of the batch id, so a replayed micro-batch
  * re-reads the same pre-batch state and rewrites ITS OWN generation
  * idempotently — even when its failed first attempt already wrote
  * it. The stream's checkpoint must be kept (a fresh checkpoint
  * restarts batch ids at 0, below the existing state). Old
  * generations are retention, not garbage — `prune` drops all but
  * the newest k (time-travel for free until then; keep at least the
  * replay horizon).
  *
  * At 100 TB the per-batch full-dimension rewrite is the honest
  * cost of parquet-only storage (dimensions are orders of magnitude
  * smaller than facts; a merge-on-read table format amortizes this
  * further but is out of scope).
  */
object StreamScd2 {

  private def genDirs(spark: SparkSession, statePath: String): Seq[(Long, String)] = {
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(statePath)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(s => (s.getPath.getName.stripPrefix("gen=").toLong, s.getPath.toString))
      .sortBy(_._1)
  }

  /** Write the initial dimension state as generation 0. */
  def bootstrap(snapshot: DataFrame, statePath: String, key: String,
                attrCols: Seq[String], tsCol: String): Unit =
    Scd2.init(snapshot, key, attrCols, tsCol)
      .write.mode("overwrite").parquet(s"$statePath/gen=0")

  /** The newest dimension generation (bootstrap must have run). */
  def current(spark: SparkSession, statePath: String): DataFrame = {
    val gens = genDirs(spark, statePath)
    require(gens.nonEmpty, s"no dimension state under $statePath — bootstrap first")
    spark.read.parquet(gens.last._2)
  }

  /** The newest generation at or below `maxGen` — what a micro-batch
    * reads. Batch B reads gen ≤ B and writes gen B+1, so a REPLAYED
    * batch reads the same pre-B state it read the first time (never
    * the half-written generation its failed attempt left behind, and
    * never a directory it is about to overwrite — the self-overwrite
    * would otherwise fail Spark's cannot-read-and-overwrite check on
    * every retry, wedging the stream). */
  private def currentBefore(spark: SparkSession, statePath: String, maxGen: Long): DataFrame = {
    val gens = genDirs(spark, statePath).filter(_._1 <= maxGen)
    require(gens.nonEmpty,
      s"no dimension generation ≤ $maxGen under $statePath — bootstrap first, " +
        "and keep the stream's checkpoint (a fresh checkpoint restarts batch ids at 0)")
    spark.read.parquet(gens.last._2)
  }

  /** Attach the maintenance loop to a stream of updates. Start the
    * returned writer (`.start()`) to run it; choose the trigger at
    * the call site (`AvailableNow` for run-once incremental refresh,
    * a processing-time trigger sized so each batch's full-dimension
    * rewrite completes comfortably for continuous maintenance). */
  def maintain(updates: DataFrame, statePath: String, key: String,
               attrCols: Seq[String], tsCol: String, tieBreak: String): DataStreamWriter[Row] =
    updates.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val next = Scd2.apply(currentBefore(spark, statePath, batchId), batch,
            key, attrCols, tsCol, tieBreak)
          // fresh generation: never overwrites the directory it read
          next.write.mode("overwrite").parquet(s"$statePath/gen=${batchId + 1}")
        }
      }

  /** Drop all but the newest `keep` generations. */
  def prune(spark: SparkSession, statePath: String, keep: Int): Unit = {
    require(keep >= 1, "keep must be >= 1")
    val gens = genDirs(spark, statePath)
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    gens.dropRight(keep).foreach { case (_, dir) =>
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
  }
}
