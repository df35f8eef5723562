package graft.streaming

import graft.ops.Cdc
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming CDC apply — the `foreachBatch` loop that keeps a keyed
  * snapshot current against a change feed, completing the streaming
  * half of the CDC triangle the way `StreamScd2` does for versioned
  * dimensions. Each micro-batch's per-key winner (the shared
  * `Cdc.winners` guard: unknown ops raise, NULL seq raises, equal
  * max seq within a batch raises) merges into a SEQ-AWARE state:
  * alongside the payload, the state keeps `__seq` (the last applied
  * sequence per key) and `__deleted` (a tombstone — a delete must
  * outlive its key, or a late lower-seq upsert would resurrect it).
  *
  * A batch entry wins only when its seq EXCEEDS the stored one, so:
  *  - **at-least-once redelivery is a no-op** — a replayed entry
  *    (same seq) never re-applies, whether it arrives in a replayed
  *    micro-batch or duplicated into a fresh one;
  *  - **cross-batch disorder is absorbed** — a late entry older than
  *    what was applied is ignored, exactly as the whole-log batch
  *    `Cdc.applyLog` would ignore it;
  *  - hence streamed state ≡ `applyLog` of the concatenated log for
  *    ANY split of the feed into batches, any batch order that
  *    delivers each key's max-seq entry eventually, and any
  *    duplication (StreamCdcSpec proves batch ≡ streamed ≡ shuffled
  *    + redelivered). Exact duplicates within one batch collapse
  *    before the ambiguity guard (redelivery is not ambiguity; two
  *    DIFFERENT entries at one seq still raise).
  *
  * State layout: `statePath/gen=N` parquet generations, the
  * `StreamScd2` storage contract — batch B reads the newest
  * generation ≤ B and writes B+1, so a replayed micro-batch rereads
  * its original input state and rewrites its own generation
  * idempotently; readers always see a complete generation. Keep the
  * stream's checkpoint; `prune` drops old generations.
  *
  * At 100 TB: the merge is one keyed aggregate over the (small)
  * batch + one full-outer join against the snapshot on the same key
  * — |batch| + |snapshot| per batch, independent of history, and the
  * snapshot side bucketed by key makes the join exchange-free (the
  * `Cdc.applyLog` scale note). Tombstones are retention: age them
  * out once the feed's disorder horizon has passed.
  */
object StreamCdc {

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

  /** Write the initial snapshot as generation 0. Bootstrap rows carry
    * a NULL `__seq` (= before every log entry: any feed entry for the
    * key wins) and no tombstone. */
  def bootstrap(snapshot: DataFrame, statePath: String, key: String,
                payloadCols: Seq[String]): Unit =
    snapshot.select((col(key) +: payloadCols.map(col)): _*)
      .withColumn("__seq", lit(null).cast("long"))
      .withColumn("__deleted", lit(false))
      .write.mode("overwrite").parquet(s"$statePath/gen=0")

  /** The current visible snapshot (tombstones dropped, state columns
    * stripped) — the streaming twin of `Cdc.applyLog`'s output. */
  def current(spark: SparkSession, statePath: String): DataFrame =
    currentState(spark, statePath).where(!col("__deleted"))
      .drop("__seq", "__deleted")

  /** The newest full state generation including tombstones. */
  def currentState(spark: SparkSession, statePath: String): DataFrame = {
    val gens = genDirs(spark, statePath)
    require(gens.nonEmpty, s"no CDC state under $statePath — bootstrap first")
    spark.read.parquet(gens.last._2)
  }

  private def currentBefore(spark: SparkSession, statePath: String, maxGen: Long): DataFrame = {
    val gens = genDirs(spark, statePath).filter(_._1 <= maxGen)
    require(gens.nonEmpty,
      s"no CDC state generation ≤ $maxGen under $statePath — bootstrap first, " +
        "and keep the stream's checkpoint (a fresh checkpoint restarts batch ids at 0)")
    spark.read.parquet(gens.last._2)
  }

  /** One batch of log entries merged into the seq-aware state —
    * package-private so the spec can drive it directly against the
    * batch `Cdc.applyLog`. */
  private[graft] def applyBatch(state: DataFrame, batch: DataFrame, key: String,
                                payloadCols: Seq[String], opCol: String,
                                seqCol: String): DataFrame = {
    // exact redelivered duplicates are not ambiguity — collapse them
    // before the shared winners guard (which still raises on two
    // DIFFERENT entries at one key's max seq)
    val w = Cdc.winners(batch.dropDuplicates(), key, payloadCols, opCol, seqCol)
    // the batch wins iff it has an entry whose seq exceeds what the
    // state already applied (NULL state seq = bootstrap = -infinity)
    val batchWins = col("c.__seq").isNotNull &&
      (col("s.__seq").isNull || col("c.__seq") > col("s.__seq"))
    state.as("s").join(w.as("c"), Seq(key), "full_outer")
      .select(
        col(key) +:
          (payloadCols.map(p =>
            when(batchWins, col(s"c.__w.__p.$p")).otherwise(col(s"s.$p")).as(p)) ++
            Seq(
              when(batchWins, col("c.__seq")).otherwise(col("s.__seq")).as("__seq"),
              when(batchWins, col("c.__w.__op") === "D")
                .otherwise(coalesce(col("s.__deleted"), lit(false))).as("__deleted"))): _*)
  }

  /** Attach the maintenance loop to a stream of (op, seq, key,
    * payload) entries. Start the returned writer (`.start()`);
    * trigger choice is the call site's (`AvailableNow` for run-once
    * incremental refresh, processing-time for continuous apply). */
  def maintain(updates: DataFrame, statePath: String, key: String,
               payloadCols: Seq[String], opCol: String = "op",
               seqCol: String = "seq"): DataStreamWriter[Row] =
    updates.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val next = applyBatch(currentBefore(spark, statePath, batchId), batch,
            key, payloadCols, opCol, seqCol)
          // fresh generation: never overwrites the directory it read
          next.write.mode("overwrite").parquet(s"$statePath/gen=${batchId + 1}")
        }
      }

  /** Drop all but the newest `keep` state generations. */
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
