package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-dup ingest gate — the production loop composed from
  * the batch operators: every micro-batch is (1) deduped against
  * itself (keep the min-id canonical per near-dup cluster), (2)
  * probed against the PERSISTED corpus index and stripped of
  * anything near-duplicating stored content, (3) appended to the
  * clean corpus and admitted into the index so the NEXT tick sees it.
  *
  * Why foreachBatch and not a stateful streaming operator: the dedup
  * state is the corpus-scale band index — orders of magnitude beyond
  * executor state stores, already maintained incrementally on disk by
  * `Incremental`, and probed as an ordinary batch join. foreachBatch
  * is Structured Streaming's sanctioned bridge for exactly this
  * (micro-batch as DataFrame + transactional sink of your own).
  *
  * Failure semantics: a replayed micro-batch rewrites its OWN
  * partition of the clean corpus (dynamic partition overwrite keyed
  * by ingest_batch — idempotent), and re-appends its bands to the
  * index, which `Incremental.appendToIndex` documents as harmless
  * (duplicate candidates, dropped by the distinct; never wrong
  * results). So the pipeline is effectively-once on the corpus and
  * at-least-once on the index — the right asymmetry, since the index
  * is a pruning structure, not an answer.
  *
  * The caller must have initialized the index (`Incremental
  * .writeIndex`, empty corpus is fine) before starting the query, and
  * SHOULD pass a durable `checkpointLocation` — without one Spark
  * assigns a temp checkpoint deleted on stop, and a restarted query
  * re-reads the source from scratch under NEW batch ids, landing
  * duplicate partitions in the clean corpus (the replay-idempotence
  * story holds only when batch ids are stable across restarts).
  */
object StreamDedup {

  def dedupedIngest(docs: DataFrame, textCol: String, n: Int, threshold: Double,
                    indexRoot: String, cleanPath: String,
                    checkpointLocation: Option[String] = None): StreamingQuery = {
    val base = docs.writeStream
      .outputMode("append")
    checkpointLocation.foreach(base.option("checkpointLocation", _))
    base
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // (1) intra-batch: drop non-canonical members of near-dup clusters
          val losers = graft.operators.NearDup
            .minhashDuplicateClusters(b.toDF(), textCol, n, threshold)
            .where(!col("is_canonical")).select(col("doc_id"))
          val selfClean = b.toDF().join(losers, Seq("doc_id"), "left_anti")
          // (2) cross-corpus: drop anything near-duplicating the index
          val dupIds = graft.operators.Incremental
            .nearDupsAgainstIndex(spark, indexRoot, selfClean, textCol, n, threshold)
            .select(col("new_id").as("doc_id")).distinct()
          val clean = selfClean.join(dupIds, Seq("doc_id"), "left_anti")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // (3) idempotent corpus write (this batch replaces only its
            // own partition on replay), then admit into the index
            graft.sources.Sinks.upsertPartitions(
              clean.withColumn("ingest_batch", lit(batchId)), cleanPath, Seq("ingest_batch"))
            graft.operators.Incremental.appendToIndex(clean, textCol, n, indexRoot)
          } finally clean.unpersist(blocking = false)
        } finally b.unpersist(blocking = false)
      }
      .start()
  }
}
