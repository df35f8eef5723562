package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup detection — the production dedup shape: a
  * NEW batch of documents is checked against an EXISTING corpus
  * through a persisted index, without ever re-shingling or re-hashing
  * the corpus. (Corpus-wide dedup is `NearDup`; this operator is what
  * runs on every ingest tick once the corpus exists.)
  *
  * The index is two parquet tables under one root:
  *  - `<root>/bands`: (band, bucket, doc_id, n_shingles) — the LSH
  *    band table, the candidate-join side. At 100 TB this is the ONLY
  *    per-tick scan of corpus-derived data, and it's 4 longs per
  *    (doc × band) row regardless of document size.
  *  - `<root>/shingles`: (doc_id, hs, n_shingles) — the shingle-hash
  *    sets for exact verification, touched only for candidate doc_ids
  *    (a semi-join-shaped access, not a scan of the corpus text).
  *
  * Candidates = new-batch band rows equi-joined to stored band rows
  * on (band, bucket) + the exact length filter; verification = exact
  * Jaccard on the hash sets, same contract as `NearDup` (recall
  * 1−(1−t^r)^b from banding, then exact). New-batch-internal dups are
  * NOT this operator's job — run `NearDup` on the batch first, then
  * probe the corpus; `appendToIndex` admits the accepted batch so the
  * next tick sees it.
  *
  * No shingle-set clustering here: clustering pays when a dup-heavy
  * frame self-joins (NearDup.scala:77-84); the cross join here is
  * new × old, and the new batch is small by definition.
  */
object Incremental {

  /** Per-doc band table for a shingled frame — delegates to the one
    * canonical definition (`NearDup.bandTable`) so index candidates
    * and corpus-wide dedup candidates can never drift apart. */
  def bandTable(sh: DataFrame, k: Int = 96, b: Int = 24): DataFrame =
    NearDup.bandTable(sh, k, b)

  /** Build the index from a corpus: one shingling pass, then the band
    * table and the shingle store land under `root`. */
  def writeIndex(docs: DataFrame, textCol: String, n: Int, root: String,
                 k: Int = 96, b: Int = 24): Unit = {
    val sh = NearDup.shingled(docs, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      bandTable(sh, k, b).write.mode("overwrite").parquet(s"$root/bands")
      sh.select(col("doc_id"), col("hs"), col("n_shingles"))
        .write.mode("overwrite").parquet(s"$root/shingles")
    } finally sh.unpersist(blocking = false)
  }

  /** Admit an accepted batch into the index (append-only; the next
    * tick's probes see it). Idempotence is the caller's contract —
    * re-appending a batch double-registers its bands, which costs
    * duplicate candidates (dropped by the distinct) but never wrong
    * results. */
  def appendToIndex(docs: DataFrame, textCol: String, n: Int, root: String,
                    k: Int = 96, b: Int = 24): Unit = {
    val sh = NearDup.shingled(docs, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      bandTable(sh, k, b).write.mode("append").parquet(s"$root/bands")
      sh.select(col("doc_id"), col("hs"), col("n_shingles"))
        .write.mode("append").parquet(s"$root/shingles")
    } finally sh.unpersist(blocking = false)
  }

  /** Pure-frame form: probe `newDocs`' shingled frame against a band
    * table + shingle store (in-memory or read from an index). Output:
    * (new_id, old_id, common, jaccard) for every cross pair with
    * exact Jaccard ≥ threshold among banding candidates. */
  def nearDupsAgainstFrom(newSh: DataFrame, oldBands: DataFrame, oldSh: DataFrame,
                          threshold: Double, k: Int = 96, b: Int = 24): DataFrame = {
    val newBands = bandTable(newSh, k, b)
      .select(col("band"), col("bucket"), col("doc_id").as("new_id"), col("n_shingles").as("n_new"))
    val old = oldBands
      .select(col("band"), col("bucket"), col("doc_id").as("old_id"), col("n_shingles").as("n_old"))
    val cand = newBands.join(old, Seq("band", "bucket"))
      .where(col("n_old") >= ceil(col("n_new") * threshold) &&
        col("n_new") >= ceil(col("n_old") * threshold))
      .select(col("new_id"), col("old_id")).distinct()
    val s1 = newSh.select(col("doc_id").as("new_id"), col("hs").as("hs1"), col("n_shingles").as("n1"))
    val s2 = oldSh.select(col("doc_id").as("old_id"), col("hs").as("hs2"), col("n_shingles").as("n2"))
    cand.join(s1, Seq("new_id")).join(s2, Seq("old_id"))
      .withColumn("common", size(array_intersect(col("hs1"), col("hs2"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("new_id"), col("old_id"), col("common"), col("jaccard"))
  }

  /** Probe a PERSISTED index: shingle only the new batch, read the
    * stored band table for candidates and the stored shingle sets for
    * verification. */
  def nearDupsAgainstIndex(spark: SparkSession, root: String, newDocs: DataFrame,
                           textCol: String, n: Int, threshold: Double,
                           k: Int = 96, b: Int = 24): DataFrame = {
    val newSh = NearDup.shingled(newDocs, textCol, n)
    nearDupsAgainstFrom(newSh,
      spark.read.parquet(s"$root/bands"),
      spark.read.parquet(s"$root/shingles"),
      threshold, k, b)
  }
}
