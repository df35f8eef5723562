package graft

import graft.ops.InvertedIndex
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The persisted inverted-index layout claim, measured (the
  * IvfIndexSpec treatment): writing postings hash-bucketed by token
  * makes a 2-term query a partition-pruned scan reading ≤ 2 of the
  * nBuckets posting directories — not a full index scan with a
  * post-hoc filter — while every indexed query function returns
  * results identical to its in-memory twin. */
class PostingsIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
  private lazy val post = InvertedIndex.postings(docs, "doc_id", "text")

  /** All file scans in an EXECUTED plan, descending through the AQE
    * wrappers `collect` treats as leaves. */
  private def fileScans(q: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = {
      val self = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
      val below: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec        => Seq(s.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case other                    => other.children
      }
      self ++ below.flatMap(walk)
    }
    walk(q.queryExecution.executedPlan)
  }

  test("indexed conjunctive/phrase/bm25 equal their in-memory twins") {
    val path = Files.createTempDirectory("graft-post").toString + "/index"
    InvertedIndex.writePostings(post, path, nBuckets = 16)
    // pick two tokens guaranteed present: the two most frequent ones
    val Array(t1, t2) = post.groupBy($"token").agg(sum($"tf").as("n"))
      .orderBy($"n".desc, $"token").limit(2).select($"token").as[String].collect()

    val memAnd = InvertedIndex.conjunctive(post, Seq(t1, t2)).as[Long].collect().toSet
    val idxAnd = InvertedIndex.conjunctiveIndexed(spark, path, Seq(t1, t2))
      .as[Long].collect().toSet
    assert(memAnd == idxAnd && idxAnd.nonEmpty)

    val memPh = InvertedIndex.phrase(post, Seq(t1, t2)).as[(Long, Long)].collect().toMap
    val idxPh = InvertedIndex.phraseIndexed(spark, path, Seq(t1, t2))
      .as[(Long, Long)].collect().toMap
    assert(memPh == idxPh)

    // BM25 scores are BIT-equal: same scoring core, same statistics
    // (the sidecars persist exactly what bm25 computes in-memory)
    val memBm = InvertedIndex.bm25(post, Seq(t1, t2), k = 20).as[(Long, Double)].collect()
    val idxBm = InvertedIndex.bm25Indexed(spark, path, Seq(t1, t2), k = 20)
      .as[(Long, Double)].collect()
    assert(memBm.sameElements(idxBm) && memBm.nonEmpty)
  }

  test("a 2-term query reads only its terms' posting buckets (scan metrics)") {
    val path = Files.createTempDirectory("graft-post2").toString + "/index"
    val nBuckets = 16
    InvertedIndex.writePostings(post, path, nBuckets = nBuckets)

    // the index landed as one directory per token hash bucket
    val bucketDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("tok_bucket="))
    // hash buckets with no token land no directory — expect most, not all
    assert(bucketDirs.length > nBuckets / 2 && bucketDirs.length <= nBuckets,
      s"expected up to $nBuckets bucket dirs, got ${bucketDirs.length}")
    val totalFiles = bucketDirs.flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))

    val Array(t1, t2) = post.groupBy($"token").agg(sum($"tf").as("n"))
      .orderBy($"n".desc, $"token").limit(2).select($"token").as[String].collect()
    val q = InvertedIndex.conjunctiveIndexed(spark, path, Seq(t1, t2))
    assert(q.collect().nonEmpty)

    val indexScan = fileScans(q)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("graft-post2")))
      .getOrElse(fail("no index scan found in the executed plan"))
    val filesRead = indexScan.metrics("numFiles").value
    // exact cap: only the 2 terms' own bucket directories' files
    val termBuckets = Seq(t1, t2).map(t => graft.plans.Hash60Impl.hash(
      t.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % nBuckets).distinct
    val maxFiles = bucketDirs
      .filter(d => termBuckets.contains(d.getName.stripPrefix("tok_bucket=").toLong))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet")).toLong
    info(s"index files: $totalFiles; files read by 2-term query: $filesRead " +
      s"(cap $maxFiles from ${termBuckets.size} bucket dirs)")
    assert(filesRead > 0, "scan metric empty — inspected a plan that never ran")
    assert(filesRead <= maxFiles,
      s"query read $filesRead of $totalFiles files; expected <= $maxFiles (pruned to term buckets)")
    assert(filesRead < totalFiles, "query scanned the whole index — no pruning happened")
  }

  test("writePostings guards and meta round-trip") {
    intercept[IllegalArgumentException](
      InvertedIndex.writePostings(post, "/tmp/unused", nBuckets = 1))
    val path = Files.createTempDirectory("graft-post3").toString + "/index"
    InvertedIndex.writePostings(post.limit(0), path, nBuckets = 4)
    // empty corpus: meta row still exists with zero docs, reads are empty
    val meta = spark.read.parquet(path + ".meta").collect()(0)
    assert(meta.getAs[Long]("n_docs") == 0L)
    intercept[IllegalArgumentException](
      InvertedIndex.readPostings(spark, path, Seq.empty))
  }
}
