package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // decoupled from cpus for memory-constrained runs: fewer
    // concurrent tasks but MORE (smaller) shuffle partitions is how a
    // real cluster sizes per-task aggregate state to its heap — with
    // partitions pinned = cpus, an 8-thread 2 GiB run at sf1 put 1/8
    // of a 6M-row aggregate in one task and died in the hash map
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // targeted-run filter (r11 verdict item #7 needs per-family sf10
    // measurements without paying the whole suite): a comma list of
    // query names; unset = full suite. Shared warmup stages whose
    // consumers are all filtered out are skipped too.
    val benchOnly: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // fail loud on unknown names (r12 advice): a typo'd filter used to
    // silently bench zero queries and publish a plausible-looking
    // artifact with total_sec 0 and n_failed 0
    benchOnly.foreach { only =>
      val unknown = only -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names ${unknown.toSeq.sorted.mkString(", ")} " +
          "are not SparkEntry.queries keys — fix the filter (names are exact)")
    }
    def stageNeeded(consumers: Set[String]): Boolean =
      benchOnly.forall(only => (only & consumers).nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (JVM/codegen/FS init, parquet reader, broadcast
    // + shuffle machinery) so the first query's time measures the
    // query, not executor startup: the first bench entry was absorbing
    // ~2 s of one-time infrastructure cost
    spark.range(1000).selectExpr("sum(id)").collect()
    val warm = spark.read.parquet(s"$sfDir/region.parquet")
    warm.join(org.apache.spark.sql.functions.broadcast(warm), Seq("r_regionkey"))
      .groupBy("r_regionkey").count().orderBy("r_regionkey").collect()
    // first-touch the remaining execution machinery (ObjectHashAggregate
    // via collect_list, window exec, sort-merge join) on tiny synthetic
    // data: these one-time costs (Janino infra, exec-node classloading)
    // otherwise land on whichever measured query happens to use the
    // machinery first — alphabetical order, not plan cost
    val w = spark.range(2000).selectExpr("id", "id % 7 as k", "cast(id % 100 as double) as v")
    w.groupBy("k")
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list("v")).as("vs"))
      .selectExpr("k", "size(vs) as n").collect()
    w.selectExpr("k", "v",
        "row_number() over (partition by k order by v, id) as rn",
        "lag(v, 1) over (partition by k order by v, id) as pv")
      .where("rn <= 3").collect()
    w.hint("merge").join(w.hint("merge"), Seq("k")).groupBy("k").count().collect()
    // warm the OS page cache for the dataset (a few tens of MB): the
    // host drops caches periodically, and a cold first read otherwise
    // charges multi-second disk latency to whichever query happens to
    // touch that table first
    // walks directories too: driver SFs ship single-file tables, the
    // GenScale sf1 ships multi-file `name.parquet/` directories
    def warmFiles(f: java.io.File): Unit =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .filter(c => c.isDirectory || c.getName.endsWith(".parquet"))
          .foreach(warmFiles)
      else {
        val in = new java.io.FileInputStream(f)
        val buf = new Array[Byte](1 << 20)
        try while (in.read(buf) != -1) {} finally in.close()
      }
    Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).foreach(warmFiles)
    // the near-dup block (q_dedup_pipeline / q_dup_components /
    // q_minhash_lsh / q_ngram_jaccard) shares ONE clustered-shingle
    // cache + its codegen: un-warmed, that one-time cost lands on
    // whichever of the four runs first in name order — which changes
    // every time a query is added, silently reshuffling per-query
    // times between rounds (r3's q_ivf_topk/q_distinct_stats
    // "regressions" were exactly this). Pay it here, ONCE, and report
    // it as its own JSON field instead of hiding it in a query.
    val tw = System.nanoTime()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal formatting (Locale.ROOT: no grouping/comma surprises):
    // at ~100 queries a full-precision line is ~3.6 KB and overflows the
    // harness's tail capture, which then fails to parse the JSON at all.
    // Millisecond resolution is far below run-to-run noise anyway.
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // ---- contention canary (r12 verdict item #3): the committed
    // BENCH_r12.json shipped a ~1.4× uniformly-inflated total with
    // "contended":false because the absolute total cutoff below sits
    // ~1.9× above the clean total and the spread signal lives only in
    // variance mode. The canary is a FIXED, SF-independent CPU job
    // (a codegen'd hash-sum over spark.range — no IO, no shuffle)
    // sampled at start / middle / end of the measured window:
    //   - its cross-sample SPREAD catches bursty load (one slow
    //     minute inflates one sample);
    //   - its RATIO against a committed quiet-host reference
    //     (BENCH_CANARY_REF.json) catches UNIFORM load, which spread
    //     alone is structurally blind to — a busy-loop running beside
    //     the whole bench inflates all three samples equally.
    // Each sample is a min-of-2 (drops one-off GC/JIT hits). The
    // decision is the pure `canaryVerdict` below, spec-proven.
    def canarySample(): Double = {
      def once(): Double = timed {
        // pmod keeps the ANSI sum far from Long overflow (600M × <1e3)
        spark.range(600000000L)
          .select(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.xxhash64(
                org.apache.spark.sql.functions.col("id")),
              org.apache.spark.sql.functions.lit(1000L))))
          .collect()
      }
      math.min(once(), once())
    }
    canarySample() // codegen/JIT warm for the canary job itself
    // ---- I/O-side probe (r15, r14 verdict item #2): the CPU canary
    // is structurally blind to I/O-side load — the committed r14
    // artifact shipped a ~20% uniformly-inflated total with the
    // canary reading quiet because the contention was filesystem-
    // side. The probe is a FIXED, SF-independent filesystem job:
    // write 8 MiB to the local tmp filesystem, fsync it, read it
    // back, delete — the same page-cache + block-layer path the
    // bench's shuffle/checkpoint blocks and parquet reads ride.
    // Sampled beside each canary sample (start/mid/end of the
    // measured window), min-of-2 per sample; judged by RATIO against
    // a committed quiet-host reference (BENCH_CANARY_REF.json gains
    // an io_sec field; same host-cores fingerprint gate, same env
    // override SPARK_GRAFT_IO_REF). The combined verdict publishes
    // as `run_class` so an inflated run flags ITSELF in the artifact
    // instead of being diagnosed two rounds later.
    def ioProbeSample(): Double = {
      def once(): Double = timed {
        val p = java.nio.file.Files.createTempFile("graft-io-probe", ".bin")
        try {
          val ch = java.nio.channels.FileChannel.open(p,
            java.nio.file.StandardOpenOption.WRITE)
          try {
            val chunk = java.nio.ByteBuffer.allocate(1 << 20)
            var i = 0
            while (i < 8) { chunk.clear(); ch.write(chunk); i += 1 }
            ch.force(true)
          } finally ch.close()
          val in = java.nio.file.Files.newInputStream(p)
          val buf = new Array[Byte](1 << 20)
          try while (in.read(buf) != -1) {} finally in.close()
        } finally java.nio.file.Files.deleteIfExists(p)
      }
      math.min(once(), once())
    }
    ioProbeSample() // first-touch warm (tmpfs metadata, JIT)
    val ioRef: Option[Double] = {
      val fromEnv = sys.env.get("SPARK_GRAFT_IO_REF")
        .flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
      def fromFile(p: String): Option[Double] =
        scala.util.Try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p)), "UTF-8")
          val sec = """"io_sec"\s*:\s*([0-9.]+)""".r.findFirstMatchIn(txt)
            .map(_.group(1).toDouble)
          val refCores = """"host_cores"\s*:\s*([0-9]+)""".r.findFirstMatchIn(txt)
            .map(_.group(1).toInt)
          if (refCores.exists(_ != Runtime.getRuntime.availableProcessors())) None
          else sec
        }.toOption.flatten
      fromEnv.orElse(fromFile("BENCH_CANARY_REF.json"))
        .orElse(fromFile("/root/repo/BENCH_CANARY_REF.json"))
    }
    val ioTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    // 2.0: fsync/page-cache latency is far noisier than the CPU job
    // (quiet-host samples spread ~1.5×); the measured I/O-inflation
    // incident class is 3-10× on this probe. Judged on the MIN like
    // the canary: one clean sample proves the filesystem CAN run at
    // reference speed.
    def ioVerdict(): (Option[Double], Boolean) = {
      val ratio = ioRef.filter(_ > 0).flatMap(r =>
        ioTimes.reduceOption(_ min _).map(_ / r))
      (ratio, ratio.exists(_ > 2.0))
    }
    def ioJson(): String = {
      val (ratio, flag) = ioVerdict()
      val refS = ioRef.map(f3).getOrElse("null")
      val ratioS = ratio.map(f3).getOrElse("null")
      s"""{"times":[${ioTimes.map(f3).mkString(",")}],"ref":$refS,"ratio":$ratioS,"flag":$flag}"""
    }
    // the run's self-classification: which side of the machine was
    // loaded during the measured window (r14 verdict item #2)
    def runClass(cpuFlag: Boolean): String = {
      val io = ioVerdict()._2
      if (cpuFlag && io) "loaded"
      else if (cpuFlag) "cpu_loaded"
      else if (io) "io_loaded"
      else "quiet"
    }
    val canaryRef: Option[Double] = {
      val fromEnv = sys.env.get("SPARK_GRAFT_CANARY_REF")
        .flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
      // the committed reference is HOST-SPECIFIC (calibrated at
      // local[32] on the round host): on a slower or smaller machine
      // every run would trip the 1.25 ratio and silently drop to a
      // single pass (r13 advice). The file carries a host fingerprint
      // (core count); on mismatch the file ref is IGNORED — a foreign
      // host opts in explicitly via SPARK_GRAFT_CANARY_REF. The chosen
      // ref source is always logged so an artifact reader can tell
      // which calibration the contended flag was judged against.
      def fromFile(p: String): Option[Double] =
        scala.util.Try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p)), "UTF-8")
          val sec = """"canary_sec"\s*:\s*([0-9.]+)""".r.findFirstMatchIn(txt)
            .map(_.group(1).toDouble)
          val refCores = """"host_cores"\s*:\s*([0-9]+)""".r.findFirstMatchIn(txt)
            .map(_.group(1).toInt)
          val hostCores = Runtime.getRuntime.availableProcessors()
          if (refCores.exists(_ != hostCores)) {
            System.err.println(s"BENCH canary: ref file $p calibrated for " +
              s"${refCores.get} cores, host has $hostCores — IGNORING file ref " +
              "(set SPARK_GRAFT_CANARY_REF to opt in on this host)")
            None
          } else sec
        }.toOption.flatten
      val chosen = fromEnv.map(v => ("env SPARK_GRAFT_CANARY_REF", v))
        .orElse(fromFile("BENCH_CANARY_REF.json").map(("BENCH_CANARY_REF.json", _)))
        .orElse(fromFile("/root/repo/BENCH_CANARY_REF.json")
          .map(("/root/repo/BENCH_CANARY_REF.json", _)))
      chosen match {
        case Some((src, v)) =>
          System.err.println(s"BENCH canary: reference ${f3(v)} s from $src")
        case None =>
          System.err.println("BENCH canary: no usable reference — ratio verdict disabled")
      }
      chosen.map(_._2)
    }
    val canaryTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def canaryJson(): String = {
      val (spread, ratio, flag) = canaryVerdict(canaryTimes.toSeq, canaryRef)
      val refS = canaryRef.map(f3).getOrElse("null")
      val ratioS = ratio.map(f3).getOrElse("null")
      s"""{"times":[${canaryTimes.map(f3).mkString(",")}],"spread":${f3(spread)},"ref":$refS,"ratio":$ratioS,"flag":$flag}"""
    }
    // per-stage PEAK-ish storage footprint (MB in memory / on disk of
    // every persisted or checkpointed block after the stage): the sf1
    // memory-governance run (r9 verdict item #4) needs the resident
    // cost of each shared memo to be reproducible from artifacts, not
    // re-measured by hand. getRDDStorageInfo covers cached DataFrames
    // AND localCheckpoint blocks — exactly the memo classes.
    def storageNow(): (Double, Double) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum / 1e6, infos.map(_.diskSize).sum / 1e6)
    }
    val neardupConsumers = Set("q_minhash_lsh", "q_ngram_jaccard", "q_dedup_pipeline",
      "q_dup_components", "q_dedup_weights", "q_leak_split", "q_survivorship",
      "q_dedup_exact", "q_substring_dedup", "q_semdedup")
    val graphConsumers = Set("q_pagerank", "q_trustrank", "q_bfs", "q_sssp", "q_hits",
      "q_kcore", "q_triangles", "q_clustering", "q_modularity", "q_assortativity",
      "q_adamic_adar", "q_adamic_adar_capped", "q_adamic_adar_capstats",
      "q_degree_dist", "q_conductance", "q_labelprop", "q_hyperball",
      "q_harmonic")
    val lpaConsumers = Set("q_labelprop", "q_modularity", "q_conductance")
    val wNearDup = if (!stageNeeded(neardupConsumers)) 0.0 else timed {
      SparkEntry.queries("q_minhash_lsh")(spark, sfDir).count()
      // the shared document clustering (5 consumers: components /
      // pipeline / leak-split / survivorship / dedup-weights) — the
      // component loop cost paid once, here
      graft.operators.NearDup.documentClusters(spark, sfDir).count()
    }
    val sNearDup = storageNow()
    // the graph family shares three cached edge frames the same way
    // (ops/Graphs.scala) — build them here so the one-time distinct +
    // persist cost is this reported field, not whichever of the 13
    // graph queries happens to run first in name order
    val wGraphs = if (!stageNeeded(graphConsumers)) 0.0 else timed {
      graft.ops.Graphs.bipartite(spark, sfDir).count()
      graft.ops.Graphs.bipartiteQuarter(spark, sfDir).count()
      graft.ops.Graphs.coocQuarter(spark, sfDir).count()
    }
    val sGraphs = storageNow()
    // the shared LPA partition (q_labelprop + q_modularity +
    // q_conductance) is cached the same way — pay the 3 synchronous
    // rounds here, once
    val wLpa = if (!stageNeeded(lpaConsumers)) 0.0
      else timed(graft.ops.Graphs.labelsBipartite(spark, sfDir).count())
    val sLpa = storageNow()
    // ...and the DBSCAN labeling (q_dbscan): its star-contraction
    // loop was the suite's single most expensive per-query cost
    // (8.8 s, r8 verdict item #5) for a deterministic rebuildable
    // partition — pay it once here too. Per-stage times ride the
    // detailed JSON line (`warmup_detail`) because the sf1 run showed
    // warmup_shared growing 26.7 → 118.7 s and an unbroken total
    // can't say WHICH shared artifact grew.
    val wDbscan = if (!stageNeeded(Set("q_dbscan"))) 0.0
      else timed(graft.ops.Graphs.dbscanCustomerGrid(spark, sfDir).count())
    val sDbscan = storageNow()
    // the persisted IVF-PQ index build (r12 verdict item #5): the
    // linear build cost is a REPORTED warmup row, so q_ivfpq_indexed
    // measures the directory-pruned PROBE — the production read path —
    // while q_ivfpq_topk stays registered as the fused build+probe
    // receipt
    val wIvfpq = if (!stageNeeded(Set("q_ivfpq_indexed", "q_ivfpq_layout"))) 0.0
      else timed {
        val emb = graft.Tables.embeddings(spark, sfDir)
        val mdl = graft.operators.ProductQuantizer.model(emb, m = 4, k = 16)
        graft.operators.Similarity.ivfPqIndexFor(spark, sfDir, emb, nLists = 8, mdl)
      }
    val warmShared = (System.nanoTime() - tw) / 1e9
    canaryTimes += canarySample() // start-of-window canary sample
    ioTimes += ioProbeSample()
    // cumulative storage (mem, disk) MB after each warmup stage rides
    // the detail object: the DELTA between stages is that memo's
    // resident footprint, and a scale table can read it from the
    // artifact instead of re-instrumenting (r9 verdict item #7)
    def s2(p: (Double, Double)): String = s"""[${f3(p._1)},${f3(p._2)}]"""
    val wdJson = s"""{"neardup":${f3(wNearDup)},"graphs":${f3(wGraphs)},"lpa":${f3(wLpa)},"dbscan":${f3(wDbscan)},"ivfpq":${f3(wIvfpq)},"storage_mb_after":{"neardup":${s2(sNearDup)},"graphs":${s2(sGraphs)},"lpa":${s2(sLpa)},"dbscan":${s2(sDbscan)}}}"""
    // regime tags (r9 verdict item #8): the two-regime receipt pairs,
    // so a scale-table reader can group a deliberately-degenerate
    // reference instance with its production twin instead of
    // mis-grading the receipt as a defect. Queries without a tag are
    // plain production paths.
    val regimeTagsRaw = Map(
      "q_embed_neardup" -> "degenerate-reference",
      "q_embed_neardup_hi" -> "production-twin",
      "q_interval_join" -> "degenerate-reference",
      "q_interval_join_user" -> "production-twin",
      // the per-key sequential recurrences and their skew-proof
      // chunked-scan twins (r10): sequential stays registered as the
      // bit-exact/simple contract, chunked is the form that survives
      // a hot key
      "q_cusum" -> "sequential-reference",
      "q_cusum_chunked" -> "production-twin",
      "q_ewma" -> "sequential-reference",
      "q_ewma_chunked" -> "production-twin",
      "q_holt" -> "sequential-reference",
      "q_holt_chunked" -> "production-twin",
      // r13 verdict item #1: the fused IVF-PQ build+probe stays
      // registered as the BUILD-COST receipt (its 195 s sf10 row was
      // half the pin headline) now that q_ivfpq_indexed measures the
      // production probe with the build priced as warmup_detail.ivfpq
      "q_ivfpq_topk" -> "build-reference",
      "q_ivfpq_indexed" -> "production-twin",
      // ...and the exact Adamic-Adar is the REFUSAL receipt: its
      // wedge-volume guard trips by design at sf10 (781M wedges), so
      // its -1 must publish as a receipt refusal, not an engine
      // failure — the capped twin is the production path
      "q_adamic_adar" -> "refusal-reference",
      "q_adamic_adar_capped" -> "production-twin")
    def regimesJsonFor(present: String => Boolean): String =
      regimeTagsRaw.filter { case (k, _) => present(k) }.toSeq.sorted
        .map { case (k, v) => s"\"$k\":\"$v\"" }.mkString("{", ",", "}")
    // detonation-receipt set (r11 what's-wrong #3): the deliberately-
    // degenerate reference instances prove a LAW (a scaling regime),
    // not a throughput — so they are measured and published per-query
    // but EXCLUDED from the headline total (reported under
    // receipt_total_sec) and, in variance mode, run once instead of
    // N times (a receipt needs no error bar; the sf1 one costs 59 s
    // per pass). Their production twins stay in the headline.
    // …the sequential recurrence forms joined the receipt set in r13
    // (r12 what's-wrong #5): they are deliberately-sequential reference
    // instances whose chunked production twins sit beside them in the
    // headline — under the 20%-hot skew twin the sequential forms cost
    // 10-23× while the chunked twins hold 1.0-1.9×, so leaving them in
    // the engine total made the skew headline measure the receipts.
    val receiptSet = regimeTagsRaw.collect {
      case (k, "degenerate-reference") => k
      case (k, "sequential-reference") => k
      case (k, "build-reference") => k
      case (k, "refusal-reference") => k }.toSet
    // per-query resource metrics (r11 verdict item #4): shuffle bytes
    // read/written, spilled bytes, and peak per-task execution memory
    // via one SparkListener. These are DETERMINISTIC where wall time
    // has a measured 17% spread on this host — a plan regression
    // shows as a bytes delta even on a noisy minute. The listener bus
    // is drained before each snapshot (async events would otherwise
    // bleed across query boundaries).
    val qm = new QueryMetrics
    spark.sparkContext.addSparkListener(qm)
    // driver-JVM GC wall-time attribution (r13 verdict item #2): the
    // in-suite "aged-heap tax" (q_vad 5.96 s in-suite vs 0.84 s in a
    // fresh JVM at sf1) was diagnosed as heap aging but never
    // QUANTIFIED per row — gc_sec is the collector time that elapsed
    // inside each query's measured window, so a stats reader can see
    // how much of a late-suite row is collector, not plan
    def gcMillisNow(): Long = {
      val it = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.iterator()
      var s = 0L
      while (it.hasNext) { val t = it.next().getCollectionTime; if (t > 0) s += t }
      s
    }
    def measured(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean, Seq[Double], Double) = {
      org.apache.spark.GraftSparkShim.drainListeners(spark.sparkContext)
      val before = qm.counters()
      qm.resetPeak()
      val gc0 = gcMillisNow()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case t: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillisNow() - gc0) / 1e3
      org.apache.spark.GraftSparkShim.drainListeners(spark.sparkContext)
      val after = qm.counters()
      val mb = after.zip(before).map { case (a, b) => (a - b) / 1e6 } :+ qm.peak() / 1e6
      (sec, ok, mb, gcSec)
    }
    // deterministic name order: Map iteration order shifts whenever a
    // query is added, silently reassigning shared first-touch costs
    // (page-cache, codegen, the near-dup shingle cache) to a different
    // query and making rounds incomparable
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => benchOnly.forall(_.contains(name)) }
    def onePass(): Seq[(String, Double, Boolean)] =
      qlist.map { case (name, fn) =>
        val (sec, ok, _, _) = measured(name, fn)
        (name, sec, ok)
      }
    // two passes, per-query MIN: transient host-level contention (a
    // measured failure mode — see SCALE_NOTES' bench-validity caveat:
    // identical code has produced 72 s and 283 s totals minutes apart)
    // rarely hits the same query in both passes, so the min is the
    // plan's cost, not the scheduler's. Skip the second pass when the
    // first already ran far outside the normal band — the machine is
    // contended and doubling the wall time risks the harness timeout
    // more than it improves the numbers.
    // ---- variance mode (r10 verdict item #7): SPARK_GRAFT_BENCH_PASSES=N
    // (N>=2) runs N FULL passes and publishes per-query {median,
    // spread} alongside the min, so cross-round comparisons carry
    // their own error bars in the artifact instead of prose caveats
    // in SCALE_NOTES. Contention is judged by CROSS-PASS SPREAD (the
    // median of per-query relative spreads), which is scale-factor-
    // independent by construction — a legitimately heavier SF has
    // large times but small spreads; a contended host has large
    // spreads at any SF. This fixes the r10 what's-wrong #2: the
    // total-based cutoff below is calibrated for the driver's sf0.1
    // runs and mislabels a clean sf1 run "contended" just for being
    // big. The total cutoff stays for the driver's default 2-pass
    // mode, where wall-clock budget forbids N full passes.
    val variancePasses = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption).filter(_ >= 2)
    if (variancePasses.isDefined) {
      val n = variancePasses.get
      // QUERY-MAJOR pass order (r11 what's-wrong #1): all N runs of a
      // query back-to-back, so its spread measures the QUERY (JIT/GC/
      // plan-level variance) rather than which minute of the suite
      // the pass happened to land in — pass-major runs separated the
      // samples by whole-suite durations, and a single slow minute
      // spiked one pass of many adjacent sub-second queries at once.
      // Receipts run ONCE (no error bar needed; excluded from totals
      // and the spread pool — see receiptSet above).
      val midIdx = qlist.size / 2
      val stats = qlist.zipWithIndex.map { case ((name, fn), idx) =>
        if (idx == midIdx && idx > 0) {
          canaryTimes += canarySample(); ioTimes += ioProbeSample()
        }
        val isReceipt = receiptSet(name)
        val attempts = if (isReceipt) 1 else n
        val runs = (1 to attempts).map(_ => measured(name, fn))
        val oksChrono = runs.collect { case (t, true, _, _) => t }
        // gc seconds inside the same windows, kept chronological so
        // the warm-run selection below can align with oksChrono
        val gcChrono = runs.collect { case (_, true, _, g) => g }
        // query-major consequence, measured on the first converted
        // run: each query's FIRST run carries its one-time cost
        // (codegen, page-cache first touch) back-to-back with warm
        // runs, so a raw (max-min)/median conflates warm-up with
        // variance (spread_median 0.49 on a quiet host). The MIN
        // keeps every run; median/spread are computed over the WARM
        // runs (first success dropped when >=2 successes remain) —
        // back-to-back warm runs on a quiet host are tight, so the
        // contention judgment measures the host again, not the JIT.
        val warm = (if (oksChrono.size >= 3) oksChrono.drop(1) else oksChrono).sorted
        val med = if (warm.isEmpty) -1.0
          else if (warm.size % 2 == 1) warm(warm.size / 2)
          else (warm(warm.size / 2 - 1) + warm(warm.size / 2)) / 2.0
        val spread = if (warm.size < 2 || med <= 0) 0.0 else (warm.max - warm.min) / med
        // median gc_sec over the SAME warm runs the median column uses
        val gcWarm = (if (gcChrono.size >= 3) gcChrono.drop(1) else gcChrono).sorted
        val gcMed = if (gcWarm.isEmpty) -1.0
          else if (gcWarm.size % 2 == 1) gcWarm(gcWarm.size / 2)
          else (gcWarm(gcWarm.size / 2 - 1) + gcWarm(gcWarm.size / 2)) / 2.0
        // metrics from the first SUCCESSFUL run — shuffle/spill bytes
        // are plan-determined and stable across passes
        val met = runs.collectFirst { case (_, true, m, _) => m }
          .getOrElse(Seq(-1.0, -1.0, -1.0, -1.0))
        (name, if (oksChrono.isEmpty) -1.0 else oksChrono.min, med, spread, oksChrono,
          attempts, met, isReceipt, warm.size, gcMed)
      }
      sys.env.get("SPARK_GRAFT_BENCH_STATS_OUT").foreach { path =>
        val w = new java.io.PrintWriter(path)
        try stats.foreach { case (name, mn, med, spread, oks, _, met, isReceipt, _, gcMed) =>
          // times are CHRONOLOGICAL (first entry is the cold run);
          // gc_sec is the driver-JVM collector time inside the median
          // column's warm windows — subtract it to read the plan cost
          // of a late-suite row (the aged-heap tax, r13 item #2)
          w.println(s"""{"query":"$name","min":${f3(mn)},"median":${f3(med)},"spread":${f3(spread)},"gc_sec":${f3(gcMed)},"times":[${oks.map(f3).mkString(",")}],"receipt":$isReceipt,"shuffle_read_mb":${f3(met(0))},"shuffle_write_mb":${f3(met(1))},"spill_mb":${f3(met(2))},"peak_task_mem_mb":${f3(met(3))}}""")
        } finally w.close()
      }
      // spread pool: only non-receipt queries with >=2 WARM runs — a
      // single-sample spread is undefined, and counting it as 0.0
      // would bias the contention judgment toward 'clean' exactly
      // when failures are contention-correlated
      val spreads = stats
        .filter(r => r._3 > 0 && r._9 >= 2 && !r._8).map(_._4).sorted
      val spreadMed = if (spreads.isEmpty) 0.0
        else if (spreads.size % 2 == 1) spreads(spreads.size / 2)
        else (spreads(spreads.size / 2 - 1) + spreads(spreads.size / 2)) / 2.0
      canaryTimes += canarySample() // end-of-window canary sample
      ioTimes += ioProbeSample()
      // 0.25: clean same-host repeat passes measure 2-10% per-query
      // spread; the documented contended incidents were 1.5-4x on the
      // affected queries — 25% splits the regimes with wide margin.
      // The spread signal only gates at >= 3 passes: warm-run
      // dropping needs >= 3 successes, so a 2-pass run's spread is
      // cold-vs-warm (JIT, page cache) and flagged QUIET sf10 runs
      // contended (r12 and the first r13 pin run both carried that
      // misleading flag). The canary verdict ORs in (r12 verdict #3):
      // per-query spread is blind to UNIFORM load when every run of a
      // query lands in the same loaded window — the canary's
      // ratio-vs-reference sees it.
      val (_, _, canaryFlag) = canaryVerdict(canaryTimes.toSeq, canaryRef)
      val contended = (n >= 3 && spreadMed > 0.25) || canaryFlag
      val cls = runClass(canaryFlag)
      // a RECEIPT that refuses (the exact Adamic-Adar's by-design
      // wedge-volume trip at sf10) is not an engine failure: it
      // publishes under its own counter so a clean pin run reads
      // n_failed 0 (r13 verdict item #1). Real failures in receipts
      // still surface — the correctness gates replay every receipt
      // with an exact oracle at the SFs where it runs.
      val nFailed = stats.count(r => r._2 < 0 && !r._8)
      val nReceiptRefused = stats.count(r => r._2 < 0 && r._8)
      // a query that crashed in SOME passes but not all previously
      // published a clean min and left n_failed at 0 — the r11 advice
      // intermittent-failure class, now its own loud counter
      val nFlaky = stats.count(r => r._5.nonEmpty && r._5.size < r._6)
      val total = stats.filterNot(_._8).map(_._2).filter(_ >= 0).sum
      val receiptTotal = stats.filter(_._8).map(_._2).filter(_ >= 0).sum
      val totalMed = stats.filterNot(_._8).map(_._3).filter(_ >= 0).sum
      val qs = stats.map { case (name, mn, _, _, _, _, _, _, _, _) => s"\"$name\":${f3(mn)}" }
        .mkString("{", ",", "}")
      val regimesJson = regimesJsonFor(name => stats.exists(_._1 == name))
      println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_failed":$nFailed,"n_flaky":$nFlaky,"n_receipt_refused":$nReceiptRefused,"receipt_total_sec":${f3(receiptTotal)},"warmup_shared_sec":${f3(warmShared)},"warmup_detail":$wdJson,"passes":$n,"pass_order":"query-major","contended":$contended,"canary":${canaryJson()},"io_probe":${ioJson()},"run_class":"$cls","spread_median":${f3(spreadMed)},"total_median_sec":${f3(totalMed)},"regimes":$regimesJson,"queries":$qs,"sf":"$sfDir"}""")
      println(s"""{"total_sec":${f3(total)},"n_queries":${stats.size},"n_failed":$nFailed,"n_flaky":$nFlaky,"n_receipt_refused":$nReceiptRefused,"receipt_total_sec":${f3(receiptTotal)},"passes":$n,"contended":$contended,"run_class":"$cls","spread_median":${f3(spreadMed)},"warmup_shared_sec":${f3(warmShared)},"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    val pass1 = onePass()
    canaryTimes += canarySample() // mid-window canary sample
    ioTimes += ioProbeSample()
    val p1total = pass1.map(_._2).sum
    // the contention cutoff scales with the suite: the healthy band
    // is ~1 s/query (r6: 59 s / 117; r7: ~125 s / 172 two-pass), and
    // measured contended runs hit 2.4+ s/query — a fixed 150 s
    // stopped meaning "contended" once the suite passed 150 queries.
    // SPARK_GRAFT_BENCH_CUTOFF overrides it: the band is calibrated
    // for the driver's sf0.1 runs, and a legitimately-heavier SF
    // (the GenScale sf1 10× runs) would otherwise be mislabeled
    // "contended" just for being big
    // the env parse is loud-but-survivable: a malformed override must
    // not crash the whole bench after every query already ran (r9
    // advice) — warn and fall back to the computed cutoff instead
    val computedCutoff = math.max(150.0, pass1.size * 1.3)
    val cutoff = sys.env.get("SPARK_GRAFT_BENCH_CUTOFF") match {
      case None => computedCutoff
      case Some(s) => scala.util.Try(s.trim.toDouble).getOrElse {
        System.err.println(
          s"BENCH WARN: malformed SPARK_GRAFT_BENCH_CUTOFF='$s' — " +
            s"falling back to computed cutoff $computedCutoff")
        computedCutoff
      }
    }
    // the absolute cutoff catches gross (2x+) inflation; the canary
    // verdict catches the r12 failure mode — a uniform ~1.4x slowdown
    // that sails under an absolute bar calibrated at ~1.9x the clean
    // total (r12 verdict #3). Either signal skips the full second pass.
    val contendedSoFar = p1total >= cutoff ||
      canaryVerdict(canaryTimes.toSeq, canaryRef)._3
    val passes = if (contendedSoFar) 1 else 2
    var pass2Status: Map[String, Boolean] = Map.empty
    var pass2Total = -1.0
    val results =
      if (!contendedSoFar) {
        val p2 = onePass()
        pass2Total = p2.map(_._2).sum
        pass2Status = p2.map(r => r._1 -> r._3).toMap
        merge(pass1, p2.map(r => r._1 -> (r._2, r._3)).toMap)
      } else {
        // contended run: a full second pass risks the harness timeout,
        // but the published artifact was previously cold AND unflagged
        // (r7: 487.8 s published vs 194.3 s clean re-run). Flag it
        // loudly (`"contended":true` below) and spend a bounded slice
        // of the saved wall time re-running only the slowest ~20
        // queries — they dominate the total, so a min-of-2 there
        // recovers most of a clean second pass at ~1/10 the cost.
        // pass-1 FAILURES always join the re-run set (r9 advice): the
        // slow-20 pick was by pass-1 time including time-to-failure,
        // so a fast-failing query was never retried and published -1
        // even when a clean retry would have succeeded. Failures that
        // fail fast cost little to retry; ones that fail slow are in
        // the slow-20 anyway.
        val slow = (pass1.sortBy(-_._2).take(20).map(_._1) ++
          pass1.collect { case (name, _, false) => name }).toSet
        val p2 = pass1.collect { case (name, _, _) if slow(name) =>
          val t0 = System.nanoTime()
          val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
            catch { case _: Throwable => false }
          name -> ((System.nanoTime() - t0) / 1e9, ok)
        }.toMap
        pass2Status = p2.map { case (k, (_, ok)) => k -> ok }
        pass2Total = p2.values.map(_._1).sum // partial (slow-20 + failures)
        merge(pass1, p2)
      }
    canaryTimes += canarySample() // end-of-window canary sample
    ioTimes += ioProbeSample()
    val contended = contendedSoFar ||
      canaryVerdict(canaryTimes.toSeq, canaryRef)._3
    val cls = runClass(canaryVerdict(canaryTimes.toSeq, canaryRef)._3 || contendedSoFar)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // receipt refusals (the exact Adamic-Adar's by-design guard trip
    // at big SF) are not engine failures — own counter, see the
    // variance branch above
    val nFailed = results.count { case (k, v) => v < 0 && !receiptSet(k) }
    val nReceiptRefused = results.count { case (k, v) => v < 0 && receiptSet(k) }
    // intermittent failures (r11 advice): a query that failed in one
    // observed pass but succeeded in another publishes a clean min —
    // count it separately so the artifact cannot hide the class
    val nFlaky = pass1.count { case (name, _, ok1) =>
      pass2Status.get(name).exists(_ != ok1) }
    // failed queries publish -1 and contribute 0 to the total: a
    // duration can never be negative, so -1 is an unambiguous error
    // marker, and a gate artifact must not hide a failure class by
    // timing the throw (round-8 verdict, "what's wrong" #1)
    // receipts (deliberately-degenerate reference instances) are
    // excluded from the headline and reported under their own total —
    // the headline measures the engine, not the receipt (r11 #3)
    val total = results.collect {
      case (k, v) if v >= 0 && !receiptSet(k) => v }.sum
    val receiptTotal = results.collect {
      case (k, v) if v >= 0 && receiptSet(k) => v }.sum
    val regimesJson = regimesJsonFor(name => results.exists(_._1 == name))
    // pass2_partial disambiguates the field's two meanings (r13
    // advice): in the contended branch pass2_total_sec is a PARTIAL
    // total (slow-20 retries + failures only), in the clean branch a
    // full pass total — the marker says which without reading code
    val pass2Partial = contendedSoFar
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_failed":$nFailed,"n_flaky":$nFlaky,"n_receipt_refused":$nReceiptRefused,"receipt_total_sec":${f3(receiptTotal)},"warmup_shared_sec":${f3(warmShared)},"warmup_detail":$wdJson,"passes":$passes,"contended":$contended,"canary":${canaryJson()},"io_probe":${ioJson()},"run_class":"$cls","pass1_total_sec":${f3(p1total)},"pass2_total_sec":${f3(pass2Total)},"pass2_partial":$pass2Partial,"regimes":$regimesJson,"queries":$qs,"sf":"$sfDir"}""")
    // LAST line is a short (~110 B) self-contained summary: the
    // harness captures a bounded tail of stdout, and the ~2.5 KB
    // per-query line above has been truncated mid-line two rounds
    // running (BENCH_r04/r05 "parsed": null). A parser reading the
    // tail always finds this complete line; the detailed line stays
    // for humans and for tails wide enough to hold it. Deliberately
    // NOT keyed "metric":"total" — one line per metric name, so a
    // grep for the detailed line never double-counts.
    println(s"""{"total_sec":${f3(total)},"n_queries":${results.size},"n_failed":$nFailed,"n_flaky":$nFlaky,"n_receipt_refused":$nReceiptRefused,"receipt_total_sec":${f3(receiptTotal)},"passes":$passes,"contended":$contended,"run_class":"$cls","warmup_shared_sec":${f3(warmShared)},"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Pure contention decision from the canary samples (r12 verdict
    * item #3): `(spread, ratioOpt, flag)`.
    *
    * The FLAG is the ratio signal alone: `min(samples)/ref` against
    * the committed quiet-host reference (BENCH_CANARY_REF.json) —
    * min, not median, because one clean sample proves the host CAN
    * run at reference speed (attribution: a mid-run burst must not
    * read as a uniformly slow host). Threshold 1.25 splits quiet
    * (~1.0 ± JIT/thermal noise) from the ~1.4× uniformly-inflated
    * regime the r12 artifact shipped unflagged — measured on this
    * host: 10 busy-loop spinners → ratio 1.265, quiet → 1.04. No
    * reference ⇒ never a flag from this verdict (the absolute total
    * cutoff still catches gross inflation).
    *
    * `spread` = (max−min)/min publishes as a DIAGNOSTIC only. It was
    * originally a flag signal for bursty load, but the first quiet
    * full-suite run measured 0.61 spread from in-JVM AGING — the
    * canary runs inside the bench JVM, and after ~240 queries of
    * cached frames + codegen classes the same job runs ~1.5× slower
    * (0.454 → 0.730 s, monotone) with the host fully idle. Within
    * one JVM, aging and burst are indistinguishable by spread, so
    * spread cannot gate; mid-run bursts surface through the pass
    * totals (published per pass) and the cutoff instead. */
  def canaryVerdict(times: Seq[Double], ref: Option[Double])
      : (Double, Option[Double], Boolean) = {
    val spread =
      if (times.size < 2 || times.min <= 0) 0.0
      else (times.max - times.min) / times.min
    val ratio = ref.filter(_ > 0).flatMap(r =>
      times.reduceOption(_ min _).map(_ / r))
    (spread, ratio, ratio.exists(_ > 1.25))
  }

  /** Per-query resource metrics collector (r11 verdict item #4):
    * cumulative shuffle-read / shuffle-write / spilled bytes plus the
    * max per-task peak execution memory since the last reset. The
    * bench snapshots the counters around each query (after draining
    * the async listener bus — [[org.apache.spark.GraftSparkShim]])
    * and publishes the deltas beside the wall times: bytes are
    * plan-determined and reproducible where wall time carries the
    * host's 17% measured spread. */
  private final class QueryMetrics extends org.apache.spark.scheduler.SparkListener {
    private val sr = new java.util.concurrent.atomic.AtomicLong
    private val sw = new java.util.concurrent.atomic.AtomicLong
    private val sp = new java.util.concurrent.atomic.AtomicLong
    private val pk = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        sp.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        var cur = pk.get
        while (m.peakExecutionMemory > cur &&
          !pk.compareAndSet(cur, m.peakExecutionMemory)) cur = pk.get
      }
    }
    def counters(): Seq[Long] = Seq(sr.get, sw.get, sp.get)
    def resetPeak(): Unit = pk.set(0L)
    def peak(): Long = pk.get
  }

  /** Combine pass-1 measurements with a (possibly partial) second
    * pass: the published per-query value is the MIN over passes in
    * which the query SUCCEEDED; a pass where the query threw never
    * contributes its time-to-failure (the round-8 advice bug: a throw
    * in the contended re-run could publish an understated
    * min(pass1, timeToFailure) with no sign of the failure). A query
    * that succeeded in NO pass publishes -1.0 — the error marker the
    * summary lines count as `n_failed`. Pure and public so
    * BenchMergeSpec can prove all four ok/fail combinations. */
  def merge(pass1: Seq[(String, Double, Boolean)],
            pass2: Map[String, (Double, Boolean)]): Seq[(String, Double)] =
    pass1.map { case (name, t1, ok1) =>
      val cands = (if (ok1) Seq(t1) else Nil) ++
        pass2.get(name).collect { case (t2, true) => t2 }
      name -> (if (cands.isEmpty) -1.0 else cands.min)
    }
}
