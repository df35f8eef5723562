package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — times individual queries / stages at a
  * given SF dir. Not part of the driver contract. */
object Profile {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    args.headOption.getOrElse("components") match {
      case "components" =>
        val docs = Tables.documents(spark, sfDir)
        val pairs = graft.operators.NearDup.minhashNearDupPairs(docs, "text", 3, 0.8)
        time("pairs.count")(pairs.count())
        time("pairs.count warm")(pairs.count())
        val clusters = graft.operators.Components.duplicateClusters(pairs)
        time("cc.count")(clusters.count())
        val pairs2 = graft.operators.NearDup.minhashNearDupPairs(docs, "text", 3, 0.8)
        time("cc.count warm")(graft.operators.Components.duplicateClusters(pairs2).count())
      case "recap" =>
        import graft.ops.{Observations, Recap}
        def obs = Observations.guardValid(Observations.fromEvents(Tables.events(spark, sfDir)))
        time("obs.count")(obs.count())
        time("slotFirst")(Recap.slotFirst(obs).count())
        time("hourly")(Recap.hourly(Recap.slotFirst(obs)).count())
        time("daily")(Recap.daily(Recap.hourly(Recap.slotFirst(obs))).count())
        time("nested q")(SparkEntry.queries("q_recap_nested")(spark, sfDir).count())
        time("nested q warm")(SparkEntry.queries("q_recap_nested")(spark, sfDir).count())
      case "jaccard" =>
        import graft.operators.NearDup
        val docs = Tables.documents(spark, sfDir)
        val sh = NearDup.shingled(docs, "text", 3)
        time("shingled")(sh.count())
        val cl = NearDup.clusteredSets(sh).persist()
        time("clusteredSets")(cl.count())
        time("jaccardFrom")(NearDup.jaccardPairsFrom(cl, 0.8).count())
        time("jaccardFrom warm")(NearDup.jaccardPairsFrom(cl, 0.8).count())
        time("minhashFrom")(NearDup.minhashNearDupPairsFrom(cl, 0.8).count())
        time("minhashFrom warm")(NearDup.minhashNearDupPairsFrom(cl, 0.8).count())
      case "ids" =>
        // global row numbering: the single-partition window vs the
        // bucketed two-pass, at 1x and 10x lineitem (shifted keys)
        import org.apache.spark.sql.expressions.Window
        def liN(n: Int) = {
          val base = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          (0 until n).map(i => base
            .withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L)))
            .reduce(_ unionByName _)
        }
        for (n <- Seq(1, 10, 50)) {
          val li = liN(n).persist()
          val rows = li.count()
          time(s"naive global window ${n}x ($rows rows)")(
            li.withColumn("rn", row_number().over(
                Window.orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))))
              .agg(sum(col("rn"))).collect())
          time(s"bucketed two-pass   ${n}x ($rows rows)")(
            graft.ops.Ids.globalRowNumber(li, "l_extendedprice",
                Seq("l_orderkey", "l_linenumber"), buckets = 64)
              .agg(sum(col("row_id"))).collect())
          li.unpersist()
        }

      case "fuzzyvol" =>
        // blocking selectivity: candidate volume vs the all-pairs
        // cross product, and verified-output size
        val parts = Tables.part(spark, sfDir)
        val n = parts.count()
        val dirty = parts.where(col("p_partkey") % 7 === 0)
          .select(col("p_partkey").as("dirty_id"),
            regexp_replace(col("p_name"), "e", "").as("dirty_name"))
        val nd = dirty.count()
        val blk = (t: org.apache.spark.sql.Column) => lower(t.substr(lit(1), lit(1)))
        val l = dirty.withColumn("__blk", blk(col("dirty_name")))
        val r = parts.withColumn("__blk", blk(col("p_name")))
        val cand = time("block-only candidate count")(l.join(r, "__blk").count())
        // the banded key FuzzyJoin.verify actually joins on (w = maxDist+1 = 3)
        val lBand = floor(length(col("dirty_name")) / lit(3)).cast("int")
        val lb = l.withColumn("__band", explode(array(lBand - 1, lBand, lBand + 1)))
        val rb = r.withColumn("__band", floor(length(col("p_name")) / lit(3)).cast("int"))
        val candB = time("banded candidate count")(lb.join(rb, Seq("__blk", "__band")).count())
        val out = time("verified output")(
          graft.ops.FuzzyJoin.pairs(dirty, parts, "dirty_id", "p_partkey",
            "dirty_name", "p_name", 2, blk).count())
        println(s"PROF all-pairs=${nd * n} candidates=$cand (${"%.1f".format(nd * n * 1.0 / cand)}x cut) " +
          s"banded=$candB (${"%.1f".format(nd * n * 1.0 / candB)}x cut) verified=$out")

        // wide-length variant: same corpus with deterministic padding
        // spreading lengths over ~60 chars (URL/title-shaped data) —
        // where the length band carries real selectivity
        val pad = repeat(lit("x"), (col("p_partkey") % 60).cast("int"))
        val partsW = parts.withColumn("p_name", concat(col("p_name"), pad))
        val dirtyW = dirty.join(parts.select("p_partkey"),
            col("dirty_id") === col("p_partkey"))
          .withColumn("dirty_name", concat(col("dirty_name"), pad))
          .select("dirty_id", "dirty_name")
        val lw = dirtyW.withColumn("__blk", blk(col("dirty_name")))
        val rw = partsW.withColumn("__blk", blk(col("p_name")))
        val candW = time("wide block-only candidates")(lw.join(rw, "__blk").count())
        val lBandW = floor(length(col("dirty_name")) / lit(3)).cast("int")
        val lbw = lw.withColumn("__band", explode(array(lBandW - 1, lBandW, lBandW + 1)))
        val rbw = rw.withColumn("__band", floor(length(col("p_name")) / lit(3)).cast("int"))
        val candBW = time("wide banded candidates")(lbw.join(rbw, Seq("__blk", "__band")).count())
        val outW = time("wide verified output")(
          graft.ops.FuzzyJoin.pairs(dirtyW, partsW, "dirty_id", "p_partkey",
            "dirty_name", "p_name", 2, blk).count())
        println(s"PROF wide: candidates=$candW banded=$candBW " +
          s"(${"%.1f".format(candW * 1.0 / candBW)}x band cut) verified=$outW")

        // skeleton-key blocking (the registered q_fuzzy_match key):
        // candidate volume vs verified output at 1x and 10x corpus —
        // the ratio is the wasted-verification factor; 1.0 means the
        // key admits only true pairs
        for (mult <- Seq(1, 10)) {
          val cat = if (mult == 1) parts
            else (0 until mult).map(i => parts
              .withColumn("p_partkey", col("p_partkey") + lit(i.toLong * 100000000L)))
              .reduce(_ unionByName _)
          val d = cat.where(col("p_partkey") % 7 === 0)
            .select(col("p_partkey").as("dirty_id"),
              regexp_replace(col("p_name"), "e", "").as("dirty_name"))
          val skel = graft.ops.FuzzyJoin.skeletonBlock _
          val ls = d.withColumn("__blk", skel(col("dirty_name")))
          val rs = cat.withColumn("__blk", skel(col("p_name")))
          val candS = time(s"skeleton candidates x$mult")(ls.join(rs, "__blk").count())
          val outS = time(s"skeleton verified x$mult")(
            graft.ops.FuzzyJoin.pairs(d, cat, "dirty_id", "p_partkey",
              "dirty_name", "p_name", 2, skel).count())
          println(s"PROF skeleton x$mult: candidates=$candS verified=$outS " +
            s"precision=${"%.3f".format(outS * 1.0 / candS)}")
        }

      case "sketch" =>
        // sketch builds at 1x / 10x lineitem: native floor-log2 vs
        // the string bin() form, and the stored-sketch payoff —
        // rollup over fine-grain sketch rows vs recomputing from raw
        import graft.operators.{PortableHll, QuantileSketch}
        def liN(n: Int) = {
          val base = Tables.lineitem(spark, sfDir)
            .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
              round(col("l_extendedprice") * 100).cast("long").as("cents"))
          (0 until n).map(i => base
            .withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L)))
            .reduce(_ unionByName _)
        }
        for (n <- Seq(1, 10, 80)) {
          val li = liN(n).persist()
          val rows = li.count()
          time(s"qsk build native ${n}x ($rows rows)")(
            QuantileSketch.build(li, Seq("l_returnflag"), "cents").count())
          time(s"qsk build native ${n}x warm")(
            QuantileSketch.build(li, Seq("l_returnflag"), "cents").count())
          // identical plan with the allocating string form of floor-log2
          def binstrBuild() = {
            val s = 5; val small = 1L << s
            li.select(col("l_returnflag"), col("cents").as("__v"))
              .withColumn("__b", (length(bin(col("__v"))) - lit(1)).cast("long"))
              .withColumn("bin", when(col("__v") < small, col("__v"))
                .otherwise((col("__b") - lit(s - 1)) * small +
                  (expr(s"shiftright(__v, cast(__b as int) - $s)") - small)))
              .groupBy(col("l_returnflag"), col("bin"))
              .agg(count(lit(1)).as("cnt"))
          }
          time(s"qsk build bin-str ${n}x")(binstrBuild().count())
          time(s"qsk build bin-str ${n}x warm")(binstrBuild().count())
          // stored-sketch rollup vs raw recompute (the artifact's point)
          val fine = QuantileSketch.build(li, Seq("l_returnflag", "l_linestatus"), "cents")
            .persist()
          fine.count()
          time(s"qsk rollup from stored ${n}x")(
            QuantileSketch.rollup(fine, Seq("l_returnflag")).count())
          time(s"hll registers ${n}x")(
            PortableHll.registers(li, Seq("l_returnflag"), "l_orderkey").count())
          val fineHll = PortableHll.registers(li, Seq("l_returnflag", "l_linestatus"), "l_orderkey")
            .persist()
          fineHll.count()
          time(s"hll rollup from stored ${n}x")(
            PortableHll.rollup(fineHll, Seq("l_returnflag")).count())
          fine.unpersist(); fineHll.unpersist(); li.unpersist()
        }

      case "ppl" =>
        // bigram-perplexity scaling: documents replicated with
        // shifted ids. Replication keeps the DISTINCT bigram space
        // constant, so the stats frames stay fixed-size while the
        // scoring stream grows n× — the design claim ("stats tables
        // track distinct content, not corpus rows") made visible.
        def docsN(n: Int) = {
          val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
          (0 until n).map(i => base
            .withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L)))
            .reduce(_ unionByName _)
        }
        for (n <- Seq(1, 10)) {
          val d = docsN(n).persist()
          val rows = d.count()
          // twice per size: the first run carries codegen/IO warm-up
          // (first-touch), the second is the comparable number
          for (tag <- Seq("cold", "warm"))
            time(s"bigramPerplexity ${n}x $tag ($rows docs)")(
              graft.ops.Vocab.bigramPerplexity(d, d.where(col("doc_id") % 2 === 0), "text")
                .agg(sum(col("ppl_bits")), sum(col("n_backoff"))).collect())
          d.unpersist()
        }

      case "asofscale" =>
        // as-of join scaling: events at 1x and a 10x synthetic union
        // (ids and users shifted so the key space also grows 10x)
        def evN(n: Int) = {
          val base = Tables.events(spark, sfDir).where(col("user_id").isNotNull)
          (0 until n).map(i => base
            .withColumn("event_id", col("event_id") + lit(i.toLong * 10000000L))
            .withColumn("user_id", col("user_id") + lit(i.toLong * 1000L)))
            .reduce(_ unionByName _)
        }
        for (n <- Seq(1, 10)) {
          val ev = evN(n).persist()
          val rows = ev.count()
          val purchases = ev.where(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts"))
          val clicks = ev.where(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
          time(s"asof ${n}x ($rows rows)")(
            graft.ops.Joins.asOfJoin(purchases, clicks, Seq("user_id"),
              "ts", "ts", "click_id", Seq("click_id")).count())
          ev.unpersist()
        }
      case "skew" =>
        // hot-key join at scale: events ×100 (10M rows), one key owning
        // 50% of the fact side, joined to a 50k-row dim FORCED through
        // sort-merge (broadcast would hide the shuffle skew entirely —
        // and is itself the first fix when the dim fits).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val base = Tables.events(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("value"), col("props"))
        val big = (0 until 100).map(i => base
            .withColumn("event_id", col("event_id") + lit(i.toLong * 10000000L)))
          .reduce(_ unionByName _)
        val dim = spark.range(50000L)
          .select(col("id").as("k"), (col("id") % 97).as("w")).persist()
        dim.count()

        for (hotPct <- Seq(50, 90)) {
          val skewed = big.withColumn("k",
              when(pmod(xxhash64(col("event_id")), lit(100L)) < hotPct, lit(0L))
                .otherwise(pmod(xxhash64(col("user_id"), col("event_id")), lit(50000L))))
            .persist()
          println(s"fact rows=${skewed.count()} ($hotPct% on key 0)")

          // aggregate over props too: column pruning must NOT strip the
          // wide payload, or the hot partition shrinks to 3 longs a row
          // and the experiment measures nothing a 100 TB row would feel
          def plainAgg() = skewed.join(dim, "k")
            .agg(sum(col("value") * col("w")), sum(length(col("props")))).collect()
          def saltedAgg() = graft.ops.Skew
            .saltedEquiJoin(skewed, dim, "k", "event_id", salts = 32)
            .agg(sum(col("value") * col("w")), sum(length(col("props")))).collect()

          plainAgg() // warm-up: codegen + cache touch, AQE state irrelevant
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          time(s"$hotPct% plain SMJ, AQE off")(plainAgg())
          time(s"$hotPct% salted 32, AQE off")(saltedAgg())
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m")
          spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
          time(s"$hotPct% plain SMJ, AQE default")(plainAgg())
          // local partitions are MBs, far below the 256 MB default skew
          // threshold — tune it down so AQE's splitter actually engages,
          // the local stand-in for what it does out of the box at TB scale
          spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
          spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
          time(s"$hotPct% plain SMJ, AQE tuned")(plainAgg())
          time(s"$hotPct% salted 32, AQE tuned")(saltedAgg())
          skewed.unpersist()
        }
      case "gopher" =>
        // n-gram repetition signals at 1x and 10x corpus (doc_ids
        // shifted so the key space grows too): both operators are
        // explode + hash-aggregate keyed by doc / (doc, gram), so
        // runtime should track corpus size ~linearly
        def corpusN(n: Int) = {
          val base = Tables.documents(spark, sfDir)
          (0 until n).map(i => base
              .withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L)))
            .reduce(_ unionByName _)
        }
        for (n <- Seq(1, 10, 50)) {
          val docs = corpusN(n).persist()
          println(s"docs=${docs.count()}")
          time(s"topgram ${n}x")(
            graft.ops.Gopher.topNgramCharFrac(docs, "text", 2).count())
          time(s"topgram ${n}x warm")(
            graft.ops.Gopher.topNgramCharFrac(docs, "text", 2).count())
          time(s"dupgram ${n}x")(
            graft.ops.Gopher.dupNgramCharFrac(docs, "text", 3).count())
          time(s"dupgram ${n}x warm")(
            graft.ops.Gopher.dupNgramCharFrac(docs, "text", 3).count())
          docs.unpersist()
        }
      case "hh" =>
        // sketch-gated heavy hitters vs the plain full groupBy on a
        // Zipf corpus. The gate's win is the aggregate's shuffle
        // width: it must be a universe big enough that map-side
        // partial aggregation cannot collapse it (4M distinct keys —
        // token-vocabulary scale), or the plain shuffle is already
        // tiny. ~23M rows, key k (1-based) repeated ceil(C/k) times.
        val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = t.taskMetrics
            if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        })
        val zipf = spark.range(1, 4000001)
          .select(explode(expr("sequence(1, cast(ceil(1500000 / id) as int))")).as("rep"),
            concat(lit("entity_"), col("id").cast("string")).as("k"))
          .select("k").persist()
        println(s"zipf rows=${zipf.count()}")
        val n = zipf.count()
        val share = 0.001 // threshold ~ top dozen keys
        // width >> 1/share so the mean cell load stays far under the
        // threshold and the gate is selective (e/theta sizing rule)
        def measured(label: String)(f: => Unit): Unit = {
          Thread.sleep(2000); shuffleBytes.set(0L)
          time(label)(f)
          Thread.sleep(2000)
          println(f"PROF $label%-28s shuffle ${shuffleBytes.get / 1e6}%10.1f MB")
        }
        def plain() = zipf.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= math.ceil(share * n).toLong).collect()
        def gated() = graft.operators.HeavyHitters
          .exactAtLeast(zipf, "k", share, depth = 4, width = 8192).collect()
        plain(); gated() // warm both paths (codegen + grid build)
        measured("plain groupBy+HAVING")(plain())
        measured("sketch-gated exact")(gated())
        zipf.unpersist()

      case "bloom" =>
        // bloom-pre-filtered anti join vs plain SMJ anti: events ×20
        // (wide props payload — shuffle volume is the point), small
        // side ~1% of the key space, broadcast DISABLED to emulate a
        // past-broadcast-size small side (the regime BloomJoin is
        // for; under broadcast both forms are shuffle-free).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = t.taskMetrics
            if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        })
        val base0 = Tables.events(spark, sfDir)
          .select(col("event_id"), col("props"))
        val bigE = (0 until 20).map(i => base0
            .withColumn("event_id", col("event_id") + lit(i.toLong * 10000000L)))
          .reduce(_ unionByName _).persist()
        println(s"big rows=${bigE.count()}")
        val smallE = bigE.select(col("event_id").as("k"))
          .where(pmod(xxhash64(col("event_id")), lit(100L)) < 1).distinct().persist()
        println(s"small rows=${smallE.count()} (~1% of keys)")
        def consume(df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)), sum(length(col("props")))).collect()
        def measured(label: String)(f: => Unit): Unit = {
          Thread.sleep(2000); shuffleBytes.set(0L)
          time(label)(f)
          Thread.sleep(2000)
          println(f"PROF $label%-28s shuffle ${shuffleBytes.get / 1e6}%10.1f MB")
        }
        consume(bigE.join(smallE, col("event_id") === col("k"), "left_anti")) // warm
        measured("plain anti SMJ")(
          consume(bigE.join(smallE, col("event_id") === col("k"), "left_anti")))
        measured("bloom anti")(
          consume(graft.ops.BloomJoin.antiJoin(bigE, "event_id", smallE, "k",
            expectedItems = 500000)))
        measured("plain semi SMJ")(
          consume(bigE.join(smallE, col("event_id") === col("k"), "left_semi")))
        measured("bloom semi")(
          consume(graft.ops.BloomJoin.semiJoin(bigE, "event_id", smallE, "k",
            expectedItems = 500000)))
      case "embed" =>
        import graft.operators.Similarity
        val emb = Tables.embeddings(spark, sfDir)
        val q = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(expr("aggregate(transform(v, x -> x*x), 0L, (a,x) -> a+x)").cast("double")))
        val sigs = q.select(col("vec_id"),
          posexplode(graft.plans.SignBands.signBands(col("v"), 16, 4)))
          .toDF("vec_id", "band", "bucket")
        time("sigs.count")(sigs.count())
        time("sigs.count warm")(sigs.count())
        val cand = sigs.as("x").join(sigs.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id")).distinct()
        time("cand.count")(cand.count())
        time("cand.count warm")(cand.count())
        time("full cold")(Similarity.cosineNearDupPairsLsh(emb, 0.5,
          maxCandidatePairs = Long.MaxValue).count())
        time("full warm")(Similarity.cosineNearDupPairsLsh(emb, 0.5,
          maxCandidatePairs = Long.MaxValue).count())
        time("full+sort warm")(SparkEntry.queries("q_embed_neardup")(spark, sfDir).count())

        // dup-heavy scaling: replicate the corpus with fresh ids (every
        // replica is an exact near-dup of its source — the worst case
        // for a near-dup detector, where true output grows as mult²).
        // Measured per mult: banded candidate volume, verified output,
        // wall time — candidates tracking output (not corpus²) is the
        // scale claim; all-pairs for reference
        for (mult <- Seq(1, 3, 10)) {
          val embM = (0 until mult).map(i =>
              emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 100000000L)))
            .reduce(_ unionByName _).persist()
          val n = embM.count()
          val qm = embM.select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
          // ONE definition of the banded candidate stage (mirrors
          // cosineNearDupPairsLsh's internals) for both configs —
          // keeps the profiler measuring the shipped pipeline shape
          def cands(bands: Int, r: Int) = {
            val sigs = qm.select(col("vec_id"),
                posexplode(graft.plans.SignBands.signBands(col("v"), bands, r)))
              .toDF("vec_id", "band", "bucket")
            sigs.as("x").join(sigs.as("y"),
                col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
                  col("x.vec_id") < col("y.vec_id"))
              .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id")).distinct()
          }
          val nc = time(s"embdup x$mult candidates")(cands(16, 4).count())
          val nv = time(s"embdup x$mult verified (full path)")(
            Similarity.cosineNearDupPairsLsh(embM, 0.5,
            // profiler measures the degenerate receipts regime on purpose
            maxCandidatePairs = Long.MaxValue).count())
          println(s"PROF embdup x$mult: rows=$n allpairs=${n * (n - 1) / 2} " +
            s"candidates=$nc verified=$nv " +
            s"candcut=${"%.1f".format(n * (n - 1) / 2.0 / nc)}x " +
            s"precision=${"%.3f".format(nv * 1.0 / nc)}")
          // tuned near-dup config (threshold 0.9, r=12, bands=28 =
          // lshParams(0.9, 0.01, 12)): the replicas are exact dups
          // (cosine 1), so recall is certain and the 2^12 bucket
          // space kills the random-collision background the (16,4)
          // config drowns in
          val ncT = time(s"embdup x$mult tuned candidates")(cands(28, 12).count())
          val nvT = time(s"embdup x$mult tuned verified")(
            Similarity.cosineNearDupPairsLsh(embM, 0.9, bands = 28, planesPerBand = 12).count())
          println(s"PROF embdup-tuned x$mult: candidates=$ncT verified=$nvT " +
            s"candcut=${"%.1f".format(n * (n - 1) / 2.0 / ncT)}x " +
            s"precision=${"%.3f".format(nvT * 1.0 / math.max(ncT, 1))}")
          embM.unpersist()
        }

        // SemDeDup at the same mults: cluster-scoped pair search under
        // the trained quantizer — wall time + output volume
        for (mult <- Seq(1, 10)) {
          val embM = (0 until mult).map(i =>
              emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 100000000L)))
            .reduce(_ unionByName _).persist()
          embM.count()
          val np = time(s"semdedup x$mult pairs")(
            graft.operators.SemDedup.pairs(embM, 0.4, k = 8, iters = 2).count())
          println(s"PROF semdedup x$mult: pairs=$np")
          embM.unpersist()
        }
      case "pq" =>
        // PQ quality + cost: ADC recall@k against exact brute-force
        // cosine top-k, and the storage ratio codes buy. Recall is
        // the honest number — PQ is lossy by design; the question is
        // whether 4 bytes of codes preserve the neighborhoods 256
        // bytes of floats define.
        import graft.operators.{ProductQuantizer, Similarity}
        val emb = Tables.embeddings(spark, sfDir).persist()
        val n = emb.count()
        val queries = emb.where(col("vec_id") < 100)
        val topK = 10
        val exact = Similarity.bruteForceTopK(emb, queries, topK)
          .select(col("query_id"), col("corpus_id")).collect()
        val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
        for ((m, k) <- Seq((4, 16), (8, 16), (8, 64));
             trained <- Seq(false, true)) {
          val mdl = if (trained)
            time(s"pq m=$m k=$k train")(ProductQuantizer.trainedModel(emb, m, k, iters = 5))
          else ProductQuantizer.model(emb, m, k)
          val codes = ProductQuantizer.encode(emb, mdl).persist()
          codes.count()
          val adc = time(s"pq m=$m k=$k trained=$trained adc top$topK")(
            ProductQuantizer.adcTopK(codes, queries, mdl, topK)
              .select(col("query_id"), col("corpus_id")).collect())
          val adcSet = adc.map(r => (r.getLong(0), r.getLong(1))).toSet
          val recall = (adcSet & exactSet).size.toDouble / exactSet.size
          val bytesPerVec = m * (if (k <= 256) 1 else 2)
          println(s"PROF pq m=$m k=$k trained=$trained: " +
            s"recall@$topK=${"%.3f".format(recall)} " +
            s"codes=${bytesPerVec}B vs floats=${64 * 4}B " +
            s"(${256 / bytesPerVec}x) rows=$n")
          codes.unpersist()
        }
        // structured corpus: every vector plus a near-identical twin
        // (the q_embed_neardup_hi seeding) — the retrieval task that
        // matters for dedup: does 8 bytes of codes still put the
        // twin first? Isotropic neighbors above are the worst case;
        // this is the realistic one.
        val corpus2 = Similarity.twinSeeded(emb.select(col("vec_id"), col("embedding")))
          .persist()
        corpus2.count()
        val mdlT = ProductQuantizer.trainedModel(corpus2, m = 8, k = 64, iters = 5)
        val codesT = ProductQuantizer.encode(corpus2, mdlT).persist()
        codesT.count()
        val top1 = time("pq twin top1")(
          ProductQuantizer.adcTopK(codesT, corpus2.where(col("vec_id") < 1000000L), mdlT, 1)
            .select(col("query_id"), col("corpus_id")).collect())
        val twinHits = top1.count(r => r.getLong(1) == r.getLong(0) + 1000000L)
        println(s"PROF pq twin: recall@1=${"%.3f".format(twinHits.toDouble / top1.length)} " +
          s"(${twinHits}/${top1.length} twins ranked first from 8B codes)")
        codesT.unpersist(); corpus2.unpersist()
        emb.unpersist()

      case "ivfpq" =>
        // IVF-PQ cost split: the registered q_ivfpq_topk fuses index
        // BUILD (coarse assign + encode of the whole corpus) with the
        // QUERY (probe + ADC over probed lists). Production builds
        // once and queries many times (writeIvfPqIndex /
        // ivfPqTopKIndexed) — this case measures each half so the
        // bench line's cost attributes honestly.
        import graft.operators.{ProductQuantizer, Similarity}
        import java.nio.file.Files
        val emb = Tables.embeddings(spark, sfDir).persist()
        val nv = emb.count()
        val queries = emb.where(col("vec_id") < 50)
        val mdl = time("ivfpq model build (collects)")(
          ProductQuantizer.model(emb, m = 4, k = 16))
        val fused = time("ivfpq fused build+query")(
          Similarity.ivfPqTopK(emb, queries, 3, nLists = 8, nProbe = 2, mdl).collect())
        val path = Files.createTempDirectory("prof-ivfpq").toString + "/index"
        time("ivfpq index write")(
          Similarity.writeIvfPqIndex(emb, path, nLists = 8, mdl))
        val idx = time("ivfpq indexed query (warm)")(
          Similarity.ivfPqTopKIndexed(spark, path, queries, 3, nProbe = 2).collect())
        val idx2 = time("ivfpq indexed query (2nd)")(
          Similarity.ivfPqTopKIndexed(spark, path, queries, 3, nProbe = 2).collect())
        println(s"PROF ivfpq rows=$nv fused=${fused.length} " +
          s"indexed=${idx.length}/${idx2.length} (must match)")
        emb.unpersist()

      case "fuzzyreal" =>
        // Skeleton blocking on a REALISTIC-cardinality corpus. The
        // registered q_fuzzy_match runs on raw p_name, whose small
        // distinct vocabulary at low SF makes true pairs themselves
        // quadratic (the SCALE_NOTES caveat). Here names are mostly
        // unique — each row's p_name concatenated with a
        // pseudo-randomly chosen OTHER row's p_name, distinct
        // pairings per x10 copy (more entities, never more copies of
        // one entity) — so block sizes should track duplicate-GROUP
        // sizes, not corpus size: candidates grow ~linearly 1x->10x.
        val partsR = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_name")).persist()
        val nParts = partsR.count()
        for (mult <- Seq(1, 10)) {
          val cat = (0 until mult).map { c =>
            val other = partsR.select(col("p_partkey").as("k2"), col("p_name").as("n2"))
            partsR.withColumn("k2", (col("p_partkey") * 31 + lit(c * 7 + 1)) % nParts + 1)
              .join(other, "k2")
              .withColumn("id", col("p_partkey") + lit(c.toLong * 100000000L))
              // the unique letters-only token that makes each entity's
              // NAME unique (real names are) — the testdata's ~64
              // distinct p_name values alone would collapse the
              // skeleton space to 64^2 blocks and re-create the very
              // caveat this case measures
              .select(col("id"), concat_ws(" ", col("p_name"), col("n2"),
                translate(col("id").cast("string"), "0123456789", "bcdfghjklm")).as("name"))
          }.reduce(_ unionByName _).persist()
          val n = cat.count()
          val skel = graft.ops.FuzzyJoin.skeletonBlock _
          val rs = cat.withColumn("__blk", skel(col("name")))
          val stats = rs.groupBy(col("__blk")).count()
            .agg(count(lit(1)).as("blocks"), max(col("count")).as("maxb"),
              expr("percentile_approx(count, 0.99)").as("p99"))
            .head()
          // dirty side: vowel-stripped copies (skeleton-invariant, so
          // the true source is always in the candidate set)
          val d = cat.where(col("id") % 7 === 0)
            .select(col("id").as("dirty_id"),
              regexp_replace(col("name"), "e", "").as("dirty_name"))
          val nd = d.count()
          val ls = d.withColumn("__blk", skel(col("dirty_name")))
          val cand = time(s"real skeleton candidates x$mult")(ls.join(rs, "__blk").count())
          val selfHits = ls.join(rs, "__blk").where(col("dirty_id") === col("id")).count()
          println(s"PROF real x$mult: corpus=$n dirty=$nd blocks=${stats.getAs[Long]("blocks")} " +
            s"maxblock=${stats.getAs[Long]("maxb")} p99block=${stats.get(2)} " +
            s"candidates=$cand (avg ${"%.2f".format(cand * 1.0 / nd)} per dirty row) " +
            s"sourceRecall=$selfHits/$nd")
          cat.unpersist()
        }
        partsR.unpersist()

      case "pagerank" =>
        // Iterative-join layout cost: the q_pagerank graph at 1x and
        // 10x edges (10 disjoint shifted copies — same degree
        // structure, 10x nodes and edges), ad-hoc edges (shuffled
        // into the join every iteration) vs write-once bucketed
        // edges (only the rank frame moves per iteration).
        import graft.operators.PageRank
        def edgesN(n: Int) = {
          val ps = Tables.lineitem(spark, sfDir)
            .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
            .distinct()
          val e1 = ps.unionByName(ps.select(col("dst").as("src"), col("src").as("dst")))
          val off = 100000000L
          (0 until n).map(i => e1.select((col("src") + lit(i * off)).as("src"),
            (col("dst") + lit(i * off)).as("dst"))).reduce(_.unionByName(_))
        }
        for (n <- Seq(1, 10)) {
          val e = edgesN(n).localCheckpoint(true)
          val cnt = e.count()
          time(s"pr adhoc x$n ($cnt edges)")(PageRank.ranks(e, iters = 5).count())
          time(s"pr writeEdges x$n")(PageRank.writeEdges(e, s"prof_pr_$n", buckets = 32))
          time(s"pr bucketed x$n")(
            PageRank.ranksBucketed(spark, s"prof_pr_$n", iters = 5).count())
          spark.sql(s"DROP TABLE IF EXISTS prof_pr_$n")
        }

      case "r7ops" =>
        // Late-round-7 additions at 1x and 10x: skyline (range-
        // bucketed sort-scan), label propagation and HITS (iterative
        // joins on the 10x-copies graph family), EWMA (per-key fold
        // — 10x KEYS, constant per-key history), event funnel (k
        // keyed reductions).
        def edgesN(n: Int) = {
          val ps = Tables.lineitem(spark, sfDir)
            .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
            .distinct()
          val off = 100000000L
          (0 until n).map(i => ps.select((col("src") + lit(i * off)).as("src"),
            (col("dst") + lit(i * off)).as("dst"))).reduce(_.unionByName(_))
        }
        for (n <- Seq(1, 10)) {
          val pts = {
            val p0 = Tables.lineitem(spark, sfDir)
              .select(round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
                col("l_quantity").cast("long").as("qty"))
            (0 until n).map(i => p0.select(
              (col("price_cents") + lit(i * 20000000L)).as("price_cents"), col("qty")))
              .reduce(_.unionByName(_)).localCheckpoint(true)
          }
          time(s"skyline x$n (${pts.count()} pts)")(
            graft.ops.Skyline.frontier2D(pts, "price_cents", "qty").count())
          val dir = edgesN(n).localCheckpoint(true)
          val sym = dir.unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
            .localCheckpoint(true)
          time(s"labelprop x$n (${sym.count()} sym edges)")(
            graft.operators.LabelProp.labels(sym, iters = 3).count())
          time(s"hits x$n (${dir.count()} dir edges)")(
            graft.operators.Hits.scores(dir, iters = 2).count())
          val ev = {
            val e0 = Tables.events(spark, sfDir)
              .where(col("user_id").isNotNull && col("value").isNotNull)
              .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
                round(col("value") * 100).cast("long").as("cents"))
            (0 until n).map(i => e0.select((col("user_id") + lit(i * 1000000L)).as("user_id"),
              col("ts"), col("event_id"), col("event_type"), col("cents")))
              .reduce(_.unionByName(_)).localCheckpoint(true)
          }
          time(s"ewma x$n (${ev.count()} events)")(
            graft.ops.Smoothing.ewmaTrace(ev, "user_id", "ts", "event_id",
              "cents", 1, 1).count())
          time(s"funnel x$n")(
            graft.ops.Journeys.eventFunnel(ev, "user_id", "ts", "event_type",
              Seq("signup", "view", "purchase"), Some(7L * 24 * 3600)).count())
          val wEdges = sym.withColumn("w", lit(1L) + (col("src") + col("dst")) % 7)
          val seeds = dir.select(col("src").as("id")).distinct()
            .where(col("id") % 202 === 0)
          time(s"sssp 4r x$n")(
            graft.operators.Sssp.distances(wEdges, seeds, rounds = 4).count())
          val aaEdges = {
            val ps8 = Tables.lineitem(spark, sfDir)
              .where(col("l_partkey") % 8 === 0)
              .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
              .distinct()
            val s1 = ps8.unionByName(ps8.select(col("dst").as("src"), col("src").as("dst")))
            val off = 100000000L
            (0 until n).map(i => s1.select((col("src") + lit(i * off)).as("src"),
              (col("dst") + lit(i * off)).as("dst"))).reduce(_.unionByName(_))
              .localCheckpoint(true)
          }
          time(s"adamic_adar x$n (${aaEdges.count()} edges)")(
            graft.operators.GraphStats.adamicAdar(aaEdges, k = 100,
              maxWedgeVolume = 2000000000L).count())
        }

      case "multimatch" =>
        // One-pass AC counting vs the k-pass replace-length trick
        // (each pattern = one more scan+allocation over every text):
        // the gap should track dictionary size. 100 corpus copies
        // make the work measurable (the documents table is 500 rows).
        val docs = (0 until 100)
          .map(i => Tables.documents(spark, sfDir).where(col("text").isNotNull)
            .select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
          .reduce(_.unionByName(_)).localCheckpoint(true)
        println(s"docs: ${docs.count()}")
        val words = Seq("scan", "join", "data", "stream", "batch", "merge",
          "window", "filter", "group", "sort", "hash", "spark", "table", "row",
          "key", "line", "agg", "value", "slow", "fast", "big", "small",
          "query", "customer", "part", "order", "the", "row ", "an", "at")
        for (k <- Seq(6, 30, 120)) {
          val pats = (0 until k).map(i =>
            words(i % words.length) + (if (i >= words.length) s"_$i" else ""))
          time(s"ac k=$k")(
            docs.select(graft.plans.MultiMatch.multiMatchCounts(col("text"), pats).as("c"))
              .agg(sum(element_at(col("c"), 1))).collect())
          time(s"replace-count k=$k")(
            docs.select(pats.map(p =>
                sum((length(col("text")) - length(regexp_replace(col("text"),
                  java.util.regex.Pattern.quote(p), ""))) / p.length).as(s"c_${p.hashCode}")): _*)
              .collect())
        }

      case "triangles" =>
        // Wedge volume (the triangle join's true cost driver) under
        // degree orientation vs naive id orientation, and wall time,
        // at 1x and 10x edges (disjoint shifted copies — linear
        // scaling expected since copies share no wedges).
        import graft.operators.Triangles
        def coEdges = {
          val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
          li.select(col("l_orderkey").as("k"), col("l_partkey").as("u"))
            .join(li.select(col("l_orderkey").as("k"), col("l_partkey").as("v")), Seq("k"))
            .where(col("u") < col("v"))
            .select(col("u").as("src"), col("v").as("dst")).distinct()
        }
        def wedges(o: org.apache.spark.sql.DataFrame): Long =
          o.groupBy(col("src")).agg(count(lit(1)).as("c"))
            .agg(sum(expr("c * (c - 1) div 2")).as("w")).head().getLong(0)
        for (n <- Seq(1, 10)) {
          val off = 10000000L
          val e = (0 until n).map(i => coEdges.select(
              (col("src") + lit(i * off)).as("src"), (col("dst") + lit(i * off)).as("dst")))
            .reduce(_.unionByName(_)).localCheckpoint(true)
          val cnt = e.count()
          val canon = Triangles.canonicalEdges(e).localCheckpoint(true)
          val wDeg = wedges(Triangles.oriented(canon))
          val wId = wedges(canon.select(col("u").as("src"), col("v").as("dst")))
          println(s"PROF wedges x$n ($cnt edges): deg-oriented=$wDeg id-oriented=$wId")
          time(s"triangles x$n")(Triangles.triangles(e).count())
          time(s"perNode x$n warm")(Triangles.perNodeCounts(e).count())
        }

      case "bfs" =>
        // Frontier-loop layout cost, the pagerank experiment's shape:
        // ad-hoc edges (reshuffled every round) vs bucketed (frontier
        // moves, edges stay) at 1x and 10x edges; multi-source seeds
        // so the wave covers the graph in few rounds.
        import graft.operators.Bfs
        def edgesN(n: Int) = {
          val ps = Tables.lineitem(spark, sfDir)
            .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
            .distinct()
          val e1 = ps.unionByName(ps.select(col("dst").as("src"), col("src").as("dst")))
          val off = 100000000L
          (0 until n).map(i => e1.select((col("src") + lit(i * off)).as("src"),
            (col("dst") + lit(i * off)).as("dst"))).reduce(_.unionByName(_))
        }
        for (n <- Seq(1, 10)) {
          val e = edgesN(n).localCheckpoint(true)
          val cnt = e.count()
          val seeds = e.select(col("src").as("id")).distinct()
            .where(col("id") % 202 === 0).localCheckpoint(true)
          time(s"bfs adhoc x$n ($cnt edges)")(
            Bfs.shortestHops(e, seeds).groupBy(col("dist")).count().count())
          time(s"bfs writeEdges x$n")(Bfs.writeEdges(e, s"prof_bfs_$n", buckets = 32))
          time(s"bfs bucketed x$n")(
            Bfs.hopsBucketed(spark, s"prof_bfs_$n", seeds).count())
          spark.sql(s"DROP TABLE IF EXISTS prof_bfs_$n")
        }

      case "hyperball" =>
        // Register traffic is the cost driver: live register rows per
        // round (<= min(ball, m) per node) and wall at 1x/10x edges,
        // lgK 7 vs 10 (m=128 vs 1024 caps).
        import graft.operators.HyperBall
        def edgesN(n: Int) = {
          val ps = Tables.lineitem(spark, sfDir)
            .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
            .distinct()
          val e1 = ps.unionByName(ps.select(col("dst").as("src"), col("src").as("dst")))
          val off = 100000000L
          (0 until n).map(i => e1.select((col("src") + lit(i * off)).as("src"),
            (col("dst") + lit(i * off)).as("dst"))).reduce(_.unionByName(_))
        }
        for (n <- Seq(1, 10); lgK <- Seq(7, 10)) {
          val e = edgesN(n).localCheckpoint(true)
          val cnt = e.count()
          val regs = time(s"hyperball x$n lgK=$lgK ($cnt edges)")(
            HyperBall.ballRegisters(e, rounds = 3, lgK = lgK))
          println(s"PROF hb x$n lgK=$lgK register rows after r3: ${regs.count()}")
        }

      case "baskets" =>
        // The apriori prune's measured effect. Neither test corpus
        // has a frequency tail (lineitem part keys are uniform, the
        // synthetic documents use a 31-word vocabulary), so this
        // builds the regime the prune exists for explicitly: every
        // basket's head items (parts, all frequent) PLUS one
        // once-seen item per fact row — the hapax-legomenon half of
        // a real Zipf vocabulary (~half of a text corpus's types
        // appear exactly once). The prune should collapse the pair
        // volume back to the head's, since singletons cannot form
        // frequent pairs.
        val li = Tables.lineitem(spark, sfDir)
        val head = li.select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
        val hapax = li.select(col("l_orderkey").as("b"),
          (lit(1000000000L) + col("l_orderkey") * 10 + col("l_linenumber")).as("i"))
        val facts = head.unionByName(hapax).distinct().localCheckpoint(true)
        def pairVolume(f: org.apache.spark.sql.DataFrame): Long =
          f.groupBy(col("b")).agg(count(lit(1)).as("k"))
            .agg(sum(expr("k * (k - 1) div 2"))).head().getLong(0)
        println(s"PROF baskets: ${facts.count()} facts, " +
          s"${facts.select(col("i")).distinct().count()} distinct items, " +
          s"raw pair volume ${pairVolume(facts)}")
        for (ms <- Seq(1L, 2L, 5L)) {
          val freq = facts.groupBy(col("i")).agg(count(lit(1)).as("n"))
            .where(col("n") >= ms).select(col("i"))
          val pruned = facts.join(freq, Seq("i"), "left_semi").localCheckpoint(true)
          println(s"PROF baskets minSupport=$ms: pruned facts ${pruned.count()}, " +
            s"pair volume ${pairVolume(pruned)}")
          time(s"frequentPairs ms=$ms")(graft.ops.Baskets.frequentPairs(
            facts, "b", "i", ms, maxBasketItems = 100000).count())
        }

      case "ivfpqscale" =>
        // The composed IVF->PQ->ADC path (the q_ivfpq_topk shape) at
        // 1x/10x corpus with a FIXED 50-query set, so growth isolates
        // the corpus side: model build, ad-hoc query (codes rebuilt
        // in-query), persisted partitionBy(list_id) index build, and
        // the probe-pruned indexed query. The law being verified:
        // ad-hoc cost tracks the corpus (full re-encode per run);
        // indexed query cost tracks nProbe/nLists of the corpus in
        // ~8-byte code rows — the part a 100 TB deployment pays per
        // query batch.
        import graft.operators.{ProductQuantizer, Similarity}
        def embN(n: Int) = {
          val e1 = Tables.embeddings(spark, sfDir)
          val off = 100000000L
          (0 until n).map(i => e1.select((col("vec_id") + lit(i * off)).as("vec_id"),
            col("embedding"))).reduce(_.unionByName(_))
        }
        for (n <- Seq(1, 10)) {
          val emb = embN(n).localCheckpoint(true)
          val cnt = emb.count()
          val q = emb.where(col("vec_id") < 50).localCheckpoint(true)
          val mdl = time(s"ivfpq model x$n ($cnt vecs)")(
            ProductQuantizer.model(emb, m = 4, k = 16))
          time(s"ivfpq adhoc x$n")(
            Similarity.ivfPqTopK(emb, q, 3, nLists = 8, nProbe = 2, mdl).count())
          val idx = s"${System.getProperty("java.io.tmpdir")}/prof_ivfpq_$n"
          time(s"ivfpq writeIndex x$n")(
            Similarity.writeIvfPqIndex(emb, idx, nLists = 8, mdl))
          time(s"ivfpq indexed x$n")(
            Similarity.ivfPqTopKIndexed(spark, idx, q, 3, nProbe = 2).count())
          time(s"ivfpq indexed warm x$n")(
            Similarity.ivfPqTopKIndexed(spark, idx, q, 3, nProbe = 2).count())
        }

      case "basketvol" =>
        // The registered q_freq_pairs/q_item_cosine instances' true
        // cost driver: the post-prune pair volume (= the self-join's
        // exact output rows, the quantity the new maxPairVolume cap
        // bounds) at 1x and 10x baskets.
        def basketsN(n: Int) = {
          val li = Tables.lineitem(spark, sfDir)
          val off = 100000000L
          (0 until n).map(i => li.select((col("l_orderkey") + lit(i * off)).as("b"),
            col("l_partkey").as("i"))).reduce(_.unionByName(_))
        }
        for (n <- Seq(1, 10)) {
          val f = basketsN(n).localCheckpoint(true)
          val cnt = f.count()
          val vol = f.distinct().groupBy(col("b")).agg(count(lit(1)).as("k"))
            .agg(sum(expr("k * (k - 1) div 2"))).head().getLong(0)
          println(s"PROF basketvol x$n: $cnt facts, pair volume $vol")
          time(s"frequentPairs x$n")(graft.ops.Baskets.frequentPairs(
            f, "b", "i", minSupport = 3).count())
          time(s"cosinePairs x$n")(graft.ops.Baskets.cosinePairs(
            f, "b", "i", minSupport = 3).count())
        }

      case "queries" =>
        // time arbitrary registered queries by name (2 runs each:
        // cold-ish + warm) — the targeted A/B tool the LSH guard-fuse
        // measurement needed; reusable for any per-query regression
        args.drop(1).foreach { name =>
          val fn = SparkEntry.queries.getOrElse(name,
            sys.error(s"Profile queries: unknown query '$name'"))
          time(s"$name run1")(fn(spark, sfDir).count())
          time(s"$name run2")(fn(spark, sfDir).count())
        }

      case "r8ops" =>
        // Round-8 batch: the two data-sized new ops at 1x/10x.
        // gram novelty: the gram->min-id aggregate + join-back is the
        // whole cost — both shuffles keyed on the gram then the doc.
        def docsN(n: Int) = {
          val d1 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
          val off = 100000000L
          (0 until n).map(i => d1.select((col("doc_id") + lit(i * off)).as("doc_id"),
            col("text"))).reduce(_.unionByName(_))
        }
        for (n <- Seq(1, 10)) {
          val d = docsN(n).localCheckpoint(true)
          val cnt = d.count()
          time(s"gram_novelty x$n ($cnt docs)")(
            graft.ops.CorpusStats.gramNovelty(d, "doc_id", "text", 3).count())
        }
        // dbscan: grid radius join + components; points replicated on
        // a SHIFTED plane (density constant, area grows) so the grid
        // join's per-cell work stays fixed — the 100 TB shape
        def ptsN(n: Int) = {
          val p1 = Tables.customer(spark, sfDir).select(col("c_custkey").as("id"),
            pmod(graft.plans.Hash60.hash60(
              concat(lit("gx"), col("c_custkey").cast("string"))), lit(1000000L)).as("x"),
            pmod(graft.plans.Hash60.hash60(
              concat(lit("gy"), col("c_custkey").cast("string"))), lit(1000000L)).as("y"))
          val off = 100000000L
          (0 until n).map(i => p1.select((col("id") + lit(i * 10000000L)).as("id"),
            (col("x") + lit(i * off)).as("x"), col("y"))).reduce(_.unionByName(_))
        }
        for (n <- Seq(1, 10)) {
          val p = ptsN(n).localCheckpoint(true)
          val cnt = p.count()
          time(s"dbscan x$n ($cnt pts)")(
            graft.operators.Dbscan.cluster(p, "id", "x", "y", 20000L, 3).count())
        }

      case "hbround" =>
        // r14 optimization: decompose ONE HyperBall absorb round to
        // attribute its measured 23-25 CPU-seconds — join fan-out vs
        // union vs the RegMax aggregate vs the ObjectHashAggregate
        // sort fallback (threshold 128 groups) vs broadcasting the
        // edge side.
        val e = graft.ops.Graphs.bipartiteQuarterSym(spark, sfDir)
          .localCheckpoint(true)
        val nodes = e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct()
        println(s"PROF |E|=${e.count()} |V|=${nodes.count()}")
        val m = 128
        val c = nodes.select(col("id"),
          expr(s"transform(sequence(0, ${m - 1}), i -> int(pmod(id * 31 + i, 13)))")
            .as("regs")).localCheckpoint(true)
        c.count()
        def round(cc: org.apache.spark.sql.DataFrame,
                  ee: org.apache.spark.sql.DataFrame) =
          cc.unionByName(cc.join(ee, cc("id") === ee("dst"))
              .select(ee("src").as("id"), col("regs")))
            .groupBy(col("id"))
            .agg(graft.plans.RegMaxArr.regMax(col("regs")).as("regs"))
        for (_ <- 1 to 2) {
          time("join only")(
            c.join(e, c("id") === e("dst")).select(e("src").as("id"), col("regs"))
              .write.format("noop").mode("overwrite").save())
          time("join+union noop")(
            c.unionByName(c.join(e, c("id") === e("dst"))
              .select(e("src").as("id"), col("regs")))
              .write.format("noop").mode("overwrite").save())
          time("full round (agg)")(
            round(c, e).write.format("noop").mode("overwrite").save())
          time("full round broadcast-e")(
            round(c, broadcast(e)).write.format("noop").mode("overwrite").save())
          spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "1000000")
          time("full round fallback=1M")(
            round(c, e).write.format("noop").mode("overwrite").save())
          time("full round bcast+fallback=1M")(
            round(c, broadcast(e)).write.format("noop").mode("overwrite").save())
          spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "128")
        }

      case name =>
        val q = SparkEntry.queries(name)
        time(s"$name cold")(q(spark, sfDir).count())
        time(s"$name warm")(q(spark, sfDir).count())
    }
    spark.stop()
  }
}
