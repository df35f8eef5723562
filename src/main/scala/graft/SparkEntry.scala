package graft

import graft.ops.{Dedup, Observations, Recap}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a SURVEY §2 operator instantiated on the
  * driver's synthetic tables; `oracleSql` carries the DuckDB-equivalent
  * SQL. Column names and types are aligned on both sides (the driver
  * sorts columns by name before hashing).
  *
  * Determinism policy (SURVEY §7.4): double summation is not
  * associative, and shuffle-fetch order varies run to run — so every
  * oracle-compared aggregate over a fractional double column is
  * computed in exact integer cents (`sum(round(x*100)::long)`) or
  * decimal, with the identical formula in the oracle SQL. Sums over
  * integer-valued doubles (counts, quantities) are exact as-is.
  */
object SparkEntry {

  /** Exact 2-dp-safe sum of a 2-decimal double column, as double.
    * Integer-cents arithmetic: deterministic at any partition/merge
    * order, unlike double summation. The final /100.0 is a single IEEE
    * op — bit-identical in any engine given the same integer. */
  private def centSum(c: Column): Column =
    sum(round(c * 100).cast("long")) / 100.0

  /** Exact 2-dp-safe average (rounded to cent precision), as double. */
  private def centAvg(c: Column): Column =
    round(sum(round(c * 100).cast("long")) / count(c)) / 100.0

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full nested daily-recap gold pipeline (SURVEY §3.3). */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val obs = Observations.guardValid(Observations.fromEvents(Tables.events(spark, sfDir)))
    Recap.pipeline(obs, Tables.customer(spark, sfDir))
  }

  /** Shared retrieval-eval fixture: results = top-10 customers per
    * nation by balance cents (deterministic total order), judgments
    * = rel ∈ [0,2] from order counts (least(2, n div 4)). */
  private def rankEvalFixture(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.customer(s, dir)
    val results = cust.select(col("c_nationkey").cast("long").as("qid"),
        col("c_custkey").as("item"),
        round(col("c_acctbal") * 100).cast("long").as("__sc"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("__sc").desc, col("item"))).cast("long"))
      .where(col("rank") <= 10).drop("__sc")
    val judged = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("__n"))
      .join(cust.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("qid"),
        col("o_custkey").as("item"),
        least(lit(2L), expr("__n div 4")).as("rel"))
    (results, judged)
  }

  private def obs(s: SparkSession, dir: String): DataFrame =
    Observations.guardValid(Observations.fromEvents(Tables.events(s, dir)))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ shapingQueries ++ windowQueries ++ scalarQueries ++ trainingQueries ++ extraQueries ++ temporalQueries ++ journeyQueries ++ roundEightQueries ++ roundNineQueries ++ roundTwelveQueries

  // ==== round 12: merge-on-read deletion vectors + Bag-of-Little-
  // Bootstraps + typed zone maps ====
  private def roundTwelveQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- merge-on-read DELETE (r11 verdict item #1): two successive
    // MOR deletes on a snapshot table — each records deleted
    // (file, row-position) pairs in a DV sidecar, rewriting ZERO data
    // bytes — then a HEAD read folds both DVs at the reconciling
    // scan. The oracle is the doubly-NOT-filtered aggregate over the
    // raw corpus: proof the anti-join dropped exactly the TRUE rows
    // of both predicates (incl. composition on files hit twice) and
    // invented nothing ----
    "q_delete_dv" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureDemoTable(s, dir)
      graft.sources.Snapshots.deleteWhere(s, t,
        col("lang") === "en" && pmod(col("doc_id"), lit(5)) === 2, mode = "mor")
      graft.sources.Snapshots.deleteWhere(s, t,
        pmod(col("doc_id"), lit(11)) === 7, mode = "mor")
      graft.sources.Snapshots.read(s, t)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("lang"))
    }),
    // ---- Bag-of-Little-Bootstraps 95% CI for the mean click value
    // (r11 verdict item #2 — q_bootstrap_ci's production twin):
    // Efron is B·n work by construction; BLB is s·B·n^0.6 with the
    // same statistical target. All randomness is md5-hash-driven
    // (subset membership + Irwin-Hall-normal Poisson weights), so
    // the SAME intervals replay in any engine ----
    "q_bootstrap_blb" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("value").isNotNull && col("event_type") === "click")
        .select(col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Experiment.blbMeanCi(ev, "event_id", "cents",
        s = 5, b = 100, alphaPct = 5)
    }),
    // ---- typed zone maps (r11 verdict item #8): a time-range read
    // over an event table committed range-clustered on ts with
    // TIMESTAMP (+ double) manifest envelopes — readPrunedTyped
    // encodes the bounds through the same monotone map the commit
    // used and skips disjoint files (TypedStatsSpec measures the
    // skipping; this oracle proves the pruned read loses nothing:
    // it must equal the plain filtered aggregate) ----
    "q_prune_time" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureTimeTable(s, dir)
      graft.sources.Snapshots.readPrunedTyped(s, t, "ts",
        java.sql.Timestamp.from(java.time.Instant.parse("2024-01-05T00:00:00Z")),
        java.sql.Timestamp.from(java.time.Instant.parse("2024-01-12T00:00:00Z")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .orderBy(col("event_type"))
    }))

  // ==== round 9: cross-modal pair alignment (the CLIP-shaped
  // curation audit) and friends ====
  private def roundNineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- image-text pair alignment audit (r8 verdict item #7): a
    // caption-curation pipeline holds a PAIR table with one embedding
    // per modality; the audit scores every pair's cross-modal cosine
    // and rolls the distribution up per source so a bad ingest batch
    // (OCR captions, watermarked stock photos) surfaces as a
    // low-alignment source. Pairs here: even vec_id = "text" side,
    // the adjacent odd vec_id = "image" side (SF-independent), source
    // via the documents table. All-quantized-integer dots (the
    // Similarity.qdot native expression), one equi-join + one hash
    // aggregate — no crosses, no windows; scales as a fact-fact
    // co-partitioned join at 100 TB ----
    "q_pair_align" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          graft.operators.Similarity.quantize(col("embedding")).as("v"))
      val txt = emb.where(pmod(col("vec_id"), lit(2L)) === 0)
      val img = emb.select((col("vec_id") - 1).as("vec_id"), col("v").as("w"))
      val qd = graft.operators.Similarity.qdot _
      val scored = txt.join(img, Seq("vec_id"))
        .select(col("vec_id"), qd(col("v"), col("v")).as("nt"),
          qd(col("w"), col("w")).as("ni"), qd(col("v"), col("w")).as("dot"))
        .where(col("nt") > 0 && col("ni") > 0)
        .select(col("vec_id"),
          round(lit(1e9) * col("dot").cast("double") /
            (sqrt(col("nt").cast("double")) * sqrt(col("ni").cast("double"))))
            .cast("long").as("align_nano"))
      val src = Tables.documents(s, dir).select(col("doc_id").as("vec_id"), col("source"))
      scored.join(src, Seq("vec_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("align_nano")).as("__sum"),
          min(col("align_nano")).as("min_align_nano"),
          max(col("align_nano")).as("max_align_nano"),
          sum(when(col("align_nano") < 100000000L, 1L).otherwise(0L)).as("n_misaligned"))
        .select(col("source"), col("n_pairs"),
          round(col("__sum").cast("double") / col("n_pairs").cast("double"))
            .cast("long").as("mean_align_nano"),
          col("min_align_nano"), col("max_align_nano"), col("n_misaligned"))
        .orderBy(col("source"))
    }),

    // ---- duplication-aware training weights: dedup by DOWNWEIGHTING
    // instead of dropping — each doc's sampling weight is 1/|its
    // near-dup cluster| (unclustered docs weigh 1), so a 10-clone
    // boilerplate family contributes ONE doc's worth of gradient
    // while unique text is untouched. Reuses the shared clustered-
    // shingle cache; one size aggregate + two narrow left joins on
    // top of the components frame — nothing new shuffles ----
    "q_dedup_weights" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val clusters = graft.operators.NearDup.documentClusters(s, dir)
        .select(col("doc_id"), col("cluster_id"))
      val sizes = clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("__n"))
      docs.select(col("doc_id"), col("lang"))
        .join(clusters, Seq("doc_id"), "left")
        .join(sizes, Seq("cluster_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("__n"), lit(1L)).as("n_members"),
          // `div`, not `/`: Column./ is always DOUBLE division; div is
          // the truncating integer form that mirrors DuckDB's `//`
          expr("1000000000L div coalesce(__n, 1L)").as("weight_nano"))
        .orderBy(col("doc_id"))
    }),

    // ---- shard-packing audit: the fill/waste report over the
    // q_pack_budget bins — per lang: bin count, exact token mass,
    // utilization in nano (1e9·Σtok/(bins·budget)), and the worst
    // bin's overflow (a doc straddling a boundary lands in its start
    // bin, so fill can exceed the budget — the audit is where that
    // becomes visible). One window (the pack itself) + one hash
    // aggregate ----
    "q_pack_audit" -> ((s, dir) => {
      import graft.functions.{TextFunctions => TF}
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TF.bpeishTokenCount(col("text")).cast("long").as("n_tok"))
      val packed = graft.ops.Packing.packByBudget(docs, "doc_id", "n_tok", 2048, Seq("lang"))
      packed.groupBy(col("lang"), col("bin"))
        .agg(sum(col("n_tok")).as("fill"), count(lit(1)).as("n_docs"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_bins"), sum(col("fill")).as("sum_tok"),
          max(col("fill")).as("max_fill"), min(col("fill")).as("min_fill"),
          sum(col("n_docs")).as("n_docs"))
        .select(col("lang"), col("n_bins"), col("sum_tok"), col("max_fill"),
          col("min_fill"), col("n_docs"),
          round(lit(1e9) * col("sum_tok").cast("double") /
            (col("n_bins") * lit(2048L)).cast("double")).cast("long").as("util_nano"))
        .orderBy(col("lang"))
    }),

    // ---- label-noise audit (confident-learning-lite): leave-one-out
    // kNN over the LABELED pool — a point whose 5 nearest labeled
    // neighbors vote against its own label is a mislabeling
    // candidate; the per-class flag rate is the audit a labeling
    // vendor gets graded on. Pure composition: knnLabel's neighbor
    // stage already excludes self (query_id ≠ corpus_id), the vote is
    // unchanged, one broadcast label join + one hash aggregate on
    // top. Swap the brute-force scorer for the partitioned IVF-PQ
    // index at corpus scale; everything downstream is identical ----
    "q_knn_noise" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pred = graft.operators.Similarity.knnLabel(
        emb, emb.where(col("vec_id") < 200), k = 5)
      pred.join(emb.select(col("vec_id"),
          col("label").cast("long").as("true_label")), Seq("vec_id"))
        .groupBy(col("true_label"))
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("pred_label").cast("long") =!= col("true_label"), 1L)
            .otherwise(0L)).as("n_flagged"))
        .select(col("true_label"), col("n_checked"), col("n_flagged"),
          round(lit(1e9) * col("n_flagged").cast("double") /
            col("n_checked").cast("double")).cast("long").as("flag_rate_nano"))
        .orderBy(col("true_label"))
    })
  )

  // ==== round 8: autocorrelation, symmetric drift, privacy audit,
  // corpus novelty, ER survivorship, association rules ====
  private def roundEightQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- sample ACF at lags 1..10 over the daily click-dollar
    // series: exact integer moments (the n²-scaled mean-clearing
    // identity in ops/Autocorr), one IEEE division per lag ----
    "q_acf" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .where(col("value").isNotNull && col("event_type") === "click")
        .select(to_date(col("ts")).as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(expr("sum(cents) div 100").as("x"))
      graft.ops.Autocorr.acf(daily, "day", "x", maxLag = 10)
        .orderBy(col("lag"))
    }),

    // ---- Jensen-Shannon divergence over the q_psi_bins month
    // halves: the symmetric, ln2-bounded companion to PSI — same
    // histogram, same smoothing, nano-rounded per-bucket terms ----
    "q_js_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("ts"), round(col("value") * 100).cast("long").as("cents"))
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      graft.ops.Drift.jsd(
          ev.where(col("ts") < cut), ev.where(col("ts") >= cut), "cents", width = 500L)
        .orderBy(col("bucket"))
    }),

    // ---- k-anonymity / l-diversity audit of the customer table
    // under (nation, market-segment) quasi-identifiers with account
    // balance as the sensitive attribute — exact class counting ----
    "q_kanon" -> ((s, dir) => {
      graft.ops.Privacy.kAnonymity(Tables.customer(s, dir),
          Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10L)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),

    // ---- per-document 3-gram novelty in doc_id (ingestion) order:
    // the share of a doc's distinct grams it introduced to the
    // corpus — string grams for cross-engine exactness (production
    // swaps in ShingleHashes and shuffles longs) ----
    "q_gram_novelty" -> ((s, dir) => {
      graft.ops.CorpusStats.gramNovelty(Tables.documents(s, dir), "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // ---- ER survivorship: the near-dup clusters of
    // q_dup_components re-resolved to QUALITY-best golden records
    // (longest text, ties to smallest id) instead of id-min ----
    "q_survivorship" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val clusters = graft.operators.NearDup.documentClusters(s, dir)
      graft.operators.Components.survivors(clusters, docs, "doc_id", "text")
        .orderBy(col("cluster_id"))
    }),

    // ---- directed association rules over the q_freq_pairs basket
    // instance: confidence + lift in exact nano-units, N = all
    // baskets (pre-prune — the prune must not inflate lift) ----
    "q_assoc_rules" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).where(col("l_orderkey") % 4 === 0)
      graft.ops.Baskets.rules(li, "l_orderkey", "l_partkey", minSupport = 2)
        .orderBy(col("antecedent"), col("consequent"))
    }),

    // ---- Theil-Sen robust trend of the daily click-dollar series:
    // median of pairwise slopes (breakdown ~29%), exact order-
    // statistic selection over per-pair IEEE divisions ----
    "q_theil_sen" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .where(col("value").isNotNull && col("event_type") === "click")
        .select(to_date(col("ts")).as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(expr("sum(cents) div 100").as("x"))
        .select(datediff(col("day"),
          lit(java.sql.Date.valueOf("2024-01-01"))).cast("long").as("t"), col("x"))
      graft.ops.Robust.theilSen(daily, "t", "x")
    }),

    // ---- deterministic hash-resampled bootstrap 95% CI for the
    // mean click value: Efron resampling with an md5-driven design
    // matrix, so the SAME intervals replay in any engine ----
    "q_bootstrap_ci" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("value").isNotNull && col("event_type") === "click")
        .select(col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Experiment.bootstrapMeanCi(ev, "event_id", "cents", b = 200, alphaPct = 5)
    }),

    // ---- top principal component of the embedding corpus by
    // integer power iteration on the exact n²-scaled scatter matrix
    // (All-but-the-Top whitening direction) — the approximation
    // itself replays bit-for-bit in SQL ----
    "q_pca_power" -> ((s, dir) => {
      graft.operators.Pca.topComponent(Tables.embeddings(s, dir), iters = 3)
        .orderBy(col("dim"))
    }),

    // ---- cumulative-gains / lift deciles over the q_auc scored
    // fixture: deterministic (score desc, id) decile boundaries via
    // the bucketed two-pass ranks — the campaign-targeting table the
    // AUC summarizes ----
    "q_lift_curve" -> ((s, dir) => {
      val scored = Tables.embeddings(s, dir).select(col("vec_id"),
        element_at(graft.operators.Similarity.randomProject(
          graft.operators.Similarity.quantize(col("embedding")), k = 1), 1).as("score"),
        when(col("label") < 5, 1L).otherwise(0L).as("y"))
      graft.ops.Eval.liftCurve(scored, "vec_id", "score", "y")
        .orderBy(col("bin"))
    }),

    // ---- kNN weak labeling: every 4th vector's label predicted by
    // a 5-NN majority vote from the labeled three quarters —
    // deterministic vote (votes desc, best rank, smallest label),
    // so the PREDICTION replays exactly in SQL ----
    "q_knn_label" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.Similarity.knnLabel(
          emb.where(col("vec_id") % 4 =!= 0),
          emb.where(col("vec_id") % 4 === 0 && col("vec_id") < 200), k = 5)
        .orderBy(col("vec_id"))
    }),

    // ---- degree distribution of the shared bipartite graph — the
    // first graph audit anyone runs (hub detection, power-law tail):
    // one degree aggregate folded to (degree, n_nodes) plus each
    // row's share of nodes in exact nano-units ----
    "q_degree_dist" -> ((s, dir) => {
      val edges = graft.ops.Graphs.bipartiteSym(s, dir)
      val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      val dist = deg.groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
      val total = deg.agg(count(lit(1)).as("n_total"))
      dist.crossJoin(broadcast(total))
        .select(col("deg"), col("n_nodes"),
          round(lit(1e9) * col("n_nodes").cast("double") /
            col("n_total").cast("double")).cast("long").as("share_nano"))
        .orderBy(col("deg"))
    }),

    // ---- precision/recall@10 per nation over the rankEvalFixture
    // lists — the set-based complement to q_ndcg's graded metric ----
    "q_precision_k" -> ((s, dir) => {
      val (results, judged) = rankEvalFixture(s, dir)
      graft.ops.RankEval.precisionRecallAtK(results, judged, 10)
        .orderBy(col("qid"))
    }),

    // ---- Brier score over the q_calibration fixture: the proper
    // scoring rule that grades calibration AND discrimination in
    // one number — exact integer (pct − 100y)² terms, one mirrored
    // division ----
    "q_brier" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(
        graft.ops.Sampling.hashBucket(col("doc_id")).cast("long").as("conf_pct"),
        when(length(col("text")) > 500, 1L).otherwise(0L).as("y"))
      graft.ops.Eval.brierFromPercent(docs, "conf_pct", "y")
    }),

    // ---- per-community conductance of the labelprop partition:
    // the boundary-leakiness score modularity misses (Cheeger's
    // quantity); exact integer cut/volume sums over the shared
    // cached graph ----
    "q_conductance" -> ((s, dir) => {
      graft.operators.GraphStats.conductance(
          graft.ops.Graphs.bipartiteSym(s, dir), graft.ops.Graphs.labelsBipartite(s, dir))
        .orderBy(col("lab"))
    }),

    // ---- tokenizer fertility per language: BPE tokens per
    // whitespace word under the trained merge table — the metric
    // that decides whether a tokenizer punishes a language (fertility
    // ≫ 1 → more compute per word). Reuses the q_bpe_encode
    // closed-form-checkable merges ----
    "q_fertility" -> ((s, dir) => {
      val merges = Seq(("t", "h"), ("e", graft.ops.Bpe.EndOfWord))
      val per = Tables.documents(s, dir)
        .select(col("lang"),
          graft.ops.Bpe.bpeTokenCount(col("text"), merges).as("n_tokens"),
          size(filter(graft.functions.TextFunctions.tokens(coalesce(col("text"), lit(""))),
            t => length(t) > 0)).cast("long").as("n_words"))
      per.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_words")).as("total_words"))
        .select(col("lang"), col("n_docs"), col("total_tokens"), col("total_words"),
          when(col("total_words") === 0, lit(null).cast("long"))
            .otherwise(round(lit(1e9) * col("total_tokens").cast("double") /
              col("total_words").cast("double")).cast("long")).as("fertility_nano"))
        .orderBy(col("lang"))
    }),

    // ---- energy-threshold VAD segments over longer synthesized
    // WAVs (16 samples → 8 frames at frameLen 2): voiced frames
    // merge into maximal runs — the speech-curation step between
    // decode and ASR. Exact integer energies and rank-arithmetic
    // islands replay arithmetically from the sample formula ----
    "q_vad" -> ((s, dir) => {
      val mults = Seq(7, 31, 131, 8191, 3, 5, 11, 13, 17, 19, 23, 29, 37, 41, 43, 47)
      val header = "52494646" + "44000000" + "57415645" + "666d7420" +
        "10000000" + "0100" + "0100" + "401f0000" + "803e0000" + "0200" + "1000" +
        "64617461" + "20000000"
      def u(mult: Int) = pmod(col("doc_id") * mult, lit(65536L))
      def hx(c: Column) = lpad(lower(hex(c)), 2, "0")
      def le16(c: Column) = concat(hx(pmod(c, lit(256L))), hx(shiftright(c, 8)))
      val payload = unhex(concat((lit(header) +: mults.map(m => le16(u(m)))): _*))
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"), lit("audio").as("kind"), payload.as("payload"))
      val frames = graft.multimodal.Multimodal.audioFrames(media, frameLen = 2)
      graft.multimodal.Multimodal.vadSegments(frames, energyThreshold = 500000000L)
        .orderBy(col("media_id"), col("seg"))
    }),

    // ---- weekly seasonality strength of the daily click-dollar
    // series: one-way variance decomposition over day-of-week
    // groups — η² = SSB/SST with per-group nano-rounded exact
    // within-terms (the PSI ladder in ANOVA form) ----
    "q_seasonality" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .where(col("value").isNotNull && col("event_type") === "click")
        .select(to_date(col("ts")).as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(expr("sum(cents) div 100").as("x"))
        .select((datediff(col("day"),
          lit(java.sql.Date.valueOf("2024-01-01"))) % 7).as("dow"), col("x"))
      graft.ops.Anova.decompose(daily, "dow", "x")
    }),

    // ---- one-way ANOVA across event types (do the segments
    // differ?): same decomposition, classical F over the exact nano
    // sums ----
    "q_anova" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"),
          expr("cast(round(value * 100) as long) div 100").as("x"))
      graft.ops.Anova.decompose(ev, "event_type", "x")
    }),

    // ---- DBSCAN density clustering over the q_geo_radius point
    // cloud: grid-bucketed radius join → core points → components
    // over core-core edges → deterministic min-cluster border
    // assignment. Exact integers end to end ----
    // the labeling itself is memoized in Graphs.dbscanCustomerGrid
    // (the labelsBipartite pattern): the star-loop cost is a shared
    // rebuildable artifact paid once in Bench's warmup_shared_sec,
    // and the memoized result is bit-identical to a fresh run
    "q_dbscan" -> ((s, dir) =>
      graft.ops.Graphs.dbscanCustomerGrid(s, dir).orderBy(col("id")))
  )

  // ==== batch 7: global sequence numbers, journey analytics, and
  // snapshot CDC — the remaining whole-corpus bookkeeping ops ====
  private def journeyQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- contiguous global row ids + ntile(10) with NO global
    // window: literal quantile cuts -> per-bucket counts -> offset +
    // per-bucket row_number (ops.Ids — the zipWithIndex two-pass at
    // the DataFrame layer) ----
    "q_global_ids" -> ((s, dir) => {
      graft.ops.Ids.globalNtile(
          Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
          "n_chars", Seq("doc_id"), n = 10, buckets = 32)
        .select(col("doc_id"), col("row_id"), col("tile"))
        .orderBy(col("row_id"))
    }),

    // ---- cohort retention: first-event-day cohorts x days-since,
    // distinct active users (two keyed aggregates, no window) ----
    "q_cohort_retention" -> ((s, dir) => {
      graft.ops.Journeys.cohortRetention(
          Tables.events(s, dir).where(col("user_id").isNotNull), "user_id", "ts")
        .orderBy(col("cohort_day"), col("period"))
    }),

    // ---- event-type transition matrix: per-user lead() in
    // (ts, event_id) order, counted corpus-wide ----
    "q_transitions" -> ((s, dir) => {
      graft.ops.Journeys.transitions(
          Tables.events(s, dir).where(col("user_id").isNotNull),
          "user_id", "ts", "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type"))
    }),

    // ---- TRUE Damerau-Levenshtein (unrestricted transpositions —
    // native expression) ranking the skeleton-blocked candidates;
    // both engines implement Lowrance-Wagner exactly ----
    "q_damerau" -> ((s, dir) => {
      val parts = Tables.part(s, dir)
      val dirty = parts.where(col("p_partkey") % 11 === 0)
        .select(col("p_partkey").as("dirty_id"),
          regexp_replace(col("p_name"), "e", "").as("dirty_name"))
        .withColumn("__blk", graft.ops.FuzzyJoin.skeletonBlock(col("dirty_name")))
      val cat = parts
        .select(col("p_partkey"), col("p_name"))
        .withColumn("__blk", graft.ops.FuzzyJoin.skeletonBlock(col("p_name")))
      dirty.join(cat, "__blk")
        .select(col("dirty_id"),
          graft.plans.Damerau.damerau(col("dirty_name"), col("p_name"))
            .cast("long").as("dist"),
          col("p_partkey"))
        .groupBy(col("dirty_id"))
        .agg(min(struct(col("dist"), col("p_partkey").as("match_key"))).as("m"))
        .select(col("dirty_id"), col("m.dist").as("dist"),
          col("m.match_key").as("match_key"))
        .orderBy(col("dirty_id"))
    }),

    // ---- URL tree rollup: synthetic 3-level paths exploded to
    // their prefixes, one hash aggregate — per-subtree page counts
    // without recursion ----
    "q_path_rollup" -> ((s, dir) => {
      val path = concat(lit("/s"), pmod(col("doc_id"), lit(5)),
        lit("/c"), pmod(col("doc_id"), lit(17)), lit("/p"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.ops.Urls.pathPrefixes(path, maxDepth = 3)).as("prefix"))
        .groupBy(col("prefix"))
        .agg(count(lit(1)).as("n_pages"))
        .withColumn("level",
          size(filter(split(col("prefix"), "/"), s => length(s) > 0)))
        .orderBy(col("prefix"))
    }),

    // ---- Reciprocal Rank Fusion: two per-nation customer rankings
    // (account balance vs order spend) fused on exact integer
    // 10^9 div (k + rank) contributions — rank-only, so score scales
    // never need calibration; top-5 fused per nation ----
    "q_rrf" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val bal = cust.select(lit("bal").as("lst"),
        col("c_nationkey").cast("long").as("qid"),
        col("c_custkey").as("item"),
        round(col("c_acctbal") * 100).cast("long").as("score"))
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("score"))
        .join(cust.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(lit("spend").as("lst"),
          col("c_nationkey").cast("long").as("qid"),
          col("o_custkey").as("item"), col("score"))
      graft.ops.Fusion.topFused(
        graft.ops.Fusion.rrf(bal.unionByName(spend),
          "lst", "qid", "item", "score", k = 60), 5)
    }),

    // ---- nDCG@10 per nation: balance-ranked customer lists graded
    // against order-count relevance; per-term nano gains on the
    // mirrored ln tree, ideal drawn from the full judgment pool ----
    "q_ndcg" -> ((s, dir) => {
      val (results, judged) = rankEvalFixture(s, dir)
      graft.ops.RankEval.ndcg(results, judged, 10)
    }),

    // ---- MRR per nation: 10^9 div first-relevant-rank, fully
    // integer ----
    "q_mrr" -> ((s, dir) => {
      val (results, judged) = rankEvalFixture(s, dir)
      graft.ops.RankEval.reciprocalRank(results, judged)
    }),

    // ---- Gini coefficient of per-user spend: exact global ranks
    // (no single-task window), one mirrored tree ----
    "q_gini" -> ((s, dir) => {
      val spend = Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      graft.ops.Inequality.gini(spend, "cents", "user_id")
    }),

    // ---- Herfindahl index per event type: how concentrated is
    // each type's value mass across users ----
    "q_hhi" -> ((s, dir) => {
      graft.ops.Inequality.hhi(
          Tables.events(s, dir)
            .where(col("user_id").isNotNull && col("value").isNotNull)
            .select(col("event_type"), col("user_id"),
              round(col("value") * 100).cast("long").as("cents")),
          "event_type", "user_id", "cents")
        .orderBy(col("event_type"))
    }),

    // ---- Flesch readability battery: exact word/sentence/syllable
    // counts (vowel-group heuristic), one mirrored formula ----
    "q_readability" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.TextFunctions.readability(col("text")).as("r"))
        .select(col("doc_id"), col("r.n_words"), col("r.n_sentences"),
          col("r.n_syllables"), col("r.flesch_nano"))
        .orderBy(col("doc_id"))
    }),

    // ---- 7-day rolling click/purchase correlation over the daily
    // volume frame: six exact window sums, one Pearson tree ----
    "q_rolling_corr" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .where(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          coalesce(sum(when(col("event_type") === "click",
            round(col("value") * 100).cast("long"))), lit(0L)).as("click_cents"),
          coalesce(sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long"))), lit(0L)).as("purchase_cents"))
      graft.ops.Association.rollingCorrelation(daily, "day",
          "click_cents", "purchase_cents", windowRows = 7)
        .orderBy(col("day"))
    }),

    // ---- class separability: pairwise centroid distances over the
    // labeled embeddings — cross-scaled integer sums, one division;
    // the (label, dim) cell shuffle never carries vectors ----
    "q_class_sep" -> ((s, dir) => {
      graft.operators.ClassSep.centroidDistances(
          Tables.embeddings(s, dir), "label", "embedding")
        .orderBy(col("label_a"), col("label_b"))
    }),

    // ---- Holt level+trend smoothing (alpha = beta = 1/2) per user:
    // two-state integer recurrence, floor shifts both signs ----
    "q_holt" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Smoothing.holtTrace(ev, "user_id", "ts", "event_id", "cents")
        .orderBy(col("user_id"), col("rn"))
    }),

    // ---- float-domain Holt via the two-level affine chunked scan
    // (daily buckets): the production form of the skew suite's WORST
    // victim (q_holt 9.2x on the hot user). Doubles gated exactly —
    // the oracle replays the identical coefficient dataflow ----
    "q_holt_chunked" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Smoothing.holtTraceChunked(ev, "user_id", "ts", "event_id",
          "cents", bucketSeconds = 86400L)
        .orderBy(col("user_id"), col("rn"))
    }),

    // ---- rendezvous (HRW) shard routing: argmax of 16 keyed
    // hashes — minimal-disruption resharding vs modulo; per-shard
    // population + id envelope as the balance check ----
    "q_rendezvous" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.ops.Sampling.rendezvousShard(col("doc_id"), k = 16).as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("shard"))
    }),

    // ---- interval×interval overlap join: per-(user, day) activity
    // spans × 1-hour error windows, bucketed equi-join with
    // meeting-bucket exactly-once emission; per-incident exposure ----
    "q_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val act = ev
        .groupBy(col("user_id"), to_date(col("ts")))
        .agg(min(unix_micros(col("ts"))).as("a_start"),
          (max(unix_micros(col("ts"))) + 1).as("a_end"))
        .select(col("user_id"), col("a_start"), col("a_end"))
      val inc = ev.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"),
          unix_micros(col("ts")).as("b_start"),
          (unix_micros(col("ts")) + 3600000000L).as("b_end"))
      graft.ops.Joins.intervalOverlapJoin(act, inc,
          "a_start", "a_end", "b_start", "b_end", bucketWidth = 3600000000L)
        .groupBy(col("error_id"))
        .agg(count(lit(1)).as("n_active_intervals"),
          sum(col("overlap_end") - col("overlap_start")).as("overlap_us"))
        .orderBy(col("error_id"))
    }),

    // ---- the KEYED interval overlap: each error meets only ITS OWN
    // user's activity windows — the pre-keying the unkeyed form's
    // measured ×100 volume law (SCALE_NOTES round-9) prescribes at
    // production scale. One shuffled equi-join on the user key with
    // the range predicate as its residual; pair volume is linear in
    // concurrency by construction ----
    "q_interval_join_user" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val act = ev
        .groupBy(col("user_id"), to_date(col("ts")))
        .agg(min(unix_micros(col("ts"))).as("a_start"),
          (max(unix_micros(col("ts"))) + 1).as("a_end"))
        .select(col("user_id"), col("a_start"), col("a_end"))
      val inc = ev.where(col("event_type") === "error")
        .select(col("user_id").as("b_user"), col("event_id").as("error_id"),
          unix_micros(col("ts")).as("b_start"),
          (unix_micros(col("ts")) + 3600000000L).as("b_end"))
      act.join(inc, col("user_id") === col("b_user") &&
          col("a_start") < col("b_end") && col("b_start") < col("a_end"))
        .groupBy(col("error_id"))
        .agg(count(lit(1)).as("n_active_intervals"),
          sum(least(col("a_end"), col("b_end")) -
            greatest(col("a_start"), col("b_start"))).as("overlap_us"))
        .orderBy(col("error_id"))
    }),

    // ---- CUPED variance reduction: pre-period click spend adjusts
    // the post-period purchase spend; θ and both lifts fold from
    // exact integer moment sums ----
    "q_cuped" -> ((s, dir) => {
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      val users = Tables.events(s, dir).where(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          coalesce(sum(when(col("event_type") === "click" && col("ts") < cut,
            round(col("value") * 100).cast("long"))), lit(0L)).as("pre"),
          coalesce(sum(when(col("event_type") === "purchase" && col("ts") >= cut,
            round(col("value") * 100).cast("long"))), lit(0L)).as("post"))
        .select((col("user_id") % 2).as("variant"), col("pre"), col("post"))
      graft.ops.Experiment.cuped(users, "variant", "pre", "post")
    }),

    // ---- A/B reading: user_id parity as the variant, any purchase
    // as conversion; 2x2 counts, lift, closed-form chi-square ----
    "q_ab_test" -> ((s, dir) => {
      val users = Tables.events(s, dir).where(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        .select((col("user_id") % 2).as("variant"), col("conv"))
      graft.ops.Experiment.abTest(users, "variant", "conv")
    }),

    // ---- Kaplan-Meier time-to-purchase (hours), censored at the
    // user's last observed event: log-space survival as order-free
    // nano sums over the duration histogram ----
    "q_kaplan_meier" -> ((s, dir) => {
      val per = Tables.events(s, dir).where(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
          max(col("ts")).as("tl"))
        .select(
          (unix_micros(coalesce(col("tp"), col("tl"))) - unix_micros(col("t0")))
            .as("__us"),
          col("tp").isNotNull.cast("long").as("event"))
        // integer div, not double / + cast: a correctly-rounded double
        // quotient can land ON the next integer and mis-bucket an hour
        .select(expr("__us div 3600000000").as("dur_hours"), col("event"))
      graft.ops.Survival.kaplanMeier(per, "dur_hours", "event")
        .orderBy(col("t"))
    }),

    // ---- Zipf rank-frequency slope over the top-500 tokens: micro
    // log points, exact integer regression sums, one mirrored
    // normal-equation division ----
    "q_zipf" -> ((s, dir) => {
      graft.ops.CorpusStats.zipfSlope(Tables.documents(s, dir), "text", k = 500)
    }),

    // ---- pairwise exact shingle-Jaccard between sources ("are my
    // crawls the same content"): one distinct aggregate, hash-only
    // self-join, metadata-sized pair frame ----
    "q_source_overlap" -> ((s, dir) => {
      graft.ops.CorpusStats.sourceOverlap(Tables.documents(s, dir),
          "source", "text", n = 3)
        .orderBy(col("a"), col("b"))
    }),

    // ---- Benford first-digit audit over order totals: string-head
    // digits (never floor(log10)), zero-filled 1-9 spine, integer
    // deviation of two nano-rounded shares ----
    "q_benford" -> ((s, dir) => {
      graft.ops.Drift.benford(
          Tables.orders(s, dir)
            .select(round(col("o_totalprice") * 100).cast("long").as("cents")),
          "cents")
        .orderBy(col("digit"))
    }),

    // ---- one-pass dictionary tagging (Aho-Corasick): occurrence
    // counts for a 6-term dictionary, overlapping matches included
    // ("atat" in "atatat" twice) — one scan whatever the dictionary
    // size, vs k scans of contains() ----
    "q_multi_match" -> ((s, dir) => {
      val pats = Seq("scan", "join", "data", "stream", "an", "atat")
      Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(col("doc_id"), posexplode(
          graft.plans.MultiMatch.multiMatchCounts(col("text"), pats)))
        .select(col("doc_id"),
          element_at(typedLit(pats), col("pos") + 1).as("pattern"),
          col("col").as("n"))
        .orderBy(col("doc_id"), col("pattern"))
    }),

    // ---- interpolated Kneser-Ney bigram table (D = 3/4): the real
    // LM smoothing — continuation counts back off the discounted
    // mass; top-100 bigrams with all five statistics ----
    "q_kn_bigrams" -> ((s, dir) => {
      graft.ops.Vocab.knBigramTable(Tables.documents(s, dir), "text", k = 100)
    }),

    // ---- calibration bins / ECE: hash-percent confidences vs the
    // long-document label; per-bin exact rational |100·Σy − Σp|
    // over one division, summable to the ECE ----
    "q_calibration" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(
        graft.ops.Sampling.hashBucket(col("doc_id")).cast("long").as("conf_pct"),
        when(length(col("text")) > 500, 1L).otherwise(0L).as("y"))
      graft.ops.Eval.calibrationBins(docs, "conf_pct", "y", bins = 10)
        .orderBy(col("bin"))
    }),

    // ---- exact distributed ROC-AUC (Mann-Whitney with midranks):
    // the JL coordinate-0 score against the label<5 split —
    // integer rank sums end to end, ties handled properly ----
    "q_auc" -> ((s, dir) => {
      val scored = Tables.embeddings(s, dir).select(col("vec_id"),
        element_at(graft.operators.Similarity.randomProject(
          graft.operators.Similarity.quantize(col("embedding")), k = 1), 1).as("score"),
        when(col("label") < 5, 1L).otherwise(0L).as("y"))
      graft.ops.Eval.aucFromScores(scored, "score", "y")
    }),

    // ---- per-document character entropy (garbage/mojibake
    // detector): alphabet-bounded shuffle, nano-rounded ln
    // contributions summed order-free ----
    "q_char_entropy" -> ((s, dir) => {
      graft.ops.Entropy.charEntropy(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ---- weighted shortest paths: 4 Bellman-Ford relaxation
    // rounds from the %202 seed parts, integer weights
    // 1 + (src+dst)%7 — the union-min relaxation replays as 4
    // unrolled SQL levels ----
    "q_sssp" -> ((s, dir) => {
      val ps = graft.ops.Graphs.bipartite(s, dir)
      val sym = graft.ops.Graphs.symmetrize(ps)
      val edges = sym.withColumn("w", lit(1L) + (col("src") + col("dst")) % 7)
      val sources = ps.select(col("src").as("id")).distinct()
        .where(col("id") % 202 === 0)
      graft.operators.Sssp.distances(edges, sources, rounds = 4)
        .orderBy(col("id"))
    }),

    // ---- Adamic-Adar link prediction: wedge pairs on the (eighth
    // of parts) bipartite graph scored by shared-neighbor obscurity;
    // wedge volume checked loudly before the join ----
    "q_adamic_adar" -> ((s, dir) => {
      // l_partkey % 8 == 0 ⟺ src (= 2*partkey) % 16 == 0, so the
      // eighth-of-parts instance is a narrow filter over the shared
      // cached bipartite frame instead of its own lineitem distinct
      val ps = graft.ops.Graphs.bipartite(s, dir).where(col("src") % 16 === 0)
      val sym = graft.ops.Graphs.symmetrize(ps)
      graft.operators.GraphStats.adamicAdar(sym, k = 100)
    }),
    // ---- hub-capped Adamic-Adar: the PRODUCTION twin on the same
    // instance (r12 verdict item #4 — the exact form above is the
    // refusing receipt at sf10's 781M wedges). Each node keeps its 16
    // smallest neighbors; exact AA over the capped graph (the cap IS
    // the definition, so the oracle replays it), wedge volume
    // ≤ |V|·256 — linear in nodes. Adjacent pairs excluded against
    // the FULL graph ----
    "q_adamic_adar_capped" -> ((s, dir) => {
      val ps = graft.ops.Graphs.bipartite(s, dir).where(col("src") % 16 === 0)
      val sym = graft.ops.Graphs.symmetrize(ps)
      graft.operators.GraphStats.adamicAdarCapped(sym, k = 100, hubCap = 16)
    }),
    // ---- the cap's explicit cost: dropped-wedge accounting from one
    // degree aggregate — published as its own oracle-gated row so the
    // cap is a judged trade, not a trusted one ----
    "q_adamic_adar_capstats" -> ((s, dir) => {
      val ps = graft.ops.Graphs.bipartite(s, dir).where(col("src") % 16 === 0)
      val sym = graft.ops.Graphs.symmetrize(ps)
      graft.operators.GraphStats.adamicAdarCapStats(sym, hubCap = 16)
    }),

    // ---- geofence: point-in-convex-polygon as a pure integer
    // cross-product conjunction (no join, no shuffle) over the
    // q_geo_radius hash-derived coordinates; diamond fence ----
    "q_geofence" -> ((s, dir) => {
      val pts = Tables.customer(s, dir).select(col("c_custkey").as("id"),
        pmod(graft.plans.Hash60.hash60(
          concat(lit("gx"), col("c_custkey").cast("string"))), lit(1000000L)).as("x"),
        pmod(graft.plans.Hash60.hash60(
          concat(lit("gy"), col("c_custkey").cast("string"))), lit(1000000L)).as("y"))
      val diamond = Seq((500000L, 100000L), (900000L, 500000L),
        (500000L, 900000L), (100000L, 500000L))
      pts.select(col("id"), col("x"), col("y"),
          graft.ops.Geo.inConvexPolygon(col("x"), col("y"), diamond).as("inside"))
        .orderBy(col("id"))
    }),

    // ---- robust median imputation: every 7th event's value nulled
    // then refilled with the per-type exact lower median — a value
    // that occurs, not a mean dragged by the tail ----
    "q_impute" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          when(col("event_id") % 7 === 0, lit(null).cast("long"))
            .otherwise(round(col("value") * 100).cast("long")).as("cents"))
      graft.ops.Outliers.imputeMedian(ev, Seq("event_type"), "cents")
        .orderBy(col("event_id"))
    }),

    // ---- Newman modularity of the labelprop partition: integer
    // intra-edge and degree-mass sums per community, one IEEE
    // formula per community row — grades the community structure
    // the q_labelprop run found ----
    "q_modularity" -> ((s, dir) => {
      graft.operators.GraphStats.modularity(
          graft.ops.Graphs.bipartiteSym(s, dir), graft.ops.Graphs.labelsBipartite(s, dir))
        .orderBy(col("lab"))
    }),

    // ---- degree assortativity of the bipartite graph: exact
    // integer moment sums over one degree join, Pearson formula as
    // the only IEEE step ----
    "q_assortativity" -> ((s, dir) => {
      graft.operators.GraphStats.assortativity(graft.ops.Graphs.bipartiteSym(s, dir))
    }),

    // ---- winsorization at the exact discrete per-type [p05, p95]:
    // tails clipped to values that actually occur, rows kept ----
    "q_winsorize" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Outliers.winsorize(ev, Seq("event_type"), "cents", 0.05, 0.95)
        .orderBy(col("event_id"))
    }),

    // ---- CUSUM change-point traces per user over click cents:
    // max(0, s + (v - target)) pure-integer recurrence, alarms above
    // 50-dollar cumulative excess over a $1.00 target level ----
    "q_cusum" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Smoothing.cusumTrace(ev, "user_id", "ts", "event_id",
          "cents", target = 100L, threshold = 5000L)
        .orderBy(col("user_id"), col("rn"))
    }),

    // ---- the SAME trace via the two-level (max,+) chunked scan
    // (daily buckets): the skew-proof production form — per-key
    // sequential work is O(#buckets), so the skew twin's 20k-event
    // hot user parallelizes ~30 ways instead of one O(n^2) fold
    // task. Same oracle as q_cusum: chunked == sequential is the
    // cross-engine hash claim ----
    "q_cusum_chunked" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Smoothing.cusumTraceChunked(ev, "user_id", "ts", "event_id",
          "cents", target = 100L, threshold = 5000L, bucketSeconds = 86400L)
        .orderBy(col("user_id"), col("rn"))
    }),

    // ---- deterministic distributed classifier training (the
    // quality-scorer shape): algebraic-sigmoid link (no libm — IEEE
    // mul/div/abs only, bit-identical cross-engine), micro-rounded
    // residuals, EXACT order-free decimal gradient sums, 3 GD
    // iterations; the oracle replays the identical dataflow and the
    // raw double weights hash-match ----
    "q_logreg" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .where(col("text").isNotNull && col("lang").isNotNull)
        .select(
          (col("lang") === "en").cast("long").as("y"),
          expr("length(text) div 100").cast("long").as("x1"),
          expr("size(split(text, ' ')) div 10").cast("long").as("x2"),
          length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("x3"))
      graft.operators.LogReg.weightsFrame(d, "y", Seq("x1", "x2", "x3"),
        lr = 0.5, iters = 3)
        .orderBy(col("term"))
    }),

    // ---- pointwise mutual information between lang and source:
    // one cell-count aggregate, marginals folded from the cell
    // frame, nano-rounded ln contributions (the Drift.psi
    // determinism contract) ----
    "q_mutual_info" -> ((s, dir) => {
      graft.ops.Association.mutualInformation(
          Tables.documents(s, dir), "lang", "source")
        .orderBy(col("lang"), col("source"))
    }),

    // ---- Johnson-Lindenstrauss signed random projection: every
    // embedding reduced to 8 exact-integer coordinates against the
    // sign-LSH plane family — per-row map, no shuffle. Emitted as
    // exploded scalar rows (vec_id, j, d) rather than one array
    // column so the driver's pandas comparator can hash it
    // (array<long> cells are unhashable there — r7 verdict #1) ----
    "q_random_proj" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      emb.select(col("vec_id"),
          posexplode(graft.operators.Similarity.randomProject(
            graft.operators.Similarity.quantize(col("embedding")), k = 8)).as(Seq("j", "d")))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("d"))
        .orderBy(col("vec_id"), col("j"))
    }),

    // ---- count-min join-size estimation: the self-join cardinality
    // of lineitem on l_partkey (= the second frequency moment F2)
    // estimated from a 4x4096 grid's inner product, next to the
    // exact answer — grid-sized work, zero input rescans; both
    // numbers deterministic integers, so both are oracle-exact ----
    "q_cm_joinsize" -> ((s, dir) => {
      val keys = Tables.lineitem(s, dir).select(col("l_partkey"))
      // per-key counts feed BOTH the grid (buildWeighted hashes each
      // distinct key once — identical cells, ~3% of the md5 calls;
      // r14 optimization) and the exact F2 — one aggregate, two uses
      val counts = keys.groupBy(col("l_partkey")).agg(count(lit(1)).as("f"))
      val grid = graft.operators.CountMin.buildWeighted(counts, "l_partkey", "f",
        depth = 4, width = 4096)
      val est = graft.operators.CountMin.joinSizeEstimate(grid, grid)
      val exact = counts
        .agg(sum(col("f") * col("f")).cast("long").as("exact_size"))
      est.crossJoin(broadcast(exact)) // two 1-row scalars
    }),

    // ---- HITS hubs & authorities (2 iterations) over the DIRECTED
    // part -> supplier graph: integer half-step sums with a
    // ceil(max/1e9) rescale div — replays as an unrolled SQL replica
    // with scalar-subquery divisors ----
    "q_hits" -> ((s, dir) => {
      val edges = graft.ops.Graphs.bipartite(s, dir)
      graft.operators.Hits.scores(edges, iters = 2)
        .orderBy(col("id"))
    }),

    // ---- edit-distance ranking over the skeleton-blocked candidate
    // pairs (the q_jaro_rank instance scored by Spark's built-in
    // codegen'd levenshtein — unit costs, identical in DuckDB):
    // exact integer distances, best-match-per-dirty-name via the
    // (distance, catalog key) struct arg-min ----
    "q_levenshtein" -> ((s, dir) => {
      val parts = Tables.part(s, dir)
      val dirty = parts.where(col("p_partkey") % 11 === 0)
        .select(col("p_partkey").as("dirty_id"),
          regexp_replace(col("p_name"), "e", "").as("dirty_name"))
        .withColumn("__blk", graft.ops.FuzzyJoin.skeletonBlock(col("dirty_name")))
      val cat = parts
        .select(col("p_partkey"), col("p_name"))
        .withColumn("__blk", graft.ops.FuzzyJoin.skeletonBlock(col("p_name")))
      dirty.join(cat, "__blk")
        .select(col("dirty_id"),
          levenshtein(col("dirty_name"), col("p_name")).cast("long").as("dist"),
          col("p_partkey"))
        .groupBy(col("dirty_id"))
        .agg(min(struct(col("dist"), col("p_partkey").as("match_key"))).as("m"))
        .select(col("dirty_id"), col("m.dist").as("dist"),
          col("m.match_key").as("match_key"))
        .orderBy(col("dirty_id"))
    }),

    // ---- Unicode normalization: accent folding (NFD + strip Mn,
    // native codegen'd expressions) and NFC recomposition over an
    // accent-injected corpus; md5 digests keep the compare exact
    // and the output narrow ----
    "q_normalize" -> ((s, dir) => {
      val folded = graft.plans.Normalize.stripAccents(
        translate(col("text"), "aeiou", "àéîøü"))
      val recomposed = graft.plans.Normalize.nfc(
        concat(substring(col("text"), 1, 40), lit("e\u0301"))) // decomposed e + combining acute
      Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(col("doc_id"),
          md5(folded.cast("binary")).as("fold_md5"),
          length(folded).cast("long").as("fold_len"),
          md5(recomposed.cast("binary")).as("nfc_md5"))
        .orderBy(col("doc_id"))
    }),

    // ---- synchronous label-propagation communities (3 rounds,
    // deterministic (count DESC, label ASC) votes) over the
    // part<->supplier bipartite graph — replays as a 3x-unrolled
    // SQL replica, the q_pagerank precedent ----
    "q_labelprop" -> ((s, dir) => {
      graft.ops.Graphs.labelsBipartite(s, dir)
        .orderBy(col("id"))
    }),

    // ---- per-user EWMA trace (alpha = 1/2) over click values in
    // exact integer cents: the >>1 recurrence replays bit-for-bit as
    // a recursive CTE's floor division ----
    "q_ewma" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Smoothing.ewmaTrace(ev, "user_id", "ts", "event_id",
          "cents", num = 1, log2Den = 1)
        .orderBy(col("user_id"), col("rn"))
    }),

    // ---- float-domain EWMA via the two-level affine chunked scan
    // (daily buckets): the skew-proof production form. The doubles
    // are gated EXACTLY — the oracle replays the identical IEEE
    // mul/add sequence (per-bucket A/B/Bp recurrences, bucket-carry
    // recursion, final A·s_in + B), not an epsilon compare ----
    "q_ewma_chunked" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Smoothing.ewmaTraceChunked(ev, "user_id", "ts", "event_id",
          "cents", num = 1, log2Den = 1, bucketSeconds = 86400L)
        .orderBy(col("user_id"), col("rn"))
    }),

    // ---- Pareto skyline: line items on the price-vs-quantity
    // frontier (maximize both). Range-bucketed sort-scan — the only
    // single-task window is the O(buckets) per-bucket-max frame;
    // comparisons only, so exact at any partitioning ----
    "q_skyline" -> ((s, dir) => {
      val pts = Tables.lineitem(s, dir)
        .select(round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
          col("l_quantity").cast("long").as("qty"))
      graft.ops.Skyline.frontier2D(pts, "price_cents", "qty")
        .orderBy(col("price_cents"))
    }),

    // ---- ordered event-sequence funnel (signup → view → purchase,
    // 7-day conversion window): k keyed reductions on the user key,
    // no per-user arrays; strict-after semantics on exact micros ----
    "q_funnel_steps" -> ((s, dir) => {
      graft.ops.Journeys.eventFunnel(
          Tables.events(s, dir).where(col("user_id").isNotNull),
          "user_id", "ts", "event_type",
          Seq("signup", "view", "purchase"),
          windowSec = Some(7L * 24 * 3600))
        .orderBy(col("step"))
    }),

    // ---- equi-DEPTH histogram (contrast q_histogram's equi-width):
    // 20 tiles of equal population via the no-global-window ntile;
    // min/max per tile are exact double endpoints ----
    "q_histogram_eqdepth" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .where(col("value").isNotNull)
        .select(col("event_id"), col("value"))
      graft.ops.Ids.globalNtile(ev, "value", Seq("event_id"), n = 20, buckets = 32)
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("tile"))
    }),

    // ---- deterministic contrastive negatives: 3 corpus-uniform
    // partners per doc via dense ids + hash60 mod N (no rand(), no
    // global window; self-draws dropped, not re-drawn) ----
    "q_negatives" -> ((s, dir) => {
      graft.ops.Negatives.sample(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id", k = 3)
        .orderBy(col("anchor_id"), col("j"))
    }),

    // ---- temperature-flattened (α=1/2) language mixture: smallest
    // lang kept whole, larger langs downsampled at sqrt(n_min/n) —
    // IEEE-exact cutoffs, so the oracle replicates them bit-for-bit ----
    "q_temp_mix" -> ((s, dir) => {
      graft.ops.Mixture.byTemperatureSqrt(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          "doc_id", "lang")
        .orderBy(col("doc_id"))
    }),

    // ---- blocked fuzzy match: dirty (vowel-dropped) names linked
    // back to the catalog within 2 edits. Consonant-skeleton
    // blocking (Soundex-style normalized key): block cardinality
    // tracks distinct underlying names, so candidate volume stays
    // proportional to the TRUE pair output (measured 100% verify
    // precision on this corpus — every candidate survives
    // levenshtein) instead of collapsing into a ~26-block first-char
    // key whose blocks grow linearly with the corpus ----
    "q_fuzzy_match" -> ((s, dir) => {
      val parts = Tables.part(s, dir)
      val dirty = parts.where(col("p_partkey") % 7 === 0)
        .select(col("p_partkey").as("dirty_id"),
          regexp_replace(col("p_name"), "e", "").as("dirty_name"))
      graft.ops.FuzzyJoin.pairs(dirty, parts, "dirty_id", "p_partkey",
          "dirty_name", "p_name", maxDist = 2,
          blockKey = graft.ops.FuzzyJoin.skeletonBlock)
        .orderBy(col("dirty_id"), col("p_partkey"))
    }),

    // ---- overlapping-interval merge (islands): per-user event
    // intervals of 60..359 s coalesced into maximal covered spans ----
    "q_intervals" -> ((s, dir) => {
      val iv = Tables.events(s, dir).where(col("user_id").isNotNull)
        .select(col("user_id"), col("ts").as("s_ts"),
          expr("timestampadd(SECOND, CAST(event_id % 300 + 60 AS INT), ts)").as("e_ts"))
      graft.ops.Intervals.mergeOverlapping(iv, "user_id", "s_ts", "e_ts")
        .orderBy(col("user_id"), col("start"))
    }),

    // ---- snapshot CDC: keyed diff of two full dumps into
    // added/removed/changed via one full-outer join (the delta the
    // reference's truncate-and-reload sink cannot compute) ----
    "q_snapshot_diff" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val oldSnap = orders.where(col("o_orderkey") % 97 =!= 0)
      val newSnap = orders.where(col("o_orderkey") % 89 =!= 0)
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 5 === 0,
            concat(lit("ESC-"), col("o_orderpriority")))
            .otherwise(col("o_orderpriority")))
      graft.operators.SnapshotDiff.diff(oldSnap, newSnap, "o_orderkey",
          Seq("o_orderstatus", "o_orderpriority"))
        .orderBy(col("o_orderkey"))
    })
  )

  // ==== batch 5: temporal joins, deterministic sampling, exact
  // quantiles — training-pipeline staples beyond plain equi-joins ====
  private def temporalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- as-of join: each purchase picks up the most recent click
    // at-or-before it per user (union + window plan — one shuffle,
    // no range join; see ops.Joins.asOfJoin) ----
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          round(col("value") * 100).cast("long").as("click_cents"))
      graft.ops.Joins.asOfJoin(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", tieBreak = "click_id",
          payload = Seq("click_id", "click_cents"))
        .select(col("event_id"), col("user_id"), col("click_id"), col("click_cents"))
        .orderBy(col("event_id"))
    }),

    // ---- point-in-interval range join via bucketed equi-join:
    // sampled order-week intervals × discounted lineitem ship days ----
    "q_range_join" -> ((s, dir) => {
      val iv = Tables.orders(s, dir).where(col("o_orderkey") % 200 === 0)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("long").as("start_day"))
        .withColumn("end_day", col("start_day") + 5)
      val pts = Tables.lineitem(s, dir).where(col("l_discount") > 0.08)
        .select(col("l_quantity"),
          datediff(col("l_shipdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("long").as("ship_day"))
      graft.ops.Joins.rangeJoinByBucket(pts, iv, "ship_day", "start_day", "end_day",
          bucketWidth = 4)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_matches"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- deterministic hash split (train/valid/test as a pure
    // function of doc_id — engine-reproducible md5 buckets) ----
    "q_hash_split" -> ((s, dir) => {
      graft.ops.Sampling.assignSplit(Tables.documents(s, dir), "doc_id", 80, 10)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("split"), col("lang"))
    }),

    // ---- sequence packing: deterministic context-window layout —
    // running token total per lang shard cut at a 2048-token budget ----
    "q_pack_budget" -> ((s, dir) => {
      import graft.functions.{TextFunctions => TF}
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TF.bpeishTokenCount(col("text")).cast("long").as("n_tok"))
      graft.ops.Packing.packByBudget(docs, "doc_id", "n_tok", 2048, Seq("lang"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // ---- full outer join (both-side null fill — the one outer-join
    // shape no other query exercises) ----
    "q_full_outer" -> ((s, dir) => {
      val c = Tables.customer(s, dir).where(col("c_custkey") < 200)
        .select(col("c_custkey").as("custkey"), col("c_name"))
      val o = Tables.orders(s, dir).where(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_big_orders"))
      c.join(o, Seq("custkey"), "full_outer")
        .select(col("custkey"), col("c_name"), col("n_big_orders"))
        .orderBy(col("custkey"))
    }),

    // ---- distribution window functions: ntile / percent_rank /
    // cume_dist / dense_rank under an explicit total order ----
    "q_window_ranks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").asc_nulls_first, col("event_id").asc)
      Tables.events(s, dir).where(col("user_id").isNotNull && col("user_id") < 20)
        .select(col("event_id"), col("user_id"), col("value"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          dense_rank().over(w).cast("long").as("drank"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- string/null cleaning kit (ETL normalization surface):
    // case folding, trim, literal + regex replace, translate,
    // substring, nullif/coalesce ----
    "q_clean_kit" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          lower(substring(col("text"), 1, 40)).as("head_lower"),
          upper(col("lang")).as("lang_upper"),
          trim(substring(col("text"), 1, 20)).as("head_trim"),
          regexp_replace(substring(col("text"), 1, 60), "[aeiou]", "_").as("devoweled"),
          translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"),
          nullif(col("lang"), lit("en")).as("lang_nullif"),
          coalesce(nullif(col("lang"), lit("en")), lit("english")).as("lang_coalesced"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ---- stratified deterministic sampling: per-language keep
    // percentages (the deterministic sampleBy) ----
    "q_strat_sample" -> ((s, dir) => {
      graft.ops.Sampling.stratifiedSampleByHash(
          Tables.documents(s, dir), "doc_id", "lang",
          Map("en" -> 30, "de" -> 100), defaultPct = 60)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    }),

    // ---- exact discrete quantiles per group: sorted integer-cents
    // array indexed at floor((n-1)·p) — deterministic in any engine,
    // unlike interpolated percentile_cont over doubles ----
    "q_quantiles" -> ((s, dir) => {
      Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("cents"))).as("sorted"), count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          (element_at(col("sorted"), (floor((col("n") - 1) * 0.5) + 1).cast("int")) / 100.0).as("p50"),
          (element_at(col("sorted"), (floor((col("n") - 1) * 0.9) + 1).cast("int")) / 100.0).as("p90"),
          (element_at(col("sorted"), (floor((col("n") - 1) * 0.99) + 1).cast("int")) / 100.0).as("p99"))
        .orderBy(col("event_type"))
    }),

    // ---- exact two-sample KS drift between the month's halves:
    // cross-multiplied cumulative counts keep the statistic in
    // integers (cross-engine bit-exact); the cumulative pass runs
    // over the distinct-cent histogram, not the rows ----
    "q_ks_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("ts"), round(col("value") * 100).cast("long").as("cents"))
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      graft.ops.Drift.ksStatistic(
        ev.where(col("ts") < cut), ev.where(col("ts") >= cut), "cents")
    }),

    // ---- PSI over the same month-halves: per-bucket contributions
    // in integer nano-units (Laplace-smoothed shares), so the total
    // is an exact long sum — the deterministic-divergence companion
    // to q_ks_drift ----
    "q_psi_bins" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("ts"), round(col("value") * 100).cast("long").as("cents"))
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      graft.ops.Drift.psi(
          ev.where(col("ts") < cut), ev.where(col("ts") >= cut), "cents", width = 500L)
        .orderBy(col("bucket"))
    }),

    // ---- water-filling domain caps: per-language char budgets —
    // the level τ with Σ min(n_g, τ) = budget; tail languages kept
    // whole, heavy ones capped at τ (+1 remainder units in group
    // order). Exact integers end to end ----
    "q_water_fill" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .groupBy(col("lang")).agg(sum(col("n_chars")).as("n_chars"))
      graft.ops.Mixture.waterFill(counts, "lang", "n_chars", budget = 140000L)
        .orderBy(col("lang"))
    }),

    // ---- market-basket mining on the deterministic quarter of
    // orders (the q_triangles sizing): apriori-pruned frequent part
    // pairs, then item-item cosine in exact nano-units (IEEE sqrt +
    // division are correctly rounded; the counts do the summing) ----
    "q_freq_pairs" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).where(col("l_orderkey") % 4 === 0)
      graft.ops.Baskets.frequentPairs(li, "l_orderkey", "l_partkey", minSupport = 2)
        .orderBy(col("item_a"), col("item_b"))
    }),
    "q_item_cosine" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).where(col("l_orderkey") % 4 === 0)
      graft.ops.Baskets.cosinePairs(li, "l_orderkey", "l_partkey", minSupport = 2)
        .orderBy(col("item_a"), col("item_b"))
    }),

    // ---- spatial radius join: customer points on a synthetic
    // 1e6×1e6 integer plane (hash-derived coordinates — engine-
    // reproducible), all pairs within 20000 units via the 3×3 grid
    // equi-join; exact integer distances, brute-force SQL replica ----
    "q_geo_radius" -> ((s, dir) => {
      val pts = Tables.customer(s, dir).select(col("c_custkey").as("id"),
        pmod(graft.plans.Hash60.hash60(
          concat(lit("gx"), col("c_custkey").cast("string"))), lit(1000000L)).as("x"),
        pmod(graft.plans.Hash60.hash60(
          concat(lit("gy"), col("c_custkey").cast("string"))), lit(1000000L)).as("y"))
      graft.ops.Geo.radiusPairs(pts, "id", "x", "y", radius = 20000L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- time-weighted average (TWAP / sensor-uptime convention):
    // last-observation-carried-forward weighting over one day, exact
    // integer cents × whole-second weights, one IEEE division ----
    "q_twap" -> ((s, dir) => {
      val obs = Tables.events(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), unix_timestamp(col("ts")).as("tsec"))
        .agg(max(round(col("value") * 100).cast("long")).as("cents"))
        .select(col("event_type"), timestamp_seconds(col("tsec")).as("ts"), col("cents"))
      graft.ops.Resample.timeWeightedAvg(obs, Seq("event_type"), "ts", "cents",
          startEpoch = 1704240000L, endEpoch = 1704326400L)
        .orderBy(col("event_type"))
    }),

    // ---- OHLC bars: 10-minute candlesticks per event type (open/
    // close by instant via min_by/max_by, exact cents; instants
    // pre-deduped max-per-second, the q_twap convention) ----
    "q_ohlc" -> ((s, dir) => {
      val obs = Tables.events(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), unix_timestamp(col("ts")).as("tsec"))
        .agg(max(round(col("value") * 100).cast("long")).as("cents"))
        .select(col("event_type"), timestamp_seconds(col("tsec")).as("ts"), col("cents"))
      graft.ops.Resample.ohlc(obs, Seq("event_type"), "ts", "cents", bucketSeconds = 600L)
        .select(col("event_type"), unix_timestamp(col("bucket_start")).as("bucket_epoch"),
          col("open"), col("high"), col("low"), col("close"), col("n_obs"))
        .orderBy(col("event_type"), col("bucket_epoch"))
    }),

    // ---- robust outliers (Hampel: |x − median| > 3·MAD): exact
    // discrete medians over integer cents — no floating point in
    // the rule at all, so the flags replicate bit-for-bit ----
    "q_mad_outliers" -> ((s, dir) => {
      val v = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      val stats = graft.ops.Outliers.groupStats(v, Seq("event_type"), "cents")
      val counts = graft.ops.Outliers.flag(v, Seq("event_type"), "cents", 3)
        .groupBy(col("event_type"))
        .agg(sum(col("is_outlier").cast("long")).as("n_outliers"))
      stats.join(counts, Seq("event_type"))
        .select(col("event_type"), col("n"), col("median"), col("mad"), col("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // ---- regular-grid resampling with linear interpolation: the
    // value-estimating extension of the hourly null-filled grid.
    // Integer-cents observations, one IEEE division per point —
    // bit-identical cross-engine; NULL outside each key's observed
    // range (extrapolation invents data) ----
    "q_interpolate" -> ((s, dir) => {
      val obs = Tables.events(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), unix_timestamp(col("ts")).as("tsec"))
        .agg(max(round(col("value") * 100).cast("long")).as("cents"))
        .select(col("event_type"), timestamp_seconds(col("tsec")).as("ts"), col("cents"))
      graft.ops.Resample.interpolate(obs, Seq("event_type"), "ts", "cents",
          startEpoch = 1704240000L, endEpoch = 1704412800L, stepSeconds = 3600)
        .select(col("event_type"),
          unix_timestamp(col("grid_ts")).cast("long").as("grid_epoch"), col("value"))
        .orderBy(col("event_type"), col("grid_epoch"))
    })
  )

  // ==== batch 4: rollup, standalone mode, simhash pairs, and
  // the one rows-only sketch entry (the rest are oracled) ====
  private def extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- grouping sets surface (free in Spark; absent in reference) ----
    "q_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- A6 standalone: deterministic mode per key ----
    "q_mode_det" -> ((s, dir) => {
      Tables.events(s, dir).where(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(graft.functions.DeterministicMode.modeDet(col("event_type")).as("dominant_type"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("user_id"))
    }),

    // ---- SimHash banded Hamming pairs (fully oracle-mirrored) ----
    "q_simhash_pairs" -> ((s, dir) => {
      graft.operators.SimHash.hammingPairs(
        graft.operators.SimHash.fingerprints(Tables.documents(s, dir), "text"), maxDist = 3)
        .select(col("d1"), col("d2"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("d1"), col("d2"))
    }),

    // ---- nested gold round-trip: build the FULL nested daily recap
    // (hourly array of structs with embedded slot arrays), then
    // explode it back to flat rows — proves the A8/A9 nested assembly
    // against the same oracle the flat path uses ----
    "q_recap_nested" -> ((s, dir) => {
      Recap.daily(Recap.hourly(Recap.slotFirst(obs(s, dir))))
        .select(col("location_id"), col("obs_date"), col("is_full_recap"),
          explode(col("hourly")).as("h"))
        .select(
          col("location_id"), col("obs_date"), col("is_full_recap"),
          col("h.hour").cast("long").as("obs_hour"),
          col("h.avg_temp_c"), col("h.min_temp_c"), col("h.max_temp_c"),
          col("h.dominant_condition"), col("h.total_precip_mm"), col("h.n_obs"),
          size(filter(col("h.data_points"), p => p.isNotNull)).cast("long").as("n_slots_filled")
        )
        .orderBy(col("location_id"), col("obs_date"), col("obs_hour"))
    }),

    // ---- cube (full grouping-sets lattice) ----
    "q_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_cents"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    }),

    // ---- explicit GROUPING SETS (the cube/rollup generalization:
    // exactly the requested grains, one pass): per-status, per-
    // priority, and grand-total grains without the cube's cross ----
    "q_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_cents"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    }),

    // ---- UNPIVOT / melt (the pivot inverse): the per-user wide
    // event-type count matrix back to long (user, event_type, n)
    // triples — ids stay, value columns become rows ----
    "q_unpivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.events(s, dir).where(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L)
      wide.unpivot(Array(col("user_id")), types.map(col).toArray,
          "event_type", "n")
        .orderBy(col("user_id"), col("event_type"))
    }),

    // ---- semi-structured JSON parsing (the reference's raw payloads
    // are nested JSON; here: extract + type + aggregate) ----
    "q_json_extract" -> ((s, dir) => {
      Tables.events(s, dir).where(col("user_id").isNotNull)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // ---- set operations (engine surface beyond the reference) ----
    "q_set_ops" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val clickers = ev.where(col("event_type") === "click").select(col("user_id"))
      val buyers = ev.where(col("event_type") === "purchase").select(col("user_id"))
      val both = clickers.intersect(buyers).withColumn("set_op", lit("both"))
      val clickOnly = clickers.except(buyers).withColumn("set_op", lit("click_only"))
      both.unionByName(clickOnly).orderBy(col("set_op"), col("user_id"))
    }),

    // ---- distinct counting (exact; the approx fast path is the
    // deliberately-unregistered engine-private HLL — see the sketch
    // section comment) ----
    "q_distinct_stats" -> ((s, dir) => {
      Tables.events(s, dir).where(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_rows"),
          countDistinct(to_date(col("ts"))).as("n_days")
        )
        .orderBy(col("event_type"))
    }),

    // ---- embedding-cosine near-dup pairs: sign-LSH banded candidates
    // + exact quantized verify (the crossJoin baseline lives only in
    // TrainingOpsSpec's equality check — no all-pairs plan ships) ----
    "q_embed_neardup" -> ((s, dir) => {
      // the DEGENERATE-REFERENCE regime, kept registered as the
      // measured scale receipts (sf1 exponent 1.64 — a volume law of
      // threshold-0.5 banding, not a plan defect). The explicit
      // raised budget opts this receipts instance out of the default
      // candidate-volume guard; any caller using the DEFAULTS on a
      // dense corpus now fails loud instead (r9 verdict item #2).
      // planesPerBand=4 PINNED since r14: the operator default is now
      // the n-scaled AutoPlanes law; this receipt replays the historic
      // 16x4 regime its oracle mirrors
      graft.operators.Similarity.cosineNearDupPairsLsh(Tables.embeddings(s, dir), 0.5,
          planesPerBand = 4, maxCandidatePairs = Long.MaxValue)
        .orderBy(col("a_id"), col("b_id"))
    }),
    // ---- tuned high-threshold near-dup: the config banding theory
    // actually prescribes for dup DETECTION (threshold 0.9, bands =
    // lshParams(0.9, 0.01, 12) = 28, vs the degenerate selectivity
    // any config has at 0.5 — see Similarity.lshParams). The corpus
    // is seeded with a deterministic near-dup twin per vector
    // (per-dim factors 1 + k/128, exactly representable doubles, so
    // the oracle rebuilds the same twins bit-for-bit).
    // planesPerBand SCALES WITH n (r12 verdict item #2): the r11-r12
    // pinned r=12 made random bucket collisions quadratic
    // (bands·n²/2^13) and guard-refused at sf10 with 845M pre-counted
    // candidates; r = ⌈log₂ n⌉ + 5 pins them ≤ bands/64 · n — linear.
    // n is one metadata-cheap count; the oracle derives the SAME r
    // from its own COUNT(*) via the same integer power-of-two scan ----
    "q_embed_neardup_hi" -> ((s, dir) => {
      val nCorpus = 2L * Tables.embeddings(s, dir).count() // base + twins
      graft.operators.Similarity.cosineNearDupPairsLsh(
          graft.operators.Similarity.twinSeeded(Tables.embeddings(s, dir)),
          0.9, bands = 28,
          planesPerBand = graft.operators.Similarity.autoPlanesPerBand(nCorpus))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ---- sketches & stubs. The native-Datasketches approximate
    // distinct path (operators.Sketches / approx_count_distinct) is
    // deliberately NOT registered: its sketch bytes are
    // engine-private, so it can never carry a cross-engine oracle —
    // its accuracy is spec-bounded instead (SketchSpec: estimate
    // within 3×rsd of exact per group on the real data) and the
    // portable twin q_hll_portable carries the full exact
    // cross-engine oracle for the same query shape. Every query
    // registered here has an exact oracle (constant planes and
    // md5-seeded stubs are SQL-replicable) ----

    // ---- count-min sketch: mergeable frequency grid over lineitem
    // supplier keys, estimated at every supplier probe. Deterministic
    // md5-hash cells ⇒ the approximate estimates themselves are
    // exact-oracle-reproducible ----
    "q_countmin" -> ((s, dir) => {
      val cells = graft.operators.CountMin.build(
        Tables.lineitem(s, dir).select(col("l_suppkey")), "l_suppkey",
        depth = 4, width = 512)
      graft.operators.CountMin.estimate(cells,
          Tables.supplier(s, dir).select(col("s_suppkey").as("l_suppkey")),
          "l_suppkey", depth = 4, width = 512)
        .select(col("l_suppkey").as("s_suppkey"), col("est"))
        .orderBy(col("s_suppkey"))
    }),
    // ---- sketch-gated exact heavy hitters: the count-min gate
    // passes a superset (no false negatives), the exact re-count
    // removes false positives — so the ORACLE is the plain
    // GROUP BY + HAVING the operator avoids running over every
    // distinct key ----
    "q_heavy_hitters" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(split(col("text"), " +")).as("token"))
        .where(length(col("token")) > 0)
      graft.operators.HeavyHitters.exactAtLeast(toks, "token", 0.0337)
        .orderBy(col("cnt").desc, col("token"))
    }),
    // ---- mergeable quantile sketch: HDR-style integer log bins
    // (exact floor-log2, no IEEE log) built at a fine (returnflag,
    // linestatus) grain, sum-merged to returnflag, quantiles read
    // off the merged counts. The oracle bins DIRECTLY at returnflag
    // grain — hash equality proves rollup ≡ direct build across
    // engines, same contract as q_hll_portable ----
    "q_quantile_sketch" -> ((s, dir) => {
      val cents = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val fine = graft.operators.QuantileSketch.build(
        cents, Seq("l_returnflag", "l_linestatus"), "cents")
      val merged = graft.operators.QuantileSketch.rollup(fine, Seq("l_returnflag"))
      graft.operators.QuantileSketch.estimate(merged, Seq("l_returnflag"), Seq(0.5, 0.9, 0.99))
        .orderBy(col("l_returnflag"), col("q"))
    }),
    // ---- portable HLL: engine-independent register ROWS built at a
    // fine (event_type, day) grain, max-merged to event_type, then
    // estimated as whole counts. The DuckDB oracle builds the
    // event_type registers DIRECTLY from raw data — the hash match
    // proves rollup ≡ direct build ACROSS ENGINES, the portable-
    // sketch contract the native Datasketches binaries behind
    // the native-Datasketches fast path cannot offer ----
    "q_hll_portable" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
        .withColumn("day", to_date(col("ts")))
      val daily = graft.operators.PortableHll.registers(ev, Seq("event_type", "day"), "user_id")
      val merged = graft.operators.PortableHll.rollup(daily, Seq("event_type"))
      graft.operators.PortableHll.estimate(merged, Seq("event_type"), out = "est_users")
        .orderBy(col("event_type"))
    }),
    // ---- KMV bottom-k sketch: fine (event_type, day) grain build,
    // bottom-k rollup to event_type, KMV distinct estimate. The
    // DuckDB oracle builds the bottom-k DIRECTLY at event_type grain
    // (row_number over distinct hash60 values) — the hash match is
    // the cross-engine merge-invariance assertion, same contract as
    // q_hll_portable / q_quantile_sketch ----
    "q_kmv_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
        .withColumn("day", to_date(col("ts")))
      val daily = graft.operators.KmvSketch.sketch(ev, Seq("event_type", "day"), "user_id")
      val merged = graft.operators.KmvSketch.rollup(daily, Seq("event_type"))
      graft.operators.KmvSketch.estimate(merged, Seq("event_type"))
        .orderBy(col("event_type"))
    }),
    // ---- KMV pairwise overlap: the thing HLL registers cannot do —
    // intersections. Jaccard / union / intersection estimates for
    // every event-type pair, computed ENTIRELY in sketch space
    // (G²·k rows). Deterministic md5 bottom-k ⇒ the approximate
    // estimates themselves replay exactly in SQL ----
    "q_kmv_jaccard" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val sk = graft.operators.KmvSketch.sketch(ev, Seq("event_type"), "user_id")
      graft.operators.KmvSketch.pairwiseOverlap(sk, "event_type")
        .orderBy(col("g1"), col("g2"))
    }),
    "q_lsh_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.Similarity.lshTopK(emb, emb.where(col("vec_id") < 50), 3, nPlanes = 6)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // ---- IVF ANN (deterministic coarse quantizer → full oracle:
    // DuckDB replicates the same assignment/probe approximation) ----
    "q_ivf_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.Similarity.ivfTopK(emb, emb.where(col("vec_id") < 50), 3,
        nLists = 16, nProbe = 4)
        .select(col("query_id"), col("corpus_id"), col("cosine"), col("rnk").cast("int").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    // ---- trained k-means (exact-integer centroid sums, fixed seed
    // and tie-breaks ⇒ DuckDB unrolls the same two update steps) ----
    "q_kmeans" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.KMeans.assign(emb, graft.operators.KMeans.train(emb, 8, 2))
        .select(col("vec_id"), col("list_id").cast("int").as("list_id"))
        .orderBy(col("vec_id"))
    }),
    // ---- CDC apply: a Debezium-style (op, seq, key, payload) log
    // replayed onto the orders snapshot — latest entry per key wins,
    // D drops the key, I/U upsert. One keyed aggregate + one
    // full-outer join; the oracle replays the same MERGE in SQL ----
    "q_cdc_apply" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val up = o.where(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("U").as("op"), lit(2L).as("seq"),
          (col("o_totalprice") + 1).as("o_totalprice"), col("o_orderstatus"))
      val del = o.where(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit("D").as("op"), lit(3L).as("seq"),
          lit(0.0).as("o_totalprice"), lit("X").as("o_orderstatus"))
      val ins = o.where(col("o_orderkey") % 11 === 0)
        .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
          lit("I").as("op"), lit(1L).as("seq"),
          lit(1.5).as("o_totalprice"), lit("N").as("o_orderstatus"))
      graft.ops.Cdc.applyLog(o, up.unionByName(del).unionByName(ins),
          "o_orderkey", Seq("o_totalprice", "o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),
    // ---- A-ES weighted sampling without replacement: exactly k
    // docs drawn with probability tracking n_chars; the selection
    // key ln(u)/w is deterministic hash arithmetic, so both engines
    // draw the same sample ----
    "q_weighted_sample" -> ((s, dir) => {
      graft.ops.Sampling.weightedSampleK(
          Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", k = 32)
        .orderBy(col("doc_id"))
    }),
    // ---- Jaro-Winkler entity scoring: the skeleton-blocked
    // candidate join of q_fuzzy_match, verified by the native
    // graft_jaro_winkler expression instead of levenshtein — the
    // transposition-tolerant, prefix-boosted scorer name-matching
    // pipelines pair with edit distance. Scores at nano resolution
    // (the q_bm25 precedent: cross-engine ulp-order differences) ----
    "q_jaro_rank" -> ((s, dir) => {
      val parts = Tables.part(s, dir)
      val dirty = parts.where(col("p_partkey") % 11 === 0)
        .select(col("p_partkey").as("dirty_id"),
          regexp_replace(col("p_name"), "e", "").as("dirty_name"))
        .withColumn("__blk", graft.ops.FuzzyJoin.skeletonBlock(col("dirty_name")))
      val cat = parts
        .select(col("p_partkey"), col("p_name"))
        .withColumn("__blk", graft.ops.FuzzyJoin.skeletonBlock(col("p_name")))
      dirty.join(cat, "__blk")
        .select(col("dirty_id"), col("p_partkey"),
          round(graft.plans.JaroWinkler.jaroWinkler(
            col("dirty_name"), col("p_name")) * lit(1.0e9)).cast("long").as("jw_e9"))
        .where(col("jw_e9") >= 900000000L)
        .orderBy(col("dirty_id"), col("p_partkey"))
    }),
    // ---- inverted-index retrieval: positional posting lists once,
    // then AND-search (one filtered aggregate over just the query
    // terms' postings) and exact-phrase search (positional merge) —
    // the keyword-search primitive a contamination probe or corpus
    // query console runs without ever rescanning text ----
    "q_search_and" -> ((s, dir) => {
      val post = graft.ops.InvertedIndex.postings(Tables.documents(s, dir), "doc_id", "text")
      graft.ops.InvertedIndex.conjunctive(post, Seq("batch", "scan", "merge"))
        .orderBy(col("doc_id"))
    }),
    "q_search_phrase" -> ((s, dir) => {
      val post = graft.ops.InvertedIndex.postings(Tables.documents(s, dir), "doc_id", "text")
      graft.ops.InvertedIndex.phrase(post, Seq("hash", "join"))
        .orderBy(col("doc_id"))
    }),
    // BM25 exposes the score in integer nano-units: ln() differs by
    // one ulp between the JVM and libm on some inputs (measured —
    // the TfIdf scaladoc's warning in the flesh), so the raw double
    // cannot hash-match; at 1e-9 resolution a 2e-16 ulp sits nine
    // orders below the rounding boundary and both engines agree.
    "q_bm25" -> ((s, dir) => {
      val post = graft.ops.InvertedIndex.postings(Tables.documents(s, dir), "doc_id", "text")
      graft.ops.InvertedIndex.bm25(post, Seq("hash", "join", "data"), k = 20)
        .select(col("doc_id"),
          round(col("score") * lit(1.0e9)).cast("long").as("score_e9"))
    }),
    // ---- PageRank over the part<->supplier bipartite graph
    // (node id = 2*partkey for parts, 2*suppkey+1 for suppliers;
    // symmetric edges). Exact fixed-point arithmetic — floor-divided
    // contributions and integer damping — makes 5 iterations
    // bit-reproducible, so the oracle is a 5x-unrolled SQL replica ----
    "q_pagerank" -> ((s, dir) => {
      val edges = graft.ops.Graphs.bipartiteSym(s, dir)
      graft.operators.PageRank.ranks(edges, iters = 5)
        .orderBy(col("id"))
    }),
    // ---- triangle counting with degree-ordered orientation over
    // the parts-bought-together co-occurrence graph (edge = two
    // parts in the same order). Exact integers end to end; the
    // oracle replicates the identical orientation, so each triangle
    // is counted once at its lowest-(deg,id) corner. Instance
    // sizing: wedge volume (the algorithm's true cost, Σ outdeg²)
    // grows with the SQUARE of co-occurrence density, so the gate
    // instance takes the deterministic quarter of orders — the full
    // graph is the Profile/SCALE_NOTES measurement, not the
    // per-round bench ----
    "q_triangles" -> ((s, dir) => {
      graft.operators.Triangles.perNodeCounts(graft.ops.Graphs.coocQuarter(s, dir))
        .orderBy(col("id"))
    }),
    // ---- local clustering coefficients over the same graph: every
    // node with degree, triangle count, and cc = 2T/(deg·(deg−1))
    // (NULL below degree 2 — undefined, not zero). Exact integers
    // plus one IEEE division ----
    "q_clustering" -> ((s, dir) => {
      graft.operators.Triangles.clusteringCoefficients(graft.ops.Graphs.coocQuarter(s, dir))
        .orderBy(col("id"))
    }),
    // ---- k-core peeling (Seidman 1983) on the same co-occurrence
    // graph: three fixed peel rounds at k=8 — the fixed-round form
    // (engine fixpoint loop spec-gated in KCoreSpec) unrolls into an
    // exact SQL oracle, the PageRank precedent ----
    "q_kcore" -> ((s, dir) => {
      graft.operators.KCore.peelRounds(graft.ops.Graphs.coocQuarter(s, dir), k = 8, rounds = 3)
        .orderBy(col("id"))
    }),
    // ---- multi-source BFS: shortest hop distances from the
    // partkey%101==0 seed parts over the part<->supplier bipartite
    // graph (the q_pagerank instance). Exact small integers, so the
    // 4-round frontier expansion replays verbatim as a bounded
    // recursive CTE ----
    "q_bfs_hops" -> ((s, dir) => {
      val ps = graft.ops.Graphs.bipartite(s, dir)
      val edges = graft.ops.Graphs.symmetrize(ps)
      val sources = ps.select(col("src").as("id")).distinct()
        .where(col("id") % 202 === 0)
      graft.operators.Bfs.hops(edges, sources, rounds = 4).orderBy(col("id"))
    }),
    // ---- personalized PageRank (TrustRank): teleport mass pinned
    // to the suppkey%10==0 "trusted" suppliers (node id ≡ 1 mod 20)
    // over the same bipartite graph. Exact integers → 5x-unrolled
    // SQL replica, the q_pagerank precedent ----
    "q_trustrank" -> ((s, dir) => {
      val ps = graft.ops.Graphs.bipartite(s, dir)
      val edges = graft.ops.Graphs.symmetrize(ps)
      val seeds = ps.select(col("dst").as("id")).distinct()
        .where(col("id") % 20 === 1)
      graft.operators.PageRank.personalizedRanks(edges, seeds, iters = 5)
        .orderBy(col("id"))
    }),
    // ---- HyperBall: per-node 2-hop ball-size estimates (lgK=7)
    // over the bipartite graph. Deterministic integer registers ⇒
    // the APPROXIMATE estimates themselves replay exactly in SQL —
    // the q_hll_portable contract, unrolled two merge rounds. Gate
    // instance on the deterministic quarter of orders (the
    // q_triangles sizing); the full graph at 1×/10× is the Profile
    // hyperball measurement in SCALE_NOTES ----
    "q_hyperball" -> ((s, dir) => {
      val edges = graft.ops.Graphs.bipartiteQuarterSym(s, dir)
      graft.operators.HyperBall.ballSizes(edges, rounds = 2, lgK = 7)
        .orderBy(col("id"))
    }),
    // ---- harmonic centrality from the same machinery: Σ_r
    // shell_r/r over per-round incoming-ball estimates, in exact
    // nano-units (shells are already-rounded longs). Gate instance
    // on the deterministic quarter of orders (the q_kcore sizing —
    // per-round estimates make this ~2× the q_hyperball work) ----
    "q_harmonic" -> ((s, dir) => {
      val edges = graft.ops.Graphs.bipartiteQuarterSym(s, dir)
      graft.operators.HyperBall.harmonicCentrality(edges, rounds = 2, lgK = 7)
        .orderBy(col("id"))
    }),
    // ---- product quantization: 64 floats -> 4 codebook codes
    // (Jégou et al. 2011). Integer-quantized subspace distances make
    // encode (argmin, ties to smallest centroid) and ADC scores
    // exact — both carry full cross-engine oracles ----
    "q_pq_codes" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val mdl = graft.operators.ProductQuantizer.model(emb, m = 4, k = 16)
      graft.operators.ProductQuantizer.encode(emb, mdl)
        .orderBy(col("vec_id"))
    }),
    "q_pq_adc" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val mdl = graft.operators.ProductQuantizer.model(emb, m = 4, k = 16)
      val codes = graft.operators.ProductQuantizer.encode(emb, mdl)
      graft.operators.ProductQuantizer.adcTopK(
          codes, emb.where(col("vec_id") < 50), mdl, k = 3)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // ---- the PRODUCTION codebook path: encode under a 2-iteration
    // exact-integer-Lloyd's trained codebook. Deterministic under any
    // partitioning (integer sums, rounded-integer means, ties to the
    // smallest centroid id), so the whole training loop unrolls into
    // a cross-engine SQL oracle — the q_kmeans precedent ----
    "q_pq_trained" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val mdl = graft.operators.ProductQuantizer.trainedModel(emb, m = 4, k = 16, iters = 2)
      graft.operators.ProductQuantizer.encode(emb, mdl)
        .orderBy(col("vec_id"))
    }),
    // ---- IVF-PQ (IVFADC, Jégou et al. 2011): coarse lists route
    // the query to nProbe/nLists of the corpus, global PQ codes
    // shrink each scanned row to m bytes-ish, ADC ranks — the
    // billion-scale ANN layout as one composition of the two
    // oracle-gated parts. Integer ADC + deterministic tie-breaks ⇒
    // DuckDB replicates the exact same approximation ----
    "q_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val mdl = graft.operators.ProductQuantizer.model(emb, m = 4, k = 16)
      graft.operators.Similarity.ivfPqTopK(emb, emb.where(col("vec_id") < 50), 3,
          nLists = 8, nProbe = 2, mdl)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // ---- the PERSISTED-index IVF-PQ probe (r12 verdict item #5):
    // q_ivfpq_topk above FUSES the linear index build with the probe
    // (its two-decade exponent was 1.00 because the build dominates —
    // it stays registered as the build-cost receipt). This instance
    // builds the list_id-partitioned index ONCE per (session, sfDir)
    // — bench pays it in warmup_detail.ivfpq — and measures the
    // probe: a directory-pruned scan of nProbe/nLists of the 8-byte
    // code rows. Same models, same params ⇒ same answer, and the
    // oracle replays the identical approximation ----
    "q_ivfpq_indexed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val mdl = graft.operators.ProductQuantizer.model(emb, m = 4, k = 16)
      val path = graft.operators.Similarity.ivfPqIndexFor(s, dir, emb, nLists = 8, mdl)
      graft.operators.Similarity.ivfPqTopKIndexed(s, path,
          emb.where(col("vec_id") < 50), 3, nProbe = 2)
        .orderBy(col("query_id"), col("rnk"))
    }),
    // ---- the index LAYOUT certificate (r13 verdict item #5): one
    // row per coarse centroid in the PERSISTED index's sidecar, with
    // the row count of its list_id partition directory — read from
    // the index bytes q_ivfpq_indexed probes, not recomputed. The
    // oracle recomputes the coarse assignment from the raw embeddings
    // and counts per list, so a stale, truncated, or mis-partitioned
    // index mismatches HERE even at SFs where the full top-k replay
    // is DuckDB-infeasible; q_ivfpq_indexed's staged invariant
    // reconciles against this dump (r_q_ivfpq_layout) for the same
    // reason ----
    "q_ivfpq_layout" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val mdl = graft.operators.ProductQuantizer.model(emb, m = 4, k = 16)
      val path = graft.operators.Similarity.ivfPqIndexFor(s, dir, emb, nLists = 8, mdl)
      val counts = s.read.parquet(path)
        .groupBy(col("list_id").cast("long").as("list_id"))
        .agg(count(lit(1)).as("n_rows"))
      s.read.parquet(path + ".centroids")
        .select(col("cid").cast("long").as("list_id"))
        .join(counts, Seq("list_id"), "full_outer")
        .select(col("list_id"), coalesce(col("n_rows"), lit(0L)).as("n_rows"))
        .orderBy(col("list_id"))
    }),
    // ---- cross-corpus SEMANTIC contamination: eval rows (natural
    // tail + planted copies of train rows) banded against the train
    // side — the paraphrase-leak check n-gram contamination can't
    // make; at 0.95 only the planted copies match. Same plane
    // family as q_embed_neardup, replicated exactly in SQL ----
    "q_semantic_contam" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val train = emb.where(col("vec_id") < 1500)
      // planted leaks carry NEGATIVE ids: natural ids can never
      // collide with them at ANY SF. The old +10000 offset collided
      // with GenScale's copy stride at sf1, where the oracle's
      // per-vid grouped projection silently summed the two colliding
      // vectors' signatures and lost 2 of the 100 planted pairs —
      // the sf1 gate's one real catch
      val evalSet = emb.where(col("vec_id") >= 1500)
        .unionByName(emb.where(col("vec_id") < 100)
          .withColumn("vec_id", -col("vec_id") - 1L))
      graft.operators.Similarity.crossCorpusNearDup(train, evalSet, 0.95)
        .orderBy(col("eval_id"), col("train_id"))
    }),
    // ---- SemDeDup: within-cluster near-dup pairs under the trained
    // k-means model (cluster-scoped quadratic search — the published
    // alternative to global LSH bucketing) ----
    "q_semdedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.SemDedup.pairs(emb, 0.4, k = 8, iters = 2)
        .orderBy(col("a_id"), col("b_id"))
    }),
    // ---- multimodal decode-stub features, flattened to scalars (the
    // md5-seeded stub is engine-reproducible, so this gets a full
    // DuckDB oracle; raw array<double> columns would also break the
    // driver's pandas hash compare) ----
    "q_media_features" -> ((s, dir) => {
      val feats = graft.multimodal.Multimodal.decodeFeatures(
        graft.multimodal.Multimodal.balanceBySize(
          graft.multimodal.Multimodal.fromDocuments(Tables.documents(s, dir)), 8))
      feats.select(
        Seq(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("sample_rate")) ++
          (0 until 8).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
        .orderBy(col("media_id"))
    }),
    "q_frame_sample" -> ((s, dir) => {
      graft.multimodal.Multimodal.frameSampleStub(
        graft.multimodal.Multimodal.fromDocuments(Tables.documents(s, dir)), everyK = 4, maxFrames = 8)
        .orderBy(col("media_id"), col("frame_idx"))
    }),
    // ---- REAL image decode, exact-oracled: each doc_id is rendered
    // into a genuine 2x1 uncompressed 24-bpp BMP (header + padded
    // BGR row assembled as hex, pixels a pure function of doc_id),
    // ImageCodec parses the actual bytes back to pixels, and the
    // oracle recomputes the integer-derived features arithmetically
    // — proving the bytes->pixels->features path end to end, not
    // just the stub plumbing ----
    "q_media_decode" -> ((s, dir) => {
      // 54-byte BMP header for w=2, h=1, 24 bpp (row padded to 8):
      // file size 62, pixel offset 54, BITMAPINFOHEADER(40)
      val header = "424d3e000000000000003600000028000000020000000100000001001800" +
        "000000000800000000000000000000000000000000000000"
      def px(mult: Int) = pmod(col("doc_id") * mult, lit(256)).cast("int")
      def hx(c: org.apache.spark.sql.Column) = lpad(lower(hex(c)), 2, "0")
      val payload = unhex(concat(lit(header),
        hx(px(5)), hx(px(3)), hx(px(1)),    // pixel 1, BGR on disk
        hx(px(13)), hx(px(11)), hx(px(7)),  // pixel 2
        lit("0000")))                        // row pad to 8 bytes
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"), lit("image").as("kind"), payload.as("payload"))
      graft.multimodal.Multimodal.decodeFeatures(media)
        .select(
          Seq(col("media_id"), col("n_bytes"), col("width"), col("height")) ++
            (0 until 8).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
        .orderBy(col("media_id"))
    }),
    // ---- perceptual image hashing over REAL decoded pixels: each
    // doc_id becomes a genuine 4×2 bottom-up BMP whose 24 channel
    // values are pure functions of doc_id; the dHash grid sampling
    // and luminance compares are exact integers, so the oracle
    // recomputes the hash arithmetically from the pixel formula ----
    "q_image_dhash" -> ((s, dir) => {
      val header = "424d4e0000000000000036000000" +
        "28000000040000000200000001001800" +
        "00000000180000000000000000000000" +
        "0000000000000000"
      def px(i: Int, off: Int) = pmod(col("doc_id") * (6 * i + off), lit(256)).cast("int")
      def hx(c: org.apache.spark.sql.Column) = lpad(lower(hex(c)), 2, "0")
      def pix(i: Int) = concat(hx(px(i, 7)), hx(px(i, 5)), hx(px(i, 3))) // BGR on disk
      val payload = unhex(concat(lit(header),
        pix(4), pix(5), pix(6), pix(7),   // file row 0 = bottom image row
        pix(0), pix(1), pix(2), pix(3)))  // file row 1 = top image row
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"), lit("image").as("kind"), payload.as("payload"))
      graft.multimodal.Multimodal.imageDHash(media).orderBy(col("media_id"))
    }),
    // ---- image NEAR-dup pairs: base BMPs (channels mod 200) plus
    // brightness-shifted copies (+10, no clipping) of every 5th doc
    // — the copies hash identically (gradients are shift-invariant),
    // band-collide, and verify at Hamming 0; the oracle exploits the
    // provable shift-cancellation to hash once per doc, then
    // replays the same 4-band join and xor-popcount verify ----
    "q_image_neardup" -> ((s, dir) => {
      // 8x4 images (24-byte rows, no padding): 7 informative grid
      // columns x 4 distinct grid rows = 28 effective hash bits, so
      // natural collisions are rare and the pair count stays linear
      // in the planted copies (a 4x2 image has ~6 effective bits
      // and goes quadratic — measured, not guessed)
      val header = "424d9600000000000000360000002800" +
        "0000080000000400000001001800" +
        "00000000600000000000000000000000" +
        "0000000000000000"
      def hx(c: org.apache.spark.sql.Column) = lpad(lower(hex(c)), 2, "0")
      def payloadFor(shift: Int) = {
        // distinct prime moduli per channel keep the pixel function
        // aperiodic over the corpus (lcm(199,211,223) >> doc count)
        def px(i: Int, off: Int, m: Int) =
          (pmod(col("doc_id") * (6 * i + off), lit(m)) + shift).cast("int")
        def pix(i: Int) = concat(hx(px(i, 7, 223)), hx(px(i, 5, 211)), hx(px(i, 3, 199)))
        // bottom-up file rows: imgY 3, 2, 1, 0
        val rows = (3 to 0 by -1).flatMap(imgY => (0 until 8).map(x => pix(imgY * 8 + x)))
        unhex(concat(lit(header) +: rows: _*))
      }
      val docs = Tables.documents(s, dir)
      val base = docs.select(col("doc_id").as("media_id"),
        lit("image").as("kind"), payloadFor(0).as("payload"))
      val shifted = docs.where(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 100000L).as("media_id"),
          lit("image").as("kind"), payloadFor(10).as("payload"))
      graft.multimodal.Multimodal.imageNearDupPairs(base.unionByName(shifted), 3)
        .orderBy(col("a_id"), col("b_id"))
    }),
    // ---- REAL audio decode, exact-oracled (the WAV twin of
    // q_media_decode): each doc_id becomes a genuine 52-byte
    // RIFF/WAVE file — 44-byte canonical PCM header + four 16-bit
    // mono samples at 8 kHz, each sample a pure function of doc_id —
    // AudioCodec parses the actual bytes back to signed samples, and
    // the oracle recomputes the integer-derived features
    // arithmetically ----
    "q_audio_decode" -> ((s, dir) => {
      // RIFF(44) WAVE fmt(16): PCM, mono, 8000 Hz, 16-bit; data(8)
      val header = "52494646" + "2c000000" + "57415645" + "666d7420" +
        "10000000" + "0100" + "0100" + "401f0000" + "803e0000" + "0200" + "1000" +
        "64617461" + "08000000"
      def u(mult: Int) = pmod(col("doc_id") * mult, lit(65536L))
      def hx(c: org.apache.spark.sql.Column) = lpad(lower(hex(c)), 2, "0")
      def le16(c: org.apache.spark.sql.Column) =
        concat(hx(pmod(c, lit(256L))), hx(shiftright(c, 8)))
      val payload = unhex(concat(lit(header),
        le16(u(7)), le16(u(31)), le16(u(131)), le16(u(8191))))
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"), lit("audio").as("kind"), payload.as("payload"))
      graft.multimodal.Multimodal.decodeFeatures(media)
        .select(
          Seq(col("media_id"), col("n_bytes"), col("sample_rate")) ++
            (0 until 8).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
        .orderBy(col("media_id"))
    }),
    // ---- frame-level audio features over the same synthesized WAVs:
    // 4 samples at frameLen=2 -> two complete frames per doc, each
    // carrying exact-integer energy/|s|/peak/trough/crossings — the
    // windowed silence/VAD primitives, oracle-recomputed
    // arithmetically from the sample formula ----
    "q_audio_frames" -> ((s, dir) => {
      val header = "52494646" + "2c000000" + "57415645" + "666d7420" +
        "10000000" + "0100" + "0100" + "401f0000" + "803e0000" + "0200" + "1000" +
        "64617461" + "08000000"
      def u(mult: Int) = pmod(col("doc_id") * mult, lit(65536L))
      def hx(c: org.apache.spark.sql.Column) = lpad(lower(hex(c)), 2, "0")
      def le16(c: org.apache.spark.sql.Column) =
        concat(hx(pmod(c, lit(256L))), hx(shiftright(c, 8)))
      val payload = unhex(concat(lit(header),
        le16(u(7)), le16(u(31)), le16(u(131)), le16(u(8191))))
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"), lit("audio").as("kind"), payload.as("payload"))
      graft.multimodal.Multimodal.audioFrames(media, frameLen = 2)
        .orderBy(col("media_id"), col("frame_idx"))
    }),
    // ---- resize planning over decoded media (audio rows keep null
    // dims/scale; the uniform-scale doubles are exact IEEE divisions) ----
    "q_media_resize" -> ((s, dir) => {
      val feats = graft.multimodal.Multimodal.decodeFeatures(
        graft.multimodal.Multimodal.fromDocuments(Tables.documents(s, dir)))
      graft.multimodal.Multimodal.resizeStub(feats, 224, 224)
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("target_width"), col("target_height"), col("scale"))
        .orderBy(col("media_id"))
    })
  )

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A4/A5/A7 + F9: grouped scalar aggregates (classic shape) ----
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          centSum(col("l_extendedprice")).as("sum_base_price"),
          centAvg(col("l_extendedprice")).as("avg_price"),
          min(col("l_discount")).as("min_disc"),
          max(col("l_discount")).as("max_disc"),
          count(lit(1)).as("n_rows")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- Flagship stage B flattened: hourly recap over 10-min slots ----
    // Composes W1 keep-first (slot dedup), A3 hour bucketing, A4-A7
    // aggregates, A6 deterministic mode.
    "q_recap_hourly" -> ((s, dir) => {
      Recap.hourly(Recap.slotFirst(obs(s, dir)))
        .select(
          col("location_id"), col("obs_date"), col("obs_hour").cast("long").as("obs_hour"),
          col("avg_temp_c"), col("min_temp_c"), col("max_temp_c"),
          col("dominant_condition"), col("total_precip_mm"), col("n_obs")
        )
        .orderBy(col("location_id"), col("obs_date"), col("obs_hour"))
    }),

    // ---- Flagship stage C flattened: daily rollup + completeness flag (A9/A10) ----
    "q_recap_daily" -> ((s, dir) => {
      Recap.daily(Recap.hourly(Recap.slotFirst(obs(s, dir))))
        .select(
          col("location_id"), col("obs_date"),
          col("hours_present"), col("is_full_recap")
        )
        .orderBy(col("location_id"), col("obs_date"))
    }),

    // ---- A1: duplicate-group detection ----
    "q_dup_groups" -> ((s, dir) => {
      Dedup.duplicateGroups(
        obs(s, dir).select(col("obs_id"), col("location_id"), col("obs_date"), col("obs_hour"), col("obs_slot")),
        Seq("location_id", "obs_date", "obs_hour", "obs_slot"), "obs_id"
      )
        .select(col("location_id"), col("obs_date"), col("obs_hour").cast("long").as("obs_hour"),
          col("obs_slot").cast("long").as("obs_slot"), col("dup_count"))
        .orderBy(col("location_id"), col("obs_date"), col("obs_hour"), col("obs_slot"))
    }),

    // ---- J2: semi join ----
    "q_semi_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val highOrders = Tables.orders(s, dir).where(col("o_totalprice") > 400000).select(col("o_orderkey"))
      li.join(highOrders, li("l_orderkey") === highOrders("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- J3: anti join (customers with no high-value orders — the
    // reference's "not yet processed" incremental shape) ----
    "q_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).where(col("o_totalprice") > 300000).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    })
  )

  // ==== batch 2: shaping (explode, envelope, union), joins ====
  private def shapingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S5/O1: scan with pushed filter + projection (Catalyst pushes
    // both into the parquet scan; .explain shows PushedFilters) ----
    "q_scan_pushdown" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") < lit("1997-01-01").cast("timestamp") && col("l_discount") > 0.08)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- S1/S2 end-to-end: the paged REST ingest's in-engine half.
    // Derive the key-ranged paged landing a fetcher would produce
    // (one JSON batch per keyed page request), then scan it back
    // through the DataSource V2 connector — planning-time page
    // pruning against manifest key envelopes, column pruning into
    // the parse loop, row filter re-applied by Spark. The oracle is
    // the same aggregate over the parquet events the pages were
    // derived from, so the whole land → manifest → pruned-scan loop
    // is exact-oracle-gated, not just spec-gated. ----
    "q_rest_pages" -> ((s, dir) => {
      val landing = graft.sources.v2.PagedLanding.ensureLanding(s, dir)
      s.read.format("graft-pages")
        .schema(graft.sources.v2.PagedLanding.pageSchema)
        .option("manifest", landing)
        .option("keyCol", "user_id")
        .load()
        .where(col("user_id").between(3L, 9L)) // key-range page prune at any sf
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("event_id")).as("min_event"),
          max(col("event_id")).as("max_event"))
        .orderBy(col("event_type"))
    }),

    // ---- Z-order layout key: the Morton interleave behind
    // OPTIMIZE ZORDER BY — pure shift/mask column arithmetic, so the
    // physical-layout sort key itself is exact-oracle-checkable (the
    // write path and its measured two-dimensional file pruning live
    // in ops.Layout + LayoutSpec) ----
    "q_zorder" -> ((s, dir) => {
      // keys are pmod-reduced into zKey2's 16-bit domain so the
      // query runs at ANY scale factor (raw partkeys outgrow 65535
      // past sf~0.3 and zKey2 fails loud by design); production
      // range-reduction is Layout.rankBits — modulo keeps the oracle
      // a pure bitwise replica here
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.ops.Layout.zKey2(
            pmod(col("l_partkey"), lit(65536L)),
            pmod(col("l_suppkey"), lit(65536L))).as("zkey"))
        .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
    }),
    // ---- 3-dim z-order (the real OPTIMIZE ZORDER arity): zKeyN's
    // general per-bit interleave, exact against a generate_series
    // bit-sum replica ----
    "q_zorder3" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.ops.Layout.zKeyN(Seq(
            pmod(col("l_partkey"), lit(65536L)),
            pmod(col("l_suppkey"), lit(65536L)),
            pmod(col("l_orderkey"), lit(65536L))), bits = 16).as("zkey"))
        .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
    }),
    // ---- Hilbert-curve layout key (the locality-better sibling of
    // q_zorder, what modern lakehouse clustering uses): the native
    // plans.Hilbert expression's 16-step reflect/rotate walk,
    // hash-matched against a 16-chained-CTE replica of the same
    // recurrence in DuckDB ----
    "q_hilbert" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.plans.Hilbert.hilbertKey2(
            pmod(col("l_partkey"), lit(65536L)),
            pmod(col("l_suppkey"), lit(65536L)), bits = 16).as("hkey"))
        .orderBy(col("hkey"), col("l_orderkey"), col("l_linenumber"))
    }),
    // ---- small-file compaction planning (lakehouse OPTIMIZE's
    // metadata half): documents stand in for a file listing
    // (partition = source, size = n_chars) — the plan is one window
    // expression over the listing, exact-integer deterministic ----
    "q_compaction_plan" -> ((s, dir) => {
      val files = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), col("n_chars"))
      graft.ops.Compaction.plan(files, Seq("source"), "doc_id", "n_chars", 500L)
        .orderBy(col("doc_id"))
    }),
    // ---- URL normalization + per-domain curation stats (the
    // crawl-pipeline shape): messy URL spellings are synthesized
    // from doc fields — mixed case, www., default ports, trailing
    // dots, fragments — pushed through the full ops.Urls regexp
    // chain, and the oracle checks the result against ground-truth
    // hosts built arithmetically from the same fields ----
    "q_domain_stats" -> ((s, dir) => {
      val tld = when(col("doc_id") % 2 === 0, lit("com")).otherwise(lit("org"))
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("HTTPS://WWW."), upper(col("source")), lit(".Example."), tld,
            lit(":443/docs/"), col("doc_id"), lit("?utm=x#frag")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("http://"), col("source"), lit(".example."), tld,
            lit(":80/d/"), col("doc_id")))
        .otherwise(
          concat(lit("https://cdn."), col("source"), lit(".example."), tld,
            lit("./media/"), col("doc_id"), lit("#x")))
      val host = graft.ops.Urls.host(url)
      Tables.documents(s, dir)
        .select(host.as("host"),
          graft.ops.Urls.registrableDomain(host).as("domain"),
          col("n_chars"), col("lang"))
        .groupBy(col("host"), col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("host"))
    }),
    // ---- domain-level leakage-safe split (the crawl practice:
    // train/valid/test boundaries at the HOST, not the document —
    // two pages of one site must never straddle a split). Pure
    // composition: Urls.host -> Sampling.assignSplit on the host
    // string, so split membership is a deterministic function of
    // the normalized host ----
    "q_domain_split" -> ((s, dir) => {
      val tld = when(col("doc_id") % 2 === 0, lit("com")).otherwise(lit("org"))
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("HTTPS://WWW."), upper(col("source")), lit(".Example."), tld,
            lit(":443/docs/"), col("doc_id"), lit("?utm=x#frag")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("http://"), col("source"), lit(".example."), tld,
            lit(":80/d/"), col("doc_id"))).otherwise(
          concat(lit("https://cdn."), col("source"), lit(".example."), tld,
            lit("./media/"), col("doc_id"), lit("#x")))
      val withHost = Tables.documents(s, dir)
        .select(col("doc_id"), graft.ops.Urls.host(url).as("host"))
      graft.ops.Sampling.assignSplit(withHost, "host", 80, 10)
        .groupBy(col("split"), col("host"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("host"))
    }),
    // ---- versioned-snapshot table read (sources.Snapshots): the
    // corpus lands over a real 4-version history — two appends, a
    // bad overwrite, a rollback — and the query reads HEAD through
    // the manifest protocol; the oracle is the same aggregate over
    // the raw corpus, proving the commit/rollback/read path loses
    // and invents nothing ----
    "q_snapshot_read" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureDemoTable(s, dir)
      graft.sources.Snapshots.read(s, t)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    }),
    // ---- zone-map pruned snapshot read: the demo table commits
    // carry doc_id envelopes, readPruned skips provably-disjoint
    // files, and the oracle is the plain filtered aggregate — the
    // pruning path must lose nothing (file-count reduction itself is
    // measured in SnapshotsSpec; here the GATE is result equality) ----
    "q_snapshot_prune" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureDemoTable(s, dir)
      graft.sources.Snapshots.readPruned(s, t, "doc_id", 100L, 260L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("source"))
    }),
    // ---- URL-key exact dedup (the most common exact-dup source in
    // crawl data: spelling variants of one URL). Pairs of doc_ids
    // get the SAME page in different spellings — scheme, case, www,
    // default port, fragment — and canonicalKey must collapse each
    // pair to its min-doc_id survivor. The oracle constructs the
    // ground-truth key arithmetically, verifying the whole
    // host+path normalization chain, not replicating it ----
    "q_url_dedup" -> ((s, dir) => {
      val page = floor(col("doc_id") / 2) // two spellings per page
      val site = concat(lit("site"), pmod(page, lit(10)))
      val tld = when(page % 2 === 0, lit("com")).otherwise(lit("org"))
      val url = when(col("doc_id") % 2 === 0,
          concat(lit("HTTP://WWW."), upper(site), lit(".Example."), tld,
            lit("/p/"), page, lit("?v=1#top")))
        .otherwise(
          concat(lit("https://"), site, lit(".example."), tld,
            lit(":443/p/"), page, lit("?v=1")))
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"), graft.ops.Urls.canonicalKey(url).as("url_key"))
      keyed.groupBy(col("url_key"))
        .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n_variants"))
        .orderBy(col("url_key"))
    }),
    // ---- OPTIMIZE ZORDER BY executed against a snapshot table:
    // scattered corpus rewritten clustered on (doc_id, n_chars) with
    // zone maps, then a range read on the SECOND dimension through
    // the pruned path — the oracle is the plain filtered aggregate
    // (pruning measured in SnapshotsSpec; the gate is equality) ----
    "q_optimize_zorder" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureScatteredDocsTable(s, dir)
      graft.sources.Snapshots.optimizeZOrder(s, t, Seq("doc_id", "n_chars"), nFiles = 8)
      graft.sources.Snapshots.readPruned(s, t, "n_chars", 200L, 400L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).cast("long").as("sum_doc"))
        .orderBy(col("lang"))
    }),
    // ---- conjunctive box read over the z-ordered layout — the
    // query shape z-order exists for: every dimension's envelope
    // prunes independently; the oracle is the plain AND filter ----
    "q_zorder_box" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureScatteredDocsTable(s, dir)
      graft.sources.Snapshots.optimizeZOrder(s, t, Seq("doc_id", "n_chars"), nFiles = 8)
      graft.sources.Snapshots.readPrunedBox(s, t,
          Seq(("doc_id", 100L, 400L), ("n_chars", 200L, 400L)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).cast("long").as("sum_doc"))
        .orderBy(col("lang"))
    }),
    // ---- incremental materialized-view maintenance: a per-lang
    // aggregate view bootstrapped from the first append, then
    // REFRESHED from only the second append's files (delta fold +
    // copy-on-write merge) — the oracle is the full aggregate over
    // the whole corpus, proving delta maintenance loses nothing ----
    "q_mv_refresh" -> ((s, dir) => {
      val base = graft.sources.Snapshots.ensureEvenDocsTable(s, dir)
      val view = java.nio.file.Files.createTempDirectory("graft-mv")
        .resolve("view").toString
      val docs = Tables.documents(s, dir)
      graft.sources.MaterializedView.fullRefresh(s, base, view, "lang", Seq("n_chars"))
      graft.sources.Snapshots.commit(docs.where("doc_id % 2 = 1"), base)
      graft.sources.MaterializedView.refresh(s, base, view, "lang", Seq("n_chars"))
      graft.sources.Snapshots.read(s, view).orderBy(col("lang"))
    }),
    // ---- Bloom-pruned snapshot point lookup: per-file source
    // blooms in the manifest skip definitely-absent files (the
    // string-equality complement of the integral zone maps); the
    // oracle is the plain filtered aggregate — skipping must lose
    // nothing (file-count reduction measured in SnapshotsSpec) ----
    "q_snapshot_bloom" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureBloomTable(s, dir)
      graft.sources.Snapshots.readPrunedEq(s, t, "source", "src7")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("lang"))
    }),
    // ---- copy-on-write DELETE on a snapshot table: remove one
    // lang/id-residue slice through the manifest protocol (only
    // files containing matches rewrite; the rest carry by
    // reference), then read HEAD — the oracle is the NOT-filtered
    // aggregate over the raw corpus, proving the rewrite dropped
    // exactly the TRUE rows and invented nothing ----
    "q_delete_where" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureDemoTable(s, dir)
      graft.sources.Snapshots.deleteWhere(s, t,
        col("lang") === "en" && pmod(col("doc_id"), lit(7)) === 3)
      graft.sources.Snapshots.read(s, t)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("lang"))
    }),
    // ---- explicit lossy retype as a COW rewrite (the last
    // evolution verb — r10 verdict item #5's gate instance):
    // doc_id bigint -> int rewrites the whole table under the
    // round-trip guard, and the PROOF the retype really applied is
    // the follow-up append with int-typed keys — the additive type
    // gate would reject it against the old bigint schema. The oracle
    // replays corpus ∪ appended slice relationally ----
    "q_retype_rewrite" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureDemoTable(s, dir)
      graft.sources.Snapshots.retypeRewrite(s, t, "doc_id",
        org.apache.spark.sql.types.IntegerType)
      val docs = Tables.documents(s, dir)
      val extra = docs.where(pmod(col("doc_id"), lit(10)) === 4)
        .withColumn("doc_id", (col("doc_id") + 10000000L).cast("int"))
        .withColumn("source", lit("post-retype"))
      graft.sources.Snapshots.commit(extra, t)
      graft.sources.Snapshots.read(s, t)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("source"))
    }),
    // ---- replaceWhere (partition-reload verb): one commit swaps
    // the 100-299 slice for its recomputed form — out-of-scope
    // inserts raise; the oracle replays the swap relationally ----
    "q_replace_where" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureDemoTable(s, dir)
      val docs = Tables.documents(s, dir)
      val repl = docs.where(col("doc_id").between(100, 299))
        .withColumn("n_chars", col("n_chars") * 2)
        .withColumn("source", lit("reloaded"))
      graft.sources.Snapshots.replaceWhere(s, t, col("doc_id").between(100, 299), repl)
      graft.sources.Snapshots.read(s, t)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("source"))
    }),
    // ---- copy-on-write MERGE (keyed upsert) on a snapshot table:
    // one commit applies updates (doc_id%10=0, payload bumped,
    // source re-tagged) and inserts (shifted new keys) — WHEN
    // MATCHED UPDATE / WHEN NOT MATCHED INSERT. The oracle
    // replicates the merge relationally over the raw corpus ----
    "q_merge_cow" -> ((s, dir) => {
      val t = graft.sources.Snapshots.ensureDemoTable(s, dir)
      val docs = Tables.documents(s, dir)
      val updates = docs.where(pmod(col("doc_id"), lit(10)) === 0)
        // cast back to the column's own type: + 100000L would promote
        // an int-typed n_chars to long and trip the COW type gate
        .withColumn("n_chars",
          (col("n_chars") + 100000L).cast(docs.schema("n_chars").dataType))
        .withColumn("source", lit("merged"))
      val inserts = docs.where(pmod(col("doc_id"), lit(10)) === 1)
        .withColumn("doc_id", col("doc_id") + 10000000L)
        .withColumn("source", lit("inserted"))
      graft.sources.Snapshots.mergeInto(s, t, updates.unionByName(inserts), "doc_id")
      graft.sources.Snapshots.read(s, t)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("source"))
    }),
    // ---- BPE ENCODE under a trained merge table (the native
    // plans.BpeEncode expression — the real greedy merge chain, not
    // a regex approximation). The oracle uses a merge table whose
    // greedy application has a closed form — ("t","h") single-char
    // non-overlapping, ("e","</w>") terminal, alphabets disjoint so
    // the merges can't interact — making the general engine path
    // checkable arithmetically (the q_media_decode pattern) ----
    "q_bpe_encode" -> ((s, dir) => {
      val merges = Seq(("t", "h"), ("e", graft.ops.Bpe.EndOfWord))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.ops.Bpe.bpeTokenCount(col("text"), merges).as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ---- O2/O3/O4/O6/O7: the predicate kit on one frame ----
    "q_filter_kit" -> ((s, dir) => {
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      Tables.events(s, dir)
        .where(col("user_id").isNotNull)                       // O6 null guard
        .where(col("event_type").isin("click", "view"))        // O4 in-list
        .where(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").startsWith("2024-01-1")) // O3 prefix
        .where(col("ts") <= cutoff)                            // O7 cutoff
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // ---- O5: nested-array explode with position ----
    "q_explode_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .where(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // ---- O10/F12/F13: envelope struct assembly + JSON serialize ----
    "q_envelope_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("event_id") < 500)
        .select(
          col("event_id"),
          to_json(struct(
            col("event_id"), col("event_type"),
            struct(col("user_id")).as("who")
          )).as("envelope")
        )
        .orderBy(col("event_id"))
    }),

    // ---- §2.7: discriminated union of two source paths ----
    "q_union_disc" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val cur = ev.where(col("event_type") === "click").select(col("event_id"), col("user_id"))
      val hist = ev.where(col("event_type") === "view").select(col("event_id"), col("user_id"))
      graft.ops.Shaping.discriminatedUnion(cur, "current", hist, "history")
        .groupBy(col("fetch_method"), col("user_id"))
        .agg(count(lit(1)).as("n_rows"), min(col("event_id")).as("first_id"))
        .orderBy(col("fetch_method"), col("user_id"))
    }),

    // ---- J1 chained: star-schema broadcast joins (dim⋈dim⋈fact) ----
    "q_star_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = broadcast(Tables.nation(s, dir))
      val r = broadcast(Tables.region(s, dir))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), centSum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ---- J4: composite-key late-data dedup (anti join) ----
    "q_late_dedup" -> ((s, dir) => {
      val ev = obs(s, dir)
      val incoming = ev.where(col("condition") === "error")
        .select(col("obs_id"), col("location_id"), col("obs_date"), col("obs_hour"))
      val existing = ev.where(col("condition") === "click")
        .select(col("location_id"), col("obs_date"), col("obs_hour"))
      Dedup.notYetProcessed(incoming, existing, Seq("location_id", "obs_date", "obs_hour"))
        .select(col("obs_id"), col("location_id"), col("obs_date"),
          col("obs_hour").cast("long").as("obs_hour"))
        .orderBy(col("obs_id"))
    }),

    // ---- salted skew join: correctness ≡ plain equi-join (which is
    // exactly what the oracle states); the salt spreads hot fact keys
    // over 8 sub-partitions ----
    "q_skew_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.ops.Skew.saltedEquiJoin(ev, dim, "user_id", "event_id", 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- gap-based sessionization (classic event analytics: lag +
    // running sum of session starts; 30-min inactivity gap) ----
    "q_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sess_no", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
        .orderBy(col("user_id"), col("sess_no"))
    }),

    // ---- RANGE window frame: per-user trailing-1-hour sum (range
    // frames over event time, distinct from the ROWS frames elsewhere;
    // integer micros ordering + integer cents values keep it exact) ----
    "q_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("ts_us"),
          round(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      ev.withColumn("trailing_1h", (sum(col("cents")).over(w) / 100.0))
        .select(col("event_id"), col("user_id"), col("ts"), col("trailing_1h"))
        .orderBy(col("event_id"))
    }),

    // ---- histogram with exact integer-cents bucketing (floor of a
    // double division is misround-safe at cent magnitudes) ----
    "q_histogram" -> ((s, dir) => {
      Tables.events(s, dir).where(col("value").isNotNull)
        .withColumn("bucket",
          floor(round(col("value") * 100).cast("long") / lit(500.0)).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          (min(round(col("value") * 100).cast("long")) / 100.0).as("lo"),
          (max(round(col("value") * 100).cast("long")) / 100.0).as("hi"))
        .orderBy(col("bucket"))
    }),

    // ---- near-dup clusters: pair graph → connected components →
    // canonical representative (the dedup pipeline's final step;
    // components run in representative space — one node per distinct
    // shingle set — and members inherit their rep's label) ----
    // the clustering itself is memoized (NearDup.documentClusters,
    // the labelsBipartite pattern): five queries consume it, the
    // loop cost lands once in Bench's warmup_detail.neardup
    "q_dup_components" -> ((s, dir) =>
      graft.operators.NearDup.documentClusters(s, dir).orderBy(col("doc_id"))),

    // ---- the COMPLETE dedup pipeline as one query: near-dup
    // clusters (subsumes exact dups at jaccard 1) → drop every
    // non-canonical member → surviving-corpus stats per lang ----
    "q_dedup_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val losers = graft.operators.NearDup.documentClusters(s, dir)
        .where(!col("is_canonical")).select(col("doc_id"))
      docs.join(losers, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // ---- pivot (explicit value list → deterministic columns) ----
    "q_pivot" -> ((s, dir) => {
      Tables.events(s, dir).where(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    })
  )

  // ==== batch 2: windows / ranking / tumbling ====
  private def windowQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- W3/ST4: tumbling 10-minute event-time windows ----
    "q_tumbling_10min" -> ((s, dir) => {
      graft.ops.Windows.tumbling(
        Tables.events(s, dir).where(col("user_id").isNotNull && col("user_id") < 20),
        "ts", "10 minutes", Seq("user_id"),
        Seq(count(lit(1)).as("n_rows"), centSum(col("value")).as("sum_value"))
      )
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("user_id"), col("n_rows"), col("sum_value"))
        .orderBy(col("w_start"), col("user_id"))
    }),

    // ---- hopping 30-min windows every 10 min: each event lands in
    // exactly 3 overlapping windows (the expand happens before the
    // single aggregation shuffle — no self-union of shifted copies);
    // the oracle replays the 3-offset fan-out explicitly ----
    "q_hopping_30x10" -> ((s, dir) => {
      graft.ops.Windows.hopping(
        Tables.events(s, dir).where(col("user_id").isNotNull && col("user_id") < 20),
        "ts", "30 minutes", "10 minutes", Seq("user_id"),
        Seq(count(lit(1)).as("n_rows"), centSum(col("value")).as("sum_value"))
      )
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("user_id"), col("n_rows"), col("sum_value"))
        .orderBy(col("w_start"), col("user_id"))
    }),

    // ---- W1 + top-k: rank per key, keep top 3 ----
    "q_rank_topk" -> ((s, dir) => {
      graft.ops.Windows.topKPerKey(
        Tables.events(s, dir).where(col("user_id").isNotNull && col("user_id") < 50)
          .select(col("event_id"), col("user_id"), col("value")),
        Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 3
      )
        .select(col("user_id"), col("rnk"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("rnk"))
    }),

    // ---- lag/lead: delta vs previous observation per key ----
    "q_lag_delta" -> ((s, dir) => {
      graft.ops.Windows.lagDelta(
        Tables.events(s, dir).where(col("user_id").isNotNull && col("user_id") < 20)
          .select(col("event_id"), col("user_id"), col("ts"), col("value")),
        Seq("user_id"), Seq(col("ts").asc, col("event_id").asc), "value"
      )
        .select(col("user_id"), col("event_id"), col("value"), col("prev_value"), col("delta"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- A8: ordered collect serialized to a string (oracle-stable
    // form of sort_array(collect_list)) ----
    "q_collect_sorted" -> ((s, dir) => {
      obs(s, dir)
        .where(col("location_id") < 30)
        .groupBy(col("location_id"), col("obs_date"))
        .agg(
          array_join(
            transform(
              sort_array(collect_list(struct(col("obs_id"), col("temp_c").cast("string").as("v")))),
              x => x.getField("v")
            ), ","
          ).as("temps_csv"),
          count(lit(1)).as("n_rows")
        )
        .orderBy(col("location_id"), col("obs_date"))
    })
  )

  // ==== batch 2: scalar function kit ====
  private def scalarQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- F7/F8: unit conversion + heat index (pure column arithmetic,
    // mirrored op-for-op in the oracle so IEEE results are identical) ----
    "q_heat_index" -> ((s, dir) => {
      import graft.functions.{WeatherFunctions => WF}
      Tables.events(s, dir)
        .where(col("user_id").isNotNull)
        .select(
          col("event_id"),
          (col("value") / 10.0).as("temp_c"),
          (col("event_id") % 101).cast("double").as("humidity")
        )
        .withColumn("temp_f", WF.cToF(col("temp_c")))
        .withColumn("heat_index_c", WF.heatIndexC(col("temp_c"), col("humidity")))
        .orderBy(col("event_id"))
    }),

    // ---- F1-F6/F11: the timestamp kit ----
    "q_time_kit" -> ((s, dir) => {
      import graft.functions.{WeatherFunctions => WF}
      Tables.events(s, dir)
        .where(col("user_id").isNotNull && col("event_id") < 2000)
        .select(
          col("event_id"),
          WF.formatTs(col("ts")).as("ts_str"),                       // F2
          date_format(col("ts"), "yyyy-MM-dd HH").as("ts_hour_str"), // F2 (hour prefix)
          unix_timestamp(col("ts")).as("epoch_s"),                   // F3
          WF.formatTs(WF.toZone(col("ts"), "Asia/Jakarta")).as("jakarta_str"), // F4
          date_add(to_date(col("ts")), 1).as("next_day"),            // F5
          WF.zeroPad2(hour(col("ts"))).as("hh")                      // F6
        )
        .orderBy(col("event_id"))
    })
  )

  // ==== batch 3: training-data pipeline operators (dedup, similarity,
  // text analysis) — first-class for the 100 TB corpus use case ====
  private def trainingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup by content hash (double-ingest simulation —
    // the distributed form of the reference's at-least-once dedup ST7) ----
    "q_dedup_exact" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"), col("lang"))
      val reingested = d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))
      graft.operators.ExactDedup.keepCanonical(reingested, "text", "doc_id")
        .select(col("content_hash"), col("dup_count"), col("doc_id"), col("lang"))
        .orderBy(col("content_hash"))
    }),

    // ---- exact n-gram Jaccard near-dup pairs (inverted index) ----
    "q_ngram_jaccard" -> ((s, dir) => {
      graft.operators.NearDup.jaccardPairs(Tables.documents(s, dir), "text", 3, 0.8)
        .orderBy(col("d1"), col("d2"))
    }),

    // ---- MinHash + LSH banding, exact-verified (the 100 TB path;
    // recall at j>=0.8 is 1-2e-8 so the exact-Jaccard oracle holds) ----
    "q_minhash_lsh" -> ((s, dir) => {
      graft.operators.NearDup.minhashNearDupPairs(Tables.documents(s, dir), "text", 3, 0.8)
        .orderBy(col("d1"), col("d2"))
    }),

    // ---- SimHash fingerprints (md5-derived 60-bit, engine-reproducible) ----
    "q_simhash" -> ((s, dir) => {
      graft.operators.SimHash.fingerprints(Tables.documents(s, dir), "text")
        .orderBy(col("doc_id"))
    }),

    // ---- brute-force cosine top-k over embeddings (quantized-exact) ----
    "q_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 100), 3)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // ---- text statistics (token counts, punctuation, quality score) ----
    "q_text_stats" -> ((s, dir) => {
      import graft.functions.{TextFunctions => TF}
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(TF.tokens(col("text"))).as("n_tokens"),
          length(col("text")).as("n_chars_actual"),
          TF.bpeishTokenCount(col("text")).as("bpeish_tokens"),
          TF.punctCount(col("text")).as("n_punct"),
          TF.qualityScore(col("text")).as("quality")
        )
        .orderBy(col("doc_id"))
    }),

    // ---- token-budget chunking: model-window pieces with overlap
    // (chunk i covers tokens [i·24, i·24+32); final short chunk kept) ----
    "q_chunk_tokens" -> ((s, dir) => {
      graft.ops.Chunking.chunkByTokens(Tables.documents(s, dir), "text", "doc_id",
          maxTokens = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // ---- PII redaction + audit counts. The PII is constructed
    // deterministically from table columns (the corpus itself is
    // synthetic and PII-free), so both engines rewrite identical
    // inputs; counts are taken on the pre-redaction text ----
    "q_redact" -> ((s, dir) => {
      import graft.functions.Redact
      val pii = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com ip 10.0."),
        pmod(col("doc_id"), lit(256L)).cast("string"), lit(".7 tel +62 812-3456-789"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Redact.redact(pii).as("redacted"),
          Redact.emailCount(pii).as("n_emails"),
          Redact.ipv4Count(pii).as("n_ips"),
          Redact.phoneCount(pii).as("n_phones"))
        .orderBy(col("doc_id"))
    }),

    // ---- incremental near-dup: a new batch (doc_id ≡ 0 mod 20)
    // probed against the rest of the corpus through the band-table /
    // shingle-store index shape (persistence itself is spec'd in
    // IncrementalSpec; the query runs the same frames in-memory) ----
    "q_incr_neardup" -> ((s, dir) => {
      import graft.operators.{Incremental, NearDup}
      val docs = Tables.documents(s, dir)
      val newSh = NearDup.shingled(docs.where(pmod(col("doc_id"), lit(20L)) === 0), "text", 3)
      val oldSh = NearDup.shingled(docs.where(pmod(col("doc_id"), lit(20L)) =!= 0), "text", 3)
      Incremental.nearDupsAgainstFrom(newSh, Incremental.bandTable(oldSh), oldSh, 0.8)
        .orderBy(col("new_id"), col("old_id"))
    }),

    // ---- train/eval contamination: n-gram containment of a held-out
    // split (doc_id ≡ 0 mod 50) against the rest of the corpus ----
    "q_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Contamination.evalContamination(
          docs.where(pmod(col("doc_id"), lit(50L)) =!= 0),
          docs.where(pmod(col("doc_id"), lit(50L)) === 0),
          "text", 3, 0.8)
        .orderBy(col("doc_id"))
    }),

    // ---- contamination ATTRIBUTION: top-3 training sources per
    // eval doc with >= 3 shared shingles (the decontamination list) ----
    "q_contam_sources" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Contamination.contaminationSources(
          docs.where(pmod(col("doc_id"), lit(50L)) =!= 0),
          docs.where(pmod(col("doc_id"), lit(50L)) === 0),
          "text", 3, minCommon = 3L, k = 3)
        .orderBy(col("eval_id"), col("rnk"))
    }),

    // ---- intra-document n-gram repetition ratio (boilerplate signal) ----
    "q_repetition" -> ((s, dir) => {
      import graft.functions.{TextFunctions => TF}
      Tables.documents(s, dir)
        .select(col("doc_id"),
          greatest(size(TF.tokens(col("text"))) - 2, lit(0)).as("n_ngrams"),
          size(TF.wordShingles(col("text"), 3)).as("n_distinct"),
          TF.repetitionRatio(col("text"), 3).as("rep_ratio"))
        .orderBy(col("doc_id"))
    }),

    // ---- per-document top terms by TF-IDF (rational idf — see
    // TfIdf Scaladoc for why not ln) ----
    "q_tfidf_terms" -> ((s, dir) => {
      graft.operators.TfIdf.topTerms(Tables.documents(s, dir), "text", 5)
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // ---- per-column data-quality profile (pruned single-column scans) ----
    "q_profile" -> ((s, dir) => {
      graft.ops.DataProfile.profileNumeric(Tables.events(s, dir),
          Seq("event_id", "user_id", "value"))
        .orderBy(col("col_name"))
    }),

    // ---- language-ID heuristic (marker words, deterministic argmax) ----
    "q_langid" -> ((s, dir) => {
      import graft.functions.{TextFunctions => TF}
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), TF.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // ---- corpus-wide top-k bigrams (doc frequency; deterministic
    // (count desc, ngram asc) tie-break makes the LIMIT cut exact).
    // Bigrams come from codegen'd posexplode + lead rather than the
    // wordShingles HOF composition (interpreted; measured 6.5 s vs
    // <1 s for this query at sf0.1) — same pairs, same set semantics ----
    "q_top_ngrams" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " +")).as(Seq("pos", "tok")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      toks.withColumn("nxt", lead(col("tok"), 1).over(w))
        .where(col("nxt").isNotNull)
        .select(col("doc_id"), concat_ws("_", col("tok"), col("nxt")).as("ngram"))
        .distinct() // per-doc set semantics (matches wordShingles)
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(desc("n_docs"), col("ngram"))
        .limit(20)
    }),

    // ---- rolling-hash document fingerprint (order-sensitive) ----
    "q_fingerprint" -> ((s, dir) => {
      import graft.functions.{TextFunctions => TF}
      Tables.documents(s, dir)
        .select(col("doc_id"), TF.rollingFingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // ---- leakage-safe split: near-dup clusters are split ATOMS —
    // hash cut-points applied to the cluster label, not the doc ----
    "q_leak_split" -> ((s, dir) => {
      graft.operators.Splits.leakageSafeSplitFrom(
          graft.operators.NearDup.documentClusters(s, dir),
          Tables.documents(s, dir), 80, 10)
        .orderBy(col("doc_id"))
    }),

    // ---- deterministic per-group quota cap (corpus balancing):
    // at most 25 docs per lang, selected in md5-hash order ----
    "q_group_cap" -> ((s, dir) => {
      graft.ops.Sampling.capPerGroup(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          "doc_id", "lang", 25)
        .orderBy(col("lang"), col("sel_rank"))
    }),

    // ---- vocabulary coverage curve: top-k tokens with cumulative
    // share of total token mass ----
    "q_vocab_coverage" -> ((s, dir) => {
      graft.ops.Vocab.coverage(Tables.documents(s, dir), "text", 50)
        .orderBy(col("rank"))
    }),

    // ---- weighted corpus mixture: 50/25/25 over three sources,
    // sized by the binding source, md5-threshold membership ----
    "q_mix" -> ((s, dir) => {
      graft.ops.Mixture.byWeights(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id", "source",
          Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))
        .orderBy(col("doc_id"))
    }),

    // ---- reproducible global shuffle: the first 100 docs of epoch-7
    // training order (TakeOrderedAndProject — no total sort) ----
    "q_shuffle_order" -> ((s, dir) => {
      graft.ops.Shuffle.withOrder(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id", seed = 7L)
        .orderBy(col("shuffle_key"), col("doc_id"))
        .limit(100)
    }),

    // ---- per-doc OOV rate vs the corpus' own top-20 vocabulary ----
    "q_oov_rate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = graft.ops.Vocab.coverage(docs, "text", 20).select(col("token"))
      graft.ops.Vocab.oovRate(docs, "text", vocab)
        .orderBy(col("doc_id"))
    }),

    // ---- unigram surprisal: corpus-frequency quality signal in
    // exact floor-log2 bits (no IEEE log ⇒ full oracle) ----
    "q_surprisal" -> ((s, dir) => {
      graft.ops.Vocab.surprisal(Tables.documents(s, dir), "text")
        .orderBy(col("doc_id"))
    }),

    // ---- bigram perplexity, stupid backoff α=1/2 (CCNet-style
    // perplexity filter): model trained on the even-doc_id half,
    // every document scored; exact integer bits ⇒ full oracle ----
    "q_bigram_ppl" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      graft.ops.Vocab.bigramPerplexity(docs, docs.where(col("doc_id") % 2 === 0), "text")
        .orderBy(col("doc_id"))
    }),

    // ---- hashing-trick linear classifier inference (fasttext-style
    // quality scoring as a row-local map): fixed-point integer
    // weights in the task binary, score exact in both engines ----
    "q_hashed_score" -> ((s, dir) => {
      graft.ops.HashedFeatures.linearScore(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "text", hashedWeights, bias = 3L)
        .withColumn("kept", col("score") > 0)
        .select(col("doc_id"), col("score"), col("kept"))
        .orderBy(col("doc_id"))
    }),

    // ---- exact repeated-substring removal (Lee et al. 2021): every
    // duplicated 3-gram keeps its first occurrence, all other
    // occurrences' tokens are masked out ----
    "q_substring_dedup" -> ((s, dir) => {
      graft.operators.SubstringDedup.removeRepeatedNgrams(
          Tables.documents(s, dir).select(col("doc_id"), col("text")), "text", 3)
        .orderBy(col("doc_id"))
    }),

    // ---- boilerplate removal: drop tokens present in >40% of all
    // docs (df-based chrome stripping), reassemble in order ----
    "q_boilerplate" -> ((s, dir) => {
      graft.ops.Boilerplate.removeFrequentUnits(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "text", " ", maxDfPermille = 400)
        .orderBy(col("doc_id"))
    }),

    // ---- curation funnel: per-lang survivor counts through four
    // cumulative filter stages, ONE scan (conditional aggregation) ----
    "q_curation_funnel" -> ((s, dir) => {
      import graft.functions.{TextFunctions => TF}
      graft.ops.Funnel.counts(
          Tables.documents(s, dir),
          Seq(
            "nonempty" -> (col("text").isNotNull && length(col("text")) > 0),
            "token_min" -> (size(TF.tokens(col("text"))) >= 30),
            "quality" -> (TF.qualityScore(col("text")) >= 0.7),
            "sampled" -> (graft.ops.Sampling.hashBucket(col("doc_id")) < 50)),
          groupCols = Seq("lang"))
        .orderBy(col("lang"))
    }),

    // ---- score-proportional sampling: survival probability equals
    // the doc's quality score, membership deterministic by key ----
    "q_score_sample" -> ((s, dir) => {
      import graft.functions.{TextFunctions => TF}
      graft.ops.Sampling.sampleByScore(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("lang"), col("text"),
              TF.qualityScore(col("text")).as("q")),
          "doc_id", "q")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // ---- weight-proportional repetition: quality-weighted
    // upsampling (each doc appears ~2·quality times per epoch) ----
    "q_repeat_weight" -> ((s, dir) => {
      import graft.functions.{TextFunctions => TF}
      graft.ops.Sampling.repeatByWeight(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("text"),
              (TF.qualityScore(col("text")) * 2.0).as("w")),
          "doc_id", "w")
        .select(col("doc_id"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // ---- Gopher repetition signals (Rae et al. 2021 A1): duplicate
    // line/paragraph fractions, row-local. The synthetic corpus is
    // single-line, so line structure is DERIVED deterministically
    // (a break every 2 tokens, a paragraph break every 4 lines) by a
    // regex both engines apply identically ----
    "q_gopher_repetition" -> ((s, dir) => {
      val lined = Tables.documents(s, dir).select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), "(\\S+ \\S+) ", "$1\n"),
          "(([^\n]*\n){3}[^\n]*)\n", "$1\n\n").as("text2"))
      graft.ops.Gopher.repetitionSignals(lined, "text2").orderBy(col("doc_id"))
    }),
    // ---- most frequent word bigram's share of token characters ----
    "q_gopher_topgram" -> ((s, dir) => {
      graft.ops.Gopher.topNgramCharFrac(Tables.documents(s, dir), "text", 2)
        .orderBy(col("doc_id"))
    }),
    // ---- token chars covered by any duplicated trigram (position-
    // unioned, the overlap-safe form) ----
    "q_gopher_dupgram" -> ((s, dir) => {
      graft.ops.Gopher.dupNgramCharFrac(Tables.documents(s, dir), "text", 3)
        .orderBy(col("doc_id"))
    }),
    // ---- the Gopher rule battery; thresholds and stop words tuned
    // to the short-doc synthetic corpus so both outcomes occur ----
    "q_gopher_rules" -> ((s, dir) => {
      graft.ops.Gopher.qualityRules(Tables.documents(s, dir), "text",
          minWords = 20, stops = Seq("the", "a", "data", "value", "table"))
        .orderBy(col("doc_id"))
    }),

    // ---- data-quality expectations: a named check battery in ONE
    // conditional-aggregation scan + per-keyset uniqueness; the
    // type_known check deliberately excludes 'signup' so the report
    // carries real violation counts ----
    "q_expectations" -> ((s, dir) => {
      graft.ops.Expectations.report(Tables.events(s, dir),
          Seq(
            "event_id_nonnull" -> col("event_id").isNotNull,
            "type_known" -> col("event_type").isin("click", "view", "purchase", "error"),
            "value_in_range" -> (col("value") >= 0.0 && col("value") < 50.0)),
          Seq("event_id_unique" -> Seq("event_id"),
            "user_type_unique" -> Seq("user_id", "event_type")))
        .orderBy(col("check"))
    }),

    // ---- SCD Type-2 dimension maintenance: snapshot of each user's
    // state before the cutoff becomes the dim; the latest post-cutoff
    // event is the update batch — changed keys close + reopen, new
    // keys insert, unchanged keys are no-ops ----
    "q_scd2" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      val snap = ev.where(col("ts") < cut)
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("ts"), col("event_id"), col("event_type")),
          struct(col("ts"), col("event_id"))).as("u"))
        .select(col("user_id"), col("u.event_type").as("tier"), col("u.ts").as("since"))
      val upd = ev.where(col("ts") >= cut)
        .select(col("user_id"), col("event_type").as("tier"), col("ts"), col("event_id"))
      graft.ops.Scd2.apply(
          graft.ops.Scd2.init(snap, "user_id", Seq("tier"), "since"),
          upd, "user_id", Seq("tier"), "ts", "event_id")
        .orderBy(col("user_id"), col("valid_from"))
    }),

    // ---- point-in-time join against the SCD2 dimension: every
    // event gets the tier valid AT its timestamp — one as-of join
    // (single key shuffle, linear), not the BETWEEN theta-join
    // Spark would plan as a nested-loop. Pre-first-version and
    // unknown-key facts surface as NULL, never a stale version ----
    "q_scd2_pit" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val cut = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      val snap = ev.where(col("ts") < cut)
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("ts"), col("event_id"), col("event_type")),
          struct(col("ts"), col("event_id"))).as("u"))
        .select(col("user_id"), col("u.event_type").as("tier"), col("u.ts").as("since"))
      val upd = ev.where(col("ts") >= cut)
        .select(col("user_id"), col("event_type").as("tier"), col("ts"), col("event_id"))
      val dim = graft.ops.Scd2.apply(
        graft.ops.Scd2.init(snap, "user_id", Seq("tier"), "since"),
        upd, "user_id", Seq("tier"), "ts", "event_id")
      graft.ops.Scd2.pointInTime(
          ev.select(col("event_id"), col("user_id"), col("ts")), dim, "user_id", "ts",
          Seq("tier"))
        .select(col("event_id"), col("user_id"), col("ts"), col("tier"))
        .orderBy(col("event_id"))
    }),

    // ---- BPE training statistics: frequency-weighted adjacent
    // symbol-pair counts over the corpus word dictionary (the
    // distributed half of tokenizer training; the merge loop is
    // driver-side over the vocab-sized dict — ops.Bpe.train) ----
    "q_bpe_pairs" -> ((s, dir) => {
      graft.ops.Bpe.pairCounts(graft.ops.Bpe.wordFreqs(Tables.documents(s, dir), "text"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(100)
    }),

    // ---- bloom-pre-filtered anti join: lineitems of orders that are
    // NOT finalized — the bloom prunes the big side before the
    // shuffle, the exact anti join settles false positives, so the
    // oracle is the plain NOT EXISTS ----
    "q_bloom_anti" -> ((s, dir) => {
      graft.ops.BloomJoin.antiJoin(
          Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir).where(col("o_orderstatus") === "F"), "o_orderkey",
          expectedItems = 100000)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val base = coreOracles ++ batch2Oracles ++ trainingOracles ++ extraOracles ++ temporalOracles ++ gopherOracles ++ journeyOracles ++ roundEightOracles ++ roundNineOracles ++ roundTwelveOracles ++ roundFourteenOracles
    // the persisted-index probe returns the SAME approximation as the
    // fused q_ivfpq_topk (same coarse lists, same global PQ codes,
    // same nProbe) — its oracle is that replica verbatim; what
    // differs is WHERE the engine reads (the list_id-pruned directory
    // layout vs an in-memory rebuild), which SQL cannot and need not
    // see
    base + ("q_ivfpq_indexed" -> base("q_ivfpq_topk"))
  }

  private def roundFourteenOracles: Map[String, String] = Map(
    // the persisted-index layout certificate: per-coarse-centroid row
    // counts, recomputed INDEPENDENTLY from the raw embeddings (the
    // same coarse-assignment CTEs as q_ivfpq_topk's replay, stopped
    // at corpus_assign — linear, no pair joins, feasible at every SF
    // where the top-k replay OOMs). The engine side read the counts
    // from the persisted list_id directories + the centroid sidecar,
    // so truncation/staleness/mis-partitioning mismatches here.
    "q_ivfpq_layout" ->
      """WITH qz AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, v,
        |    sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
        |  FROM qz
        |), coarse AS (
        |  SELECT vec_id AS cid, v AS cv, nv AS cn FROM nrm WHERE vec_id < 8
        |), cscore AS (
        |  SELECT n.vec_id, c.cid,
        |    row_number() OVER (PARTITION BY n.vec_id
        |                       ORDER BY CAST(CAST(list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i]*c.cv[i])) AS BIGINT) AS DOUBLE)/(n.nv*c.cn) DESC, c.cid ASC) AS rn
        |  FROM nrm n, coarse c
        |), corpus_assign AS (
        |  SELECT vec_id AS corpus_id, cid AS list_id FROM cscore WHERE rn = 1
        |)
        |SELECT CAST(c.cid AS BIGINT) AS list_id, CAST(COALESCE(g.n, 0) AS BIGINT) AS n_rows
        |FROM (SELECT vec_id AS cid FROM embeddings WHERE vec_id < 8) c
        |LEFT JOIN (SELECT list_id, count(*) AS n FROM corpus_assign GROUP BY 1) g ON g.list_id = c.cid
        |ORDER BY list_id""".stripMargin
  )

  private def roundTwelveOracles: Map[String, String] = Map(
    // merge-on-read DELETE ×2: reading HEAD through the deletion
    // vectors must equal the doubly-NOT-filtered corpus
    "q_delete_dv" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |WHERE NOT (lang = 'en' AND doc_id % 5 = 2)
        |  AND NOT (doc_id % 11 = 7)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // BLB: subset membership by hash60 mod n < round(n^0.6); weights
    // w = max(0, floor(λ + √λ·z + ½)) with λ = n/m_j and z the
    // centered sum of 12 hash60 uniforms over 2^60 (exact integer ζ;
    // every FP step after it is one correctly-rounded IEEE op, so
    // weights are bit-identical across engines); replicate mean
    // Σwx/Σw from exact integer sums; per-subset rank-3/98 endpoints
    // nano-rounded then integer-averaged over the 5 subsets
    "q_bootstrap_blb" ->
      """WITH src AS (
        |  SELECT CAST(event_id AS VARCHAR) AS id,
        |    CAST(round(value*100) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL AND event_type = 'click'
        |), t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx FROM src
        |), mt AS (
        |  SELECT GREATEST(CAST(50 AS BIGINT),
        |    CAST(round(power(CAST(n AS DOUBLE), 0.6)) AS BIGINT)) AS m_t FROM t
        |), subs AS (
        |  SELECT j.j, s2.id, s2.x, t.n
        |  FROM src s2, t, mt, (SELECT unnest(range(0, 5)) AS j) j
        |  WHERE CAST(concat('0x', substr(md5(concat('blb', CAST(j.j AS VARCHAR), ':', s2.id)), 1, 15)) AS BIGINT) % t.n < mt.m_t
        |), sizes AS (
        |  SELECT j, CAST(count(*) AS BIGINT) AS mj, CAST(sum(x) AS BIGINT) AS sxj
        |  FROM subs GROUP BY 1
        |), draws AS (
        |  SELECT sb.j, b.b, sb.x, z.mj, sb.n,
        |    CAST(list_sum(list_transform(range(1, 13), tt ->
        |      CAST(concat('0x', substr(md5(concat('blbw', CAST(sb.j AS VARCHAR), ':',
        |        CAST(b.b AS VARCHAR), ':', sb.id, ':', CAST(tt AS VARCHAR))), 1, 15)) AS BIGINT)
        |      - 576460752303423488
        |    )) AS BIGINT) AS zeta
        |  FROM subs sb JOIN sizes z USING (j), (SELECT unnest(range(0, 100)) AS b) b
        |), wts AS (
        |  SELECT j, b, x,
        |    CAST(GREATEST(0.0, floor(
        |      CAST(n AS DOUBLE)/CAST(mj AS DOUBLE)
        |      + sqrt(CAST(n AS DOUBLE)/CAST(mj AS DOUBLE))
        |        * (CAST(zeta AS DOUBLE) / 1152921504606846976.0)
        |      + 0.5)) AS BIGINT) AS w
        |  FROM draws
        |), reps AS (
        |  SELECT j, b,
        |    CAST(CAST(sum(w*x) AS BIGINT) AS DOUBLE)
        |      / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) AS m
        |  FROM wts GROUP BY 1, 2
        |), ranked AS (
        |  SELECT j, b, m, row_number() OVER (PARTITION BY j ORDER BY m, b) AS r FROM reps
        |), cij AS (
        |  SELECT r.j,
        |    CAST(round(1e9 * (min(r.m) - CAST(z.sxj AS DOUBLE)/CAST(z.mj AS DOUBLE))) AS BIGINT) AS lo_nano_j,
        |    CAST(round(1e9 * (max(r.m) - CAST(z.sxj AS DOUBLE)/CAST(z.mj AS DOUBLE))) AS BIGINT) AS hi_nano_j
        |  FROM ranked r JOIN sizes z USING (j)
        |  WHERE r.r = 3 OR r.r = 98 GROUP BY r.j, z.sxj, z.mj
        |)
        |SELECT t.n, CAST(5 AS BIGINT) AS s, CAST(100 AS BIGINT) AS b,
        |  CAST(round(1e9 * CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE)) AS BIGINT) AS mean_nano,
        |  CAST(round(1e9 * CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE)) AS BIGINT)
        |    + CAST(round(CAST(sum(lo_nano_j) AS DOUBLE) / 5.0) AS BIGINT) AS lo_nano,
        |  CAST(round(1e9 * CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE)) AS BIGINT)
        |    + CAST(round(CAST(sum(hi_nano_j) AS DOUBLE) / 5.0) AS BIGINT) AS hi_nano
        |FROM cij, t GROUP BY t.n, t.sx""".stripMargin,

    // typed zone maps: the pruned time-range read must equal the
    // plain filtered aggregate over the raw feed
    "q_prune_time" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin)

  /** Staged invariant oracles for the queries whose full-replay SQL
    * is infeasible for DuckDB at sf0.1+/sf1 (r10 verdict item #1) —
    * see [[InvariantOracles]]. Every key also has a replay oracle in
    * [[oracleSql]]; the replay stays primary at small SFs. */
  def invariantSql: Map[String, Seq[String]] = InvariantOracles.sql

  private def roundNineOracles: Map[String, String] = Map(
    "q_pair_align" ->
      """WITH qz AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), pr AS (
        |  SELECT t.vec_id AS vec_id, t.v AS v, i.v AS w
        |  FROM qz t JOIN qz i ON i.vec_id = t.vec_id + 1
        |  WHERE t.vec_id % 2 = 0
        |), s AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(v)), k -> v[k]*w[k])) AS BIGINT) AS dot,
        |    CAST(list_sum(list_transform(generate_series(1, len(v)), k -> v[k]*v[k])) AS BIGINT) AS nt,
        |    CAST(list_sum(list_transform(generate_series(1, len(w)), k -> w[k]*w[k])) AS BIGINT) AS ni
        |  FROM pr
        |), a AS (
        |  SELECT vec_id,
        |    CAST(round(1e9 * CAST(dot AS DOUBLE) / (sqrt(CAST(nt AS DOUBLE)) * sqrt(CAST(ni AS DOUBLE)))) AS BIGINT) AS align_nano
        |  FROM s WHERE nt > 0 AND ni > 0
        |)
        |SELECT d.source AS source, count(*) AS n_pairs,
        |  CAST(round(CAST(CAST(sum(a.align_nano) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_align_nano,
        |  min(a.align_nano) AS min_align_nano,
        |  max(a.align_nano) AS max_align_nano,
        |  CAST(sum(CASE WHEN a.align_nano < 100000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_misaligned
        |FROM a JOIN documents d ON d.doc_id = a.vec_id
        |GROUP BY d.source""".stripMargin,

    "q_pack_audit" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tok,
        |         CAST(coalesce(sum(n_tok) OVER (
        |           PARTITION BY lang ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
        |  FROM d
        |), bins AS (
        |  SELECT lang, cumb // 2048 AS bin,
        |         CAST(sum(n_tok) AS BIGINT) AS fill,
        |         count(*) AS n_docs
        |  FROM c GROUP BY 1, 2
        |)
        |SELECT lang, count(*) AS n_bins,
        |  CAST(sum(fill) AS BIGINT) AS sum_tok,
        |  max(fill) AS max_fill, min(fill) AS min_fill,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(round(1e9 * CAST(CAST(sum(fill) AS BIGINT) AS DOUBLE) /
        |       CAST(count(*) * 2048 AS DOUBLE)) AS BIGINT) AS util_nano
        |FROM bins GROUP BY 1""".stripMargin,

    "q_knn_noise" ->
      """WITH qz AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), s AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i]*c.v[i])) AS BIGINT) AS dot,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i]*q.v[i])) AS BIGINT) AS nq,
        |    CAST(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i]*c.v[i])) AS BIGINT) AS nc
        |  FROM qz q, qz c
        |  WHERE q.vec_id < 200 AND c.vec_id <> q.vec_id
        |), top AS (
        |  SELECT query_id, corpus_id, rnk FROM (
        |    SELECT query_id, corpus_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY
        |        CAST(dot AS DOUBLE)/(sqrt(CAST(nq AS DOUBLE))*sqrt(CAST(nc AS DOUBLE))) DESC,
        |        corpus_id ASC) AS rnk
        |    FROM s)
        |  WHERE rnk <= 5
        |), votes AS (
        |  SELECT t.query_id, e.label, CAST(count(*) AS BIGINT) AS votes,
        |    min(t.rnk) AS best_rnk
        |  FROM top t JOIN embeddings e ON e.vec_id = t.corpus_id
        |  GROUP BY 1, 2
        |), pred AS (
        |  SELECT query_id AS vec_id, label AS pred_label
        |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |          ORDER BY votes DESC, best_rnk ASC, label ASC) AS r FROM votes)
        |  WHERE r = 1
        |)
        |SELECT CAST(e.label AS BIGINT) AS true_label,
        |  count(*) AS n_checked,
        |  CAST(sum(CASE WHEN CAST(p.pred_label AS BIGINT) <> CAST(e.label AS BIGINT)
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST(round(1e9 * CAST(CAST(sum(CASE WHEN CAST(p.pred_label AS BIGINT) <> CAST(e.label AS BIGINT)
        |                THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS flag_rate_nano
        |FROM pred p JOIN embeddings e USING (vec_id)
        |GROUP BY 1""".stripMargin
  )

  private def roundEightOracles: Map[String, String] = Map(
    // the n²-scaled mean-clearing identity: all moments exact BIGINTs
    // (guarded against overflow on the Spark side), ONE double
    // division per lag; the rn+lag self-join replays the explode/join
    "q_acf" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) // 100 AS x
        |  FROM events WHERE value IS NOT NULL AND event_type = 'click'
        |  GROUP BY 1
        |), s AS (
        |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn, x FROM daily
        |), t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS S,
        |         CAST(sum(x*x) AS BIGINT) AS Q FROM s
        |), per AS (
        |  SELECT CAST(tl.rn - h.rn AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(h.x * tl.x) AS BIGINT) AS C,
        |    CAST(sum(h.x) AS BIGINT) AS Sh, CAST(sum(tl.x) AS BIGINT) AS St
        |  FROM s h JOIN s tl ON tl.rn - h.rn BETWEEN 1 AND 10
        |  GROUP BY 1
        |)
        |SELECT p.lag, p.n_pairs,
        |  CAST(round(1e9 *
        |    CAST(t.n*t.n*p.C - t.n*t.S*(p.Sh+p.St) + (t.n - p.lag)*t.S*t.S AS DOUBLE)
        |    / CAST(t.n*(t.n*t.Q - t.S*t.S) AS DOUBLE)) AS BIGINT) AS acf_nano
        |FROM per p, t ORDER BY p.lag""".stripMargin,

    // identical histogram + smoothing to q_psi_bins; p and q are the
    // same two divisions, then one mirrored 0.5e9·(p·ln(2p/(p+q)) +
    // q·ln(2q/(p+q))) tree per bucket
    "q_js_drift" ->
      """WITH av AS (
        |  SELECT CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |), bv AS (
        |  SELECT CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-15 00:00:00'
        |), h AS (
        |  SELECT CAST(floor(v / 500) AS BIGINT) AS bucket,
        |         CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b
        |  FROM (SELECT v, 1 AS na, 0 AS nb FROM av
        |        UNION ALL SELECT v, 0, 1 FROM bv)
        |  GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb,
        |         CAST(count(*) AS BIGINT) AS nbk
        |  FROM h
        |), pq AS (
        |  SELECT h.bucket, h.n_a, h.n_b,
        |    CAST(h.n_a + 1 AS DOUBLE) / CAST(t.ta + t.nbk AS DOUBLE) AS p,
        |    CAST(h.n_b + 1 AS DOUBLE) / CAST(t.tb + t.nbk AS DOUBLE) AS q
        |  FROM h, t
        |)
        |SELECT bucket, n_a, n_b,
        |  CAST(round(0.5e9 * (p * ln(2.0*p/(p+q)) + q * ln(2.0*q/(p+q)))) AS BIGINT) AS jsd_e9
        |FROM pq ORDER BY bucket""".stripMargin,

    // exact class counting; NULL quasi-identifiers group as values
    "q_kanon" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS class_size,
        |  CAST(count(DISTINCT c_acctbal) AS BIGINT) AS distinct_sensitive,
        |  count(*) >= 10 AS k_ok
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same '_'-joined distinct trigram convention as the dedup
    // oracles; first-introducer = min doc_id per gram
    "q_gram_novelty" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
        |    i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])) AS shingles
        |  FROM tok
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) AS g FROM sh
        |), fs AS (
        |  SELECT g, min(doc_id) AS first_id FROM ex GROUP BY 1
        |), per AS (
        |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN f.first_id = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |  FROM ex e JOIN fs f USING (g) GROUP BY 1
        |)
        |SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams,
        |  coalesce(p.n_new, 0) AS n_new,
        |  CASE WHEN coalesce(p.n_grams, 0) = 0 THEN NULL
        |    ELSE CAST(round(1e9 * CAST(p.n_new AS DOUBLE) / CAST(p.n_grams AS DOUBLE)) AS BIGINT)
        |  END AS novelty_nano
        |FROM documents d LEFT JOIN per p USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // the q_freq_pairs front half; N = all quarter-instance baskets
    // (pre-prune), both rule directions
    "q_assoc_rules" ->
      """WITH f AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        |  WHERE l_orderkey % 4 = 0
        |), freq AS (
        |  SELECT i FROM f GROUP BY i HAVING count(*) >= 2
        |), pf AS (
        |  SELECT f.b, f.i FROM f JOIN freq USING (i)
        |), cnt AS (
        |  SELECT i, CAST(count(*) AS BIGINT) AS c FROM pf GROUP BY i
        |), nb AS (
        |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS N FROM lineitem
        |  WHERE l_orderkey % 4 = 0 AND l_orderkey IS NOT NULL
        |), pairs AS (
        |  SELECT a.i AS item_a, b2.i AS item_b, CAST(count(*) AS BIGINT) AS support
        |  FROM pf a JOIN pf b2 ON a.b = b2.b AND a.i < b2.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), directed AS (
        |  SELECT item_a AS antecedent, item_b AS consequent, support FROM pairs
        |  UNION ALL SELECT item_b, item_a, support FROM pairs
        |)
        |SELECT d.antecedent, d.consequent, d.support,
        |  CAST(round(1e9 * CAST(d.support AS DOUBLE) / CAST(ca.c AS DOUBLE)) AS BIGINT) AS conf_nano,
        |  CAST(round(1e9 * CAST(d.support * nb.N AS DOUBLE)
        |    / CAST(ca.c * cb.c AS DOUBLE)) AS BIGINT) AS lift_nano
        |FROM directed d
        |JOIN cnt ca ON ca.i = d.antecedent
        |JOIN cnt cb ON cb.i = d.consequent, nb
        |ORDER BY 1, 2""".stripMargin,

    // median = order-statistic selection (odd: middle; even: mean of
    // the two middles); ties in double space are interchangeable for
    // value selection, so the rank tiebreak never changes the answer
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS t,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) // 100 AS x
        |  FROM events WHERE value IS NOT NULL AND event_type = 'click'
        |  GROUP BY 1
        |), slopes AS (
        |  SELECT CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON b.t > a.t
        |), rs AS (
        |  SELECT slope, row_number() OVER (ORDER BY slope) AS r, count(*) OVER () AS np
        |  FROM slopes
        |), med AS (
        |  SELECT CAST(max(np) AS BIGINT) AS n_pairs, sum(slope) / count(*) AS slope
        |  FROM rs WHERE r = (np + 1) // 2 OR r = np // 2 + 1
        |), resid AS (
        |  SELECT CAST(d.x AS DOUBLE) - m.slope * CAST(d.t AS DOUBLE) AS resid,
        |    m.slope, m.n_pairs
        |  FROM daily d, med m
        |), rr AS (
        |  SELECT resid, slope, n_pairs, row_number() OVER (ORDER BY resid) AS r,
        |    count(*) OVER () AS nn
        |  FROM resid
        |)
        |SELECT CAST(max(nn) AS BIGINT) AS n_points, CAST(max(n_pairs) AS BIGINT) AS n_pairs,
        |  CAST(round(max(slope) * 1e9) AS BIGINT) AS slope_nano,
        |  CAST(round(sum(resid) / count(*) * 1e9) AS BIGINT) AS intercept_nano
        |FROM rr WHERE r = (nn + 1) // 2 OR r = nn // 2 + 1""".stripMargin,

    // the md5-driven design matrix: draw slot (b, rn) selects row
    // 1 + hash60(b":"rn) % n — identical in both engines; interval
    // endpoints are rank 5 / 196 selections over the 200 means
    "q_bootstrap_ci" ->
      """WITH s AS (
        |  SELECT row_number() OVER (ORDER BY event_id) AS rn,
        |    CAST(round(value*100) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL AND event_type = 'click'
        |), t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx FROM s
        |), slots AS (
        |  SELECT b.b, 1 + CAST(concat('0x', substr(md5(concat(CAST(b.b AS VARCHAR), ':',
        |    CAST(s.rn AS VARCHAR))), 1, 15)) AS BIGINT) % t.n AS sel
        |  FROM s, t, (SELECT unnest(range(0, 200)) AS b) b
        |), means AS (
        |  SELECT sl.b, CAST(CAST(sum(s2.x) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS m
        |  FROM slots sl JOIN s s2 ON s2.rn = sl.sel GROUP BY 1
        |), ranked AS (
        |  SELECT m, row_number() OVER (ORDER BY m, b) AS r FROM means
        |), ci AS (
        |  SELECT min(m) AS lo, max(m) AS hi FROM ranked WHERE r = 5 OR r = 196
        |)
        |SELECT t.n, CAST(200 AS BIGINT) AS b,
        |  CAST(round(1e9 * CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE)) AS BIGINT) AS mean_nano,
        |  CAST(round(1e9 * ci.lo) AS BIGINT) AS lo_nano,
        |  CAST(round(1e9 * ci.hi) AS BIGINT) AS hi_nano
        |FROM ci, t""".stripMargin,

    // integer power iteration on the n²-scaled scatter matrix: M and
    // every iterate rescale by truncating division (DuckDB // and
    // Java / both truncate toward zero — measured), fixed all-ones
    // start, 3 unrolled rounds
    "q_pca_power" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
        |dims AS (SELECT unnest(range(1, 65)) AS i),
        |cells AS (
        |  SELECT d1.i, d2.i AS j, CAST(sum(q.v[d1.i] * q.v[d2.i]) AS BIGINT) AS g
        |  FROM q, dims d1, dims d2 GROUP BY 1, 2
        |), sv AS (
        |  SELECT d.i, CAST(sum(q.v[d.i]) AS BIGINT) AS s FROM q, dims d GROUP BY 1
        |), m0 AS (
        |  SELECT c.i, c.j, n.n * c.g - si.s * sj.s AS m
        |  FROM cells c JOIN sv si ON si.i = c.i JOIN sv sj ON sj.i = c.j, n
        |), dm AS (
        |  SELECT greatest(CAST(1 AS BIGINT), max(abs(m)) // 1073741824) AS d FROM m0
        |), m AS (
        |  SELECT i, j, m0.m // dm.d AS m FROM m0, dm
        |), w0 AS (SELECT i AS j, CAST(1 AS BIGINT) AS w FROM dims),
        |u1 AS (SELECT m.i AS j, CAST(sum(m.m * w0.w) AS BIGINT) AS u FROM m JOIN w0 USING (j) GROUP BY 1),
        |e1 AS (SELECT greatest(CAST(1 AS BIGINT), max(abs(u)) // 1048576) AS d FROM u1),
        |w1 AS (SELECT j, u // d AS w FROM u1, e1),
        |u2 AS (SELECT m.i AS j, CAST(sum(m.m * w1.w) AS BIGINT) AS u FROM m JOIN w1 USING (j) GROUP BY 1),
        |e2 AS (SELECT greatest(CAST(1 AS BIGINT), max(abs(u)) // 1048576) AS d FROM u2),
        |w2 AS (SELECT j, u // d AS w FROM u2, e2),
        |u3 AS (SELECT m.i AS j, CAST(sum(m.m * w2.w) AS BIGINT) AS u FROM m JOIN w2 USING (j) GROUP BY 1),
        |e3 AS (SELECT greatest(CAST(1 AS BIGINT), max(abs(u)) // 1048576) AS d FROM u3),
        |w3 AS (SELECT j, u // d AS w FROM u3, e3)
        |SELECT CAST(j AS BIGINT) AS dim, w FROM w3 ORDER BY dim""".stripMargin,

    // the q_auc score formula; (score DESC, vec_id) ranks, exact
    // integer decile counts, one mirrored lift tree per bin
    "q_lift_curve" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v,
        |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        |  FROM embeddings
        |), plane AS (
        |  SELECT list_transform(range(0, 64), i ->
        |    CASE WHEN CAST(concat('0x', substr(md5(concat('0', ':', CAST(i AS VARCHAR))), 1, 15)) AS BIGINT) % 2 = 1
        |      THEN 1 ELSE -1 END) AS s
        |), scored AS (
        |  SELECT vec_id, y,
        |    CAST(list_sum(list_transform(range(1, len(q.v) + 1),
        |      ix -> q.v[ix] * plane.s[ix])) AS BIGINT) AS score
        |  FROM q, plane
        |), r AS (
        |  SELECT y, row_number() OVER (ORDER BY score DESC, vec_id) AS rk FROM scored
        |), t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos FROM r
        |), b AS (
        |  SELECT ((rk - 1) * 10) // t.n AS bin, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM r, t GROUP BY 1
        |), c AS (
        |  SELECT bin, n_rows, n_pos,
        |    CAST(sum(n_rows) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rows,
        |    CAST(sum(n_pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
        |  FROM b
        |)
        |SELECT CAST(bin AS BIGINT) AS bin, n_rows, n_pos, cum_pos,
        |  CASE WHEN t.pos = 0 THEN NULL
        |    ELSE CAST(round(1e9 * (CAST(cum_pos AS DOUBLE) / CAST(cum_rows AS DOUBLE))
        |      / (CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE))) AS BIGINT) END AS lift_nano
        |FROM c, t ORDER BY bin""".stripMargin,

    // the q_cosine_topk brute-force replica restricted to the
    // labeled/unlabeled split, then the deterministic majority vote
    "q_knn_label" ->
      """WITH qz AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), s AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i]*c.v[i])) AS BIGINT) AS dot,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i]*q.v[i])) AS BIGINT) AS nq,
        |    CAST(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i]*c.v[i])) AS BIGINT) AS nc
        |  FROM qz q, qz c
        |  WHERE q.vec_id % 4 = 0 AND q.vec_id < 200 AND c.vec_id % 4 <> 0
        |), top AS (
        |  SELECT query_id, corpus_id, rnk FROM (
        |    SELECT query_id, corpus_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY
        |        CAST(dot AS DOUBLE)/(sqrt(CAST(nq AS DOUBLE))*sqrt(CAST(nc AS DOUBLE))) DESC,
        |        corpus_id ASC) AS rnk
        |    FROM s)
        |  WHERE rnk <= 5
        |), votes AS (
        |  SELECT t.query_id, e.label, CAST(count(*) AS BIGINT) AS votes,
        |    min(t.rnk) AS best_rnk
        |  FROM top t JOIN embeddings e ON e.vec_id = t.corpus_id
        |  GROUP BY 1, 2
        |)
        |SELECT query_id AS vec_id, label AS pred_label, votes
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY votes DESC, best_rnk ASC, label ASC) AS r FROM votes)
        |WHERE r = 1 ORDER BY vec_id""".stripMargin,

    // one degree aggregate over the symmetric edge replica
    "q_degree_dist" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
        |), e AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
        |), deg AS (
        |  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
        |), dist AS (
        |  SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1
        |), t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total FROM deg
        |)
        |SELECT deg, n_nodes,
        |  CAST(round(1e9 * CAST(n_nodes AS DOUBLE) / CAST(n_total AS DOUBLE)) AS BIGINT) AS share_nano
        |FROM dist, t ORDER BY deg""".stripMargin,

    // the rankEvalFixture lists; precision divides by k, recall by
    // the full relevant pool (NULL when empty)
    "q_precision_k" ->
      """WITH res AS (
        |  SELECT qid, item, rank FROM (
        |    SELECT CAST(c_nationkey AS BIGINT) AS qid, c_custkey AS item,
        |      CAST(row_number() OVER (PARTITION BY c_nationkey
        |        ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_custkey)
        |        AS BIGINT) AS rank
        |    FROM customer)
        |  WHERE rank <= 10
        |), judged AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS qid, o.o_custkey AS item,
        |    CAST(least(2, count(*) // 4) AS BIGINT) AS rel
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2
        |), hits AS (
        |  SELECT r.qid,
        |    CAST(sum(CASE WHEN coalesce(j.rel, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        |  FROM res r LEFT JOIN judged j ON j.qid = r.qid AND j.item = r.item
        |  GROUP BY 1
        |), pool AS (
        |  SELECT qid, CAST(count(*) AS BIGINT) AS n_rel FROM judged WHERE rel > 0 GROUP BY 1
        |)
        |SELECT h.qid, h.n_hits, CAST(coalesce(p.n_rel, 0) AS BIGINT) AS n_rel,
        |  CAST(round(1e9 * CAST(h.n_hits AS DOUBLE) / 10.0) AS BIGINT) AS p_nano,
        |  CASE WHEN coalesce(p.n_rel, 0) = 0 THEN NULL
        |    ELSE CAST(round(1e9 * CAST(h.n_hits AS DOUBLE) / CAST(p.n_rel AS DOUBLE)) AS BIGINT)
        |  END AS r_nano
        |FROM hits h LEFT JOIN pool p ON p.qid = h.qid
        |ORDER BY h.qid""".stripMargin,

    // the q_calibration fixture; per-row (pct − 100y)² exact, one
    // division by n·10⁴
    "q_brier" ->
      """WITH d AS (
        |  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS p,
        |    CASE WHEN length(text) > 500 THEN 1 ELSE 0 END AS y
        |  FROM documents
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum((p - 100*y) * (p - 100*y)) AS BIGINT) AS sum_sq_err,
        |  CAST(round(1e9 * CAST(sum((p - 100*y) * (p - 100*y)) AS DOUBLE)
        |    / CAST(count(*) * 10000 AS DOUBLE)) AS BIGINT) AS brier_nano
        |FROM d""".stripMargin,

    // rides the q_labelprop unroll, then per-community cut/volume
    // sums and the mirrored φ division
    "q_conductance" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
        |), e AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
        |), l0 AS (
        |  SELECT DISTINCT src AS id, src AS lab FROM e
        |), v1 AS (
        |  SELECT id, lab, count(*) AS c FROM (
        |    SELECT e.dst AS id, l.lab FROM e JOIN l0 l ON l.id = e.src
        |    UNION ALL SELECT id, lab FROM l0
        |  ) GROUP BY 1, 2
        |), l1 AS (
        |  SELECT id, lab FROM (
        |    SELECT id, lab, row_number() OVER (
        |      PARTITION BY id ORDER BY c DESC, lab) AS rn FROM v1
        |  ) WHERE rn = 1
        |), v2 AS (
        |  SELECT id, lab, count(*) AS c FROM (
        |    SELECT e.dst AS id, l.lab FROM e JOIN l1 l ON l.id = e.src
        |    UNION ALL SELECT id, lab FROM l1
        |  ) GROUP BY 1, 2
        |), l2 AS (
        |  SELECT id, lab FROM (
        |    SELECT id, lab, row_number() OVER (
        |      PARTITION BY id ORDER BY c DESC, lab) AS rn FROM v2
        |  ) WHERE rn = 1
        |), v3 AS (
        |  SELECT id, lab, count(*) AS c FROM (
        |    SELECT e.dst AS id, l.lab FROM e JOIN l2 l ON l.id = e.src
        |    UNION ALL SELECT id, lab FROM l2
        |  ) GROUP BY 1, 2
        |), l3 AS (
        |  SELECT id, lab FROM (
        |    SELECT id, lab, row_number() OVER (
        |      PARTITION BY id ORDER BY c DESC, lab) AS rn FROM v3
        |  ) WHERE rn = 1
        |), parts AS (
        |  SELECT ls.lab AS lab, CAST(count(*) AS BIGINT) AS vol,
        |    CAST(sum(CASE WHEN ls.lab <> ld.lab THEN 1 ELSE 0 END) AS BIGINT) AS cut
        |  FROM e JOIN l3 ls ON ls.id = e.src JOIN l3 ld ON ld.id = e.dst
        |  GROUP BY 1
        |), m2t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m2 FROM e
        |)
        |SELECT CAST(lab AS BIGINT) AS lab, vol, cut,
        |  CASE WHEN least(vol, m2 - vol) = 0 THEN NULL
        |    ELSE CAST(round(1e9 * CAST(cut AS DOUBLE)
        |      / CAST(least(vol, m2 - vol) AS DOUBLE)) AS BIGINT)
        |  END AS phi_nano
        |FROM parts, m2t ORDER BY lab""".stripMargin,

    // the q_bpe_encode closed-form token count, rolled up per lang
    "q_fertility" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split_regex(text, ' +')) AS word FROM documents
        |), t AS (
        |  SELECT doc_id,
        |    CAST(len(word) + 1
        |      - (len(word) - len(replace(word, 'th', ''))) // 2
        |      - CASE WHEN word LIKE '%e' THEN 1 ELSE 0 END AS BIGINT) AS n
        |  FROM w WHERE len(word) > 0
        |), per AS (
        |  SELECT d.doc_id, d.lang, CAST(COALESCE(sum(t.n), 0) AS BIGINT) AS n_tokens,
        |    CAST(count(t.n) AS BIGINT) AS n_words
        |  FROM documents d LEFT JOIN t ON t.doc_id = d.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_words) AS BIGINT) AS total_words,
        |  CASE WHEN sum(n_words) = 0 THEN NULL
        |    ELSE CAST(round(1e9 * CAST(sum(n_tokens) AS DOUBLE)
        |      / CAST(sum(n_words) AS DOUBLE)) AS BIGINT) END AS fertility_nano
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    // the q_audio_frames sample formula over 16 samples; voiced
    // islands via the lag/running-sum rank arithmetic
    "q_vad" ->
      """WITH sv AS (
        |  SELECT d.doc_id, m.k,
        |    CASE WHEN ((d.doc_id * m.p) % 65536) < 32768
        |         THEN ((d.doc_id * m.p) % 65536)
        |         ELSE ((d.doc_id * m.p) % 65536) - 65536 END AS s
        |  FROM documents d,
        |    (VALUES (0,7),(1,31),(2,131),(3,8191),(4,3),(5,5),(6,11),(7,13),
        |            (8,17),(9,19),(10,23),(11,29),(12,37),(13,41),(14,43),(15,47)) m(k, p)
        |), fr AS (
        |  SELECT doc_id, k // 2 AS frame_idx, CAST(SUM(s * s) AS BIGINT) AS energy
        |  FROM sv GROUP BY 1, 2
        |), voiced AS (
        |  SELECT doc_id, frame_idx, energy,
        |    CASE WHEN lag(frame_idx) OVER (PARTITION BY doc_id ORDER BY frame_idx) IS NULL
        |           OR frame_idx - lag(frame_idx) OVER (PARTITION BY doc_id ORDER BY frame_idx) > 1
        |         THEN 1 ELSE 0 END AS nw
        |  FROM fr WHERE energy >= 500000000
        |), segs AS (
        |  SELECT doc_id, frame_idx, energy,
        |    CAST(SUM(nw) OVER (PARTITION BY doc_id ORDER BY frame_idx
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
        |  FROM voiced
        |)
        |SELECT doc_id AS media_id, seg,
        |  CAST(min(frame_idx) AS INT) AS start_frame,
        |  CAST(max(frame_idx) AS INT) AS end_frame,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(energy) AS BIGINT) AS sum_energy
        |FROM segs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the ANOVA identity on exact integer moments, per-group terms
    // nano-rounded BEFORE the cross-group sum (order-free longs)
    "q_seasonality" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) // 100 AS x
        |  FROM events WHERE value IS NOT NULL AND event_type = 'click'
        |  GROUP BY 1
        |), obs AS (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01', day) AS BIGINT) % 7 AS g, x
        |  FROM daily
        |), pg AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS ng, CAST(sum(x) AS BIGINT) AS sg,
        |    CAST(sum(x*x) AS BIGINT) AS qg
        |  FROM obs GROUP BY 1
        |), gg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS BIGINT) AS s, CAST(sum(qg) AS BIGINT) AS q,
        |    CAST(sum(CAST(round(1e6 * CAST(ng*qg - sg*sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE)) AS BIGINT)) AS BIGINT) AS ssw_micro
        |  FROM pg
        |), t AS (
        |  SELECT n, k,
        |    CAST(round(1e6 * CAST(n*q - s*s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS sst_micro,
        |    ssw_micro
        |  FROM gg
        |)
        |SELECT n, k, sst_micro, ssw_micro, sst_micro - ssw_micro AS ssb_micro,
        |  CASE WHEN k < 2 OR sst_micro = 0 THEN NULL
        |    ELSE CAST(round(1e9 * CAST(sst_micro - ssw_micro AS DOUBLE)
        |      / CAST(sst_micro AS DOUBLE)) AS BIGINT) END AS eta2_nano,
        |  CASE WHEN k < 2 OR n <= k OR ssw_micro = 0 THEN NULL
        |    ELSE CAST(round(1e9 * (CAST(sst_micro - ssw_micro AS DOUBLE) / CAST(k - 1 AS DOUBLE))
        |      / (CAST(ssw_micro AS DOUBLE) / CAST(n - k AS DOUBLE))) AS BIGINT) END AS f_nano
        |FROM t""".stripMargin,

    // same decomposition, groups = event types, per-event dollars
    "q_anova" ->
      """WITH obs AS (
        |  SELECT event_type AS g, CAST(round(value*100) AS BIGINT) // 100 AS x
        |  FROM events WHERE value IS NOT NULL
        |), pg AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS ng, CAST(sum(x) AS BIGINT) AS sg,
        |    CAST(sum(x*x) AS BIGINT) AS qg
        |  FROM obs GROUP BY 1
        |), gg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS BIGINT) AS s, CAST(sum(qg) AS BIGINT) AS q,
        |    CAST(sum(CAST(round(1e6 * CAST(ng*qg - sg*sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE)) AS BIGINT)) AS BIGINT) AS ssw_micro
        |  FROM pg
        |), t AS (
        |  SELECT n, k,
        |    CAST(round(1e6 * CAST(n*q - s*s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS sst_micro,
        |    ssw_micro
        |  FROM gg
        |)
        |SELECT n, k, sst_micro, ssw_micro, sst_micro - ssw_micro AS ssb_micro,
        |  CASE WHEN k < 2 OR sst_micro = 0 THEN NULL
        |    ELSE CAST(round(1e9 * CAST(sst_micro - ssw_micro AS DOUBLE)
        |      / CAST(sst_micro AS DOUBLE)) AS BIGINT) END AS eta2_nano,
        |  CASE WHEN k < 2 OR n <= k OR ssw_micro = 0 THEN NULL
        |    ELSE CAST(round(1e9 * (CAST(sst_micro - ssw_micro AS DOUBLE) / CAST(k - 1 AS DOUBLE))
        |      / (CAST(ssw_micro AS DOUBLE) / CAST(n - k AS DOUBLE))) AS BIGINT) END AS f_nano
        |FROM t""".stripMargin,

    // brute-force neighbor graph + the recursive min-label closure
    // (the componentsSql pattern); border = min core-neighbor cluster
    "q_dbscan" ->
      """WITH RECURSIVE p AS (
        |  SELECT c_custkey AS id,
        |    CAST(concat('0x', substr(md5(concat('gx', CAST(c_custkey AS VARCHAR))), 1, 15))
        |         AS BIGINT) % 1000000 AS x,
        |    CAST(concat('0x', substr(md5(concat('gy', CAST(c_custkey AS VARCHAR))), 1, 15))
        |         AS BIGINT) % 1000000 AS y
        |  FROM customer
        |), pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM p a JOIN p b ON a.id < b.id
        |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000
        |), sym AS (
        |  SELECT id_a AS id, id_b AS nb FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), core AS (
        |  SELECT id FROM sym GROUP BY id HAVING count(*) >= 2
        |), ce AS (
        |  SELECT s.id AS src, s.nb AS dst FROM sym s
        |  JOIN core c1 ON c1.id = s.id JOIN core c2 ON c2.id = s.nb
        |), reach(id, r) AS (
        |  SELECT src, src FROM ce
        |  UNION
        |  SELECT e.src, r.r FROM ce e JOIN reach r ON r.id = e.dst
        |), comp AS (
        |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1
        |), core_clusters AS (
        |  SELECT c.id, coalesce(m.cluster_id, c.id) AS cluster_id
        |  FROM core c LEFT JOIN comp m USING (id)
        |), border AS (
        |  SELECT s.id, min(cc.cluster_id) AS cluster_id
        |  FROM sym s JOIN core_clusters cc ON cc.id = s.nb
        |  WHERE s.id NOT IN (SELECT id FROM core)
        |  GROUP BY 1
        |)
        |SELECT p.id,
        |  CASE WHEN cc.id IS NOT NULL THEN 'core'
        |       WHEN b.id IS NOT NULL THEN 'border' ELSE 'noise' END AS role,
        |  coalesce(cc.cluster_id, b.cluster_id) AS cluster_id
        |FROM p LEFT JOIN core_clusters cc ON cc.id = p.id
        |LEFT JOIN border b ON b.id = p.id
        |ORDER BY p.id""".stripMargin
  )

  private def journeyOracles: Map[String, String] = Map(
    // The cuts/buckets are internal; the output is the plain global
    // window the operator avoids executing.
    "q_global_ids" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS row_id,
        |  CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INT) AS tile
        |FROM documents
        |ORDER BY row_id""".stripMargin,

    // CAST(ts AS TIMESTAMP) truncates parquet-ns to the same micros
    // Spark reads (verify skill gotcha).
    "q_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events WHERE user_id IS NOT NULL
        |), f AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1
        |)
        |SELECT f.cohort_day,
        |  CAST(datediff('day', f.cohort_day, e.day) AS INT) AS period,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_transitions" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ) AS next_type
        |  FROM events WHERE user_id IS NOT NULL
        |)
        |SELECT event_type AS from_type, next_type AS to_type,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM seq WHERE next_type IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // DuckDB's damerau_levenshtein is the UNRESTRICTED form too
    // (verified 'ca'->'abc' = 2) — exact integer equality
    "q_damerau" ->
      """WITH dirty AS (
        |  SELECT p_partkey AS dirty_id, replace(p_name, 'e', '') AS dirty_name,
        |    regexp_replace(lower(trim(replace(p_name, 'e', ''))), '[aeiou ]', '', 'g') AS blk
        |  FROM part WHERE p_partkey % 11 = 0
        |), cat AS (
        |  SELECT p_partkey, p_name,
        |    regexp_replace(lower(trim(p_name)), '[aeiou ]', '', 'g') AS blk
        |  FROM part
        |), scored AS (
        |  SELECT d.dirty_id,
        |    CAST(damerau_levenshtein(d.dirty_name, c.p_name) AS BIGINT) AS dist,
        |    c.p_partkey
        |  FROM dirty d JOIN cat c ON d.blk = c.blk
        |), ranked AS (
        |  SELECT dirty_id, dist, p_partkey AS match_key, row_number() OVER (
        |    PARTITION BY dirty_id ORDER BY dist, p_partkey) AS rn
        |  FROM scored
        |)
        |SELECT dirty_id, dist, match_key FROM ranked WHERE rn = 1
        |ORDER BY dirty_id""".stripMargin,

    // prefixes built from the same segment list; level = segment
    // count of the prefix
    "q_path_rollup" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    concat('/s', doc_id % 5, '/c', doc_id % 17, '/p', doc_id) AS path
        |  FROM documents
        |), segs AS (
        |  SELECT doc_id,
        |    list_filter(string_split(path, '/'), s -> len(s) > 0) AS t
        |  FROM p
        |), pref AS (
        |  SELECT doc_id, '/' || array_to_string(t[1:i], '/') AS prefix
        |  FROM segs, unnest(range(1, least(len(t), 3) + 1)) AS u(i)
        |)
        |SELECT prefix, CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(len(list_filter(string_split(prefix, '/'), s -> len(s) > 0)) AS INT) AS level
        |FROM pref GROUP BY 1 ORDER BY prefix""".stripMargin,

    // per-term nano gains; log2 rendered ln2/ln on BOTH engines
    // (Spark log2 = log/log(2), DuckDB log2 = libm — not mirrored)
    "q_ndcg" ->
      """WITH res AS (
        |  SELECT qid, item, rank FROM (
        |    SELECT CAST(c_nationkey AS BIGINT) AS qid, c_custkey AS item,
        |      CAST(row_number() OVER (PARTITION BY c_nationkey
        |        ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_custkey)
        |        AS BIGINT) AS rank
        |    FROM customer)
        |  WHERE rank <= 10
        |), judged AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS qid, o.o_custkey AS item,
        |    CAST(least(2, count(*) // 4) AS BIGINT) AS rel
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2
        |), dcg AS (
        |  SELECT r.qid,
        |    CAST(sum(CAST(round(1e9 * (pow(2, coalesce(j.rel, 0)) - 1) *
        |      0.6931471805599453 / ln(CAST(r.rank + 1 AS DOUBLE))) AS BIGINT))
        |      AS BIGINT) AS dcg_nano
        |  FROM res r LEFT JOIN judged j ON j.qid = r.qid AND j.item = r.item
        |  GROUP BY 1
        |), ideal AS (
        |  SELECT qid,
        |    CAST(sum(CAST(round(1e9 * (pow(2, rel) - 1) *
        |      0.6931471805599453 / ln(CAST(pos + 1 AS DOUBLE))) AS BIGINT))
        |      AS BIGINT) AS idcg_nano
        |  FROM (
        |    SELECT qid, rel, CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY rel DESC, item) AS BIGINT) AS pos
        |    FROM judged WHERE rel > 0)
        |  WHERE pos <= 10
        |  GROUP BY 1
        |)
        |SELECT d.qid, d.dcg_nano,
        |  CAST(coalesce(i.idcg_nano, 0) AS BIGINT) AS idcg_nano,
        |  CASE WHEN coalesce(i.idcg_nano, 0) = 0 THEN NULL
        |    ELSE CAST(round(1e9 * CAST(d.dcg_nano AS DOUBLE) /
        |      CAST(i.idcg_nano AS DOUBLE)) AS BIGINT) END AS ndcg_nano
        |FROM dcg d LEFT JOIN ideal i ON i.qid = d.qid""".stripMargin,

    // fully integer: 10^9 // first relevant rank
    "q_mrr" ->
      """WITH res AS (
        |  SELECT qid, item, rank FROM (
        |    SELECT CAST(c_nationkey AS BIGINT) AS qid, c_custkey AS item,
        |      CAST(row_number() OVER (PARTITION BY c_nationkey
        |        ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_custkey)
        |        AS BIGINT) AS rank
        |    FROM customer)
        |  WHERE rank <= 10
        |), judged AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS qid, o.o_custkey AS item,
        |    CAST(least(2, count(*) // 4) AS BIGINT) AS rel
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2
        |)
        |SELECT qid, first_rel_rank,
        |  CAST(coalesce(1000000000 // first_rel_rank, 0) AS BIGINT) AS rr_nano
        |FROM (
        |  SELECT r.qid, CAST(min(CASE WHEN coalesce(j.rel, 0) > 0
        |    THEN r.rank END) AS BIGINT) AS first_rel_rank
        |  FROM res r LEFT JOIN judged j ON j.qid = r.qid AND j.item = r.item
        |  GROUP BY 1)""".stripMargin,

    // rank-only fusion: 10^9 // (60 + rank) exact integer votes;
    // DuckDB // truncates = Spark div on the positive domain
    "q_rrf" ->
      """WITH bal AS (
        |  SELECT 'bal' AS lst, CAST(c_nationkey AS BIGINT) AS qid,
        |    c_custkey AS item, CAST(round(c_acctbal * 100) AS BIGINT) AS score
        |  FROM customer
        |), spend AS (
        |  SELECT 'spend' AS lst, CAST(c.c_nationkey AS BIGINT) AS qid,
        |    o.o_custkey AS item,
        |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS score
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2, 3
        |), u AS (
        |  SELECT * FROM bal UNION ALL SELECT * FROM spend
        |), r AS (
        |  SELECT qid, item, CAST(row_number() OVER (
        |    PARTITION BY lst, qid ORDER BY score DESC, item) AS BIGINT) AS rk
        |  FROM u
        |), f AS (
        |  SELECT qid, item, CAST(count(*) AS BIGINT) AS n_lists,
        |    CAST(min(rk) AS BIGINT) AS best_rank,
        |    CAST(sum(1000000000 // (60 + rk)) AS BIGINT) AS rrf_nano
        |  FROM r GROUP BY 1, 2
        |)
        |SELECT qid, item, n_lists, best_rank, rrf_nano FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY rrf_nano DESC, item) AS fr FROM f)
        |WHERE fr <= 5""".stripMargin,

    // ranks via row_number(v, tie); G = (2Σiv − (n+1)Σv)/(nΣv)
    "q_gini" ->
      """WITH spend AS (
        |  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id
        |), r AS (
        |  SELECT cents, CAST(row_number() OVER (ORDER BY cents, user_id) AS BIGINT) AS rk
        |  FROM spend
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS total,
        |    CAST(sum(rk * cents) AS BIGINT) AS rx
        |  FROM r
        |)
        |SELECT n, total,
        |  CASE WHEN total = 0 THEN NULL
        |    ELSE CAST(round((1e9 * (2.0 * CAST(rx AS DOUBLE) -
        |      (CAST(n AS DOUBLE) + 1.0) * CAST(total AS DOUBLE))) /
        |      (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))) AS BIGINT) END AS gini_nano
        |FROM s""".stripMargin,

    // per-member nano share², summed order-free per group
    "q_hhi" ->
      """WITH m AS (
        |  SELECT event_type, user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mv
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, CAST(sum(mv) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_members
        |  FROM m GROUP BY 1
        |)
        |SELECT m.event_type, first(t.n_members) AS n_members,
        |  first(t.total) AS total,
        |  CAST(sum(CAST(round(1e9 *
        |    (CAST(mv AS DOUBLE) / CAST(total AS DOUBLE)) *
        |    (CAST(mv AS DOUBLE) / CAST(total AS DOUBLE))) AS BIGINT)) AS BIGINT) AS hhi_nano
        |FROM m JOIN t USING (event_type)
        |GROUP BY m.event_type
        |ORDER BY m.event_type""".stripMargin,

    // same lower()-cased [aeiouy]+ groups, vowel-less word floor,
    // [.!?]+ sentence runs floored at 1, mirrored Flesch tree
    "q_readability" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(coalesce(text, ''), ' +'),
        |      t -> len(t) > 0)) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+')) +
        |      len(list_filter(string_split_regex(coalesce(text, ''), ' +'),
        |        t -> len(t) > 0 AND NOT regexp_matches(lower(t), '[aeiouy]'))) AS BIGINT) AS y,
        |    GREATEST(CAST(1 AS BIGINT),
        |      CAST(len(regexp_extract_all(coalesce(text, ''), '[.!?]+')) AS BIGINT)) AS s
        |  FROM documents
        |)
        |SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
        |  CASE WHEN w = 0 THEN NULL
        |    ELSE CAST(round(1e9 * (206.835 -
        |      1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE)) -
        |      84.6 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)))) AS BIGINT) END AS flesch_nano
        |FROM b ORDER BY doc_id""".stripMargin,

    // identical trailing-7-row window sums, mirrored Pearson tree
    "q_rolling_corr" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS x,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1
        |), win AS (
        |  SELECT day,
        |    CAST(count(*) OVER w AS BIGINT) AS n_rows,
        |    CAST(sum(x) OVER w AS BIGINT) AS sx, CAST(sum(y) OVER w AS BIGINT) AS sy,
        |    CAST(sum(x*y) OVER w AS BIGINT) AS sxy,
        |    CAST(sum(x*x) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(y*y) OVER w AS BIGINT) AS syy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |)
        |SELECT day, n_rows,
        |  CASE WHEN (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
        |         OR (CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE) -
        |             CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0 THEN NULL
        |    ELSE CAST(round((1e9 * (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) /
        |      sqrt((CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |            CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |           (CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE) -
        |            CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT) END AS r_nano
        |FROM win ORDER BY day""".stripMargin,

    // ||s_a·n_b − s_b·n_a||² exact integer fold, then the two
    // mirrored divisions by (n_a·n_b). The squares live in HUGEINT
    // (the engine mirrors with decimal(38,0)): measured ~10²² at
    // sf10, past int64 — plain BIGINT multiplication errors in
    // DuckDB and silently wraps in Spark (r14)
    "q_class_sep" ->
      """WITH q AS (
        |  SELECT label, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL
        |), cells AS (
        |  SELECT label AS lab, i, CAST(sum(v[i]) AS BIGINT) AS s
        |  FROM q, unnest(range(1, len(v)+1)) AS u(i)
        |  GROUP BY 1, 2
        |), sums AS (
        |  SELECT lab, array_agg(s ORDER BY i) AS sv FROM cells GROUP BY 1
        |), counts AS (
        |  SELECT label AS lab, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1
        |), c AS (
        |  SELECT sums.lab, sv, n FROM sums JOIN counts USING (lab)
        |)
        |SELECT CAST(a.lab AS BIGINT) AS label_a, CAST(b.lab AS BIGINT) AS label_b,
        |  a.n AS n_a, b.n AS n_b,
        |  CAST(round(1e9 * CAST(list_sum(list_transform(range(1, len(a.sv)+1),
        |      i -> (CAST(a.sv[i] AS HUGEINT)*b.n - CAST(b.sv[i] AS HUGEINT)*a.n)
        |         * (CAST(a.sv[i] AS HUGEINT)*b.n - CAST(b.sv[i] AS HUGEINT)*a.n))) AS DOUBLE) /
        |    CAST(a.n * b.n AS DOUBLE) / CAST(a.n * b.n AS DOUBLE)) AS BIGINT) AS dist2_nano
        |FROM c a JOIN c b ON a.lab < b.lab
        |ORDER BY 1, 2""".stripMargin,

    // the two-state recurrence inlines l's formula into b's. The
    // halving is a FLOOR for both signs (Spark's arithmetic shift);
    // DuckDB's // truncates toward zero, so negatives subtract 1
    // first — (x−1)//2 is floor(x/2) for x < 0
    "q_holt" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
        |    row_number() OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ) AS rn
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), r AS (
        |  SELECT user_id, rn, v, v AS l, CAST(0 AS BIGINT) AS b FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.v,
        |    CASE WHEN e.v + r.l + r.b < 0 THEN (e.v + r.l + r.b - 1) // 2
        |         ELSE (e.v + r.l + r.b) // 2 END,
        |    CASE WHEN (CASE WHEN e.v + r.l + r.b < 0 THEN (e.v + r.l + r.b - 1) // 2
        |                    ELSE (e.v + r.l + r.b) // 2 END) - r.l + r.b < 0
        |      THEN ((CASE WHEN e.v + r.l + r.b < 0 THEN (e.v + r.l + r.b - 1) // 2
        |                  ELSE (e.v + r.l + r.b) // 2 END) - r.l + r.b - 1) // 2
        |      ELSE ((CASE WHEN e.v + r.l + r.b < 0 THEN (e.v + r.l + r.b - 1) // 2
        |                  ELSE (e.v + r.l + r.b) // 2 END) - r.l + r.b) // 2 END
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT user_id, rn, v, l AS level, b AS trend FROM r
        |ORDER BY user_id, rn""".stripMargin,

    // dataflow-mirrored oracle (the q_ewma_chunked pattern, 2-state):
    // identity-init coefficient recurrences with the ENGINE's exact
    // parenthesization, bucket-carry recursion, same final affine
    // reconstruction — raw-double hash, no epsilon. Repeated
    // sub-expressions (p1 inside s1, lp1 inside bp1) re-round to the
    // identical double, so inlining them preserves bit-parity
    "q_holt_chunked" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS b,
        |    row_number() OVER (
        |      PARTITION BY user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS j
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), w AS (
        |  -- identity-init first step folds to exact constants; CAST
        |  -- keeps every coefficient column DOUBLE (bare 0.5 literals
        |  -- would make DuckDB infer DECIMAL and truncate the algebra)
        |  SELECT user_id, b, j, v,
        |    CAST(0.5 AS DOUBLE) AS p,
        |    CAST(0.5 AS DOUBLE) AS q,
        |    0.5 * CAST(v AS DOUBLE) AS r,
        |    CAST(-0.25 AS DOUBLE) AS s,
        |    CAST(0.75 AS DOUBLE) AS t,
        |    0.5 * (0.5 * CAST(v AS DOUBLE)) AS u,
        |    CAST(v AS DOUBLE) AS lp, CAST(0.0 AS DOUBLE) AS bp
        |  FROM e WHERE j = 1
        |  UNION ALL
        |  SELECT e.user_id, e.b, e.j, e.v,
        |    0.5 * w.p + 0.5 * w.s,
        |    0.5 * w.q + 0.5 * w.t,
        |    (0.5 * CAST(e.v AS DOUBLE) + 0.5 * w.r) + 0.5 * w.u,
        |    0.5 * ((0.5 * w.p + 0.5 * w.s) - w.p) + 0.5 * w.s,
        |    0.5 * ((0.5 * w.q + 0.5 * w.t) - w.q) + 0.5 * w.t,
        |    0.5 * (((0.5 * CAST(e.v AS DOUBLE) + 0.5 * w.r) + 0.5 * w.u) - w.r)
        |      + 0.5 * w.u,
        |    (0.5 * CAST(e.v AS DOUBLE) + 0.5 * w.lp) + 0.5 * w.bp,
        |    0.5 * (((0.5 * CAST(e.v AS DOUBLE) + 0.5 * w.lp) + 0.5 * w.bp) - w.lp)
        |      + 0.5 * w.bp
        |  FROM w JOIN e ON e.user_id = w.user_id AND e.b = w.b AND e.j = w.j + 1
        |), sm AS (
        |  SELECT user_id, b, p, q, r, s, t, u, lp, bp, j AS cnt
        |  FROM w QUALIFY j = max(j) OVER (PARTITION BY user_id, b)
        |), s2 AS (
        |  SELECT user_id, b, p, q, r, s, t, u, lp, bp, cnt,
        |    row_number() OVER (PARTITION BY user_id ORDER BY b) AS ci,
        |    sum(cnt) OVER (PARTITION BY user_id ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
        |  FROM sm
        |), c AS (
        |  SELECT user_id, b, ci, CAST(NULL AS DOUBLE) AS l_in,
        |    CAST(NULL AS DOUBLE) AS b_in, lp AS l_out, bp AS b_out,
        |    CAST(0 AS BIGINT) AS off
        |  FROM s2 WHERE ci = 1
        |  UNION ALL
        |  SELECT s2.user_id, s2.b, s2.ci, c.l_out, c.b_out,
        |    (s2.p * c.l_out + s2.q * c.b_out) + s2.r,
        |    (s2.s * c.l_out + s2.t * c.b_out) + s2.u,
        |    CAST(s2.off AS BIGINT)
        |  FROM c JOIN s2 ON s2.user_id = c.user_id AND s2.ci = c.ci + 1
        |)
        |SELECT w.user_id, CAST(c.off + w.j AS BIGINT) AS rn, w.v,
        |  CASE WHEN c.l_in IS NULL THEN w.lp
        |       ELSE (w.p * c.l_in + w.q * c.b_in) + w.r END AS level,
        |  CASE WHEN c.l_in IS NULL THEN w.bp
        |       ELSE (w.s * c.l_in + w.t * c.b_in) + w.u END AS trend
        |FROM w JOIN c ON w.user_id = c.user_id AND w.b = c.b
        |ORDER BY w.user_id, rn""".stripMargin,

    // the same 16 keyed md5 hashes; argmax = first position of the
    // list max, identical tie rule
    "q_rendezvous" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    CAST(list_position(l, list_max(l)) - 1 AS INT) AS shard
        |  FROM (
        |    SELECT doc_id, list_transform(range(0, 16), s ->
        |      CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':', CAST(s AS VARCHAR))), 1, 15)) AS BIGINT)) AS l
        |    FROM documents)
        |)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle is the BRUTE overlap join (the bucketed machinery
    // is engine-side; JoinsSpec proves its exactly-once parity)
    "q_interval_join" ->
      """WITH ev AS (
        |  SELECT * FROM events WHERE user_id IS NOT NULL
        |), act AS (
        |  SELECT user_id,
        |    CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
        |    CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) + 1 AS BIGINT) AS e
        |  FROM ev GROUP BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |), inc AS (
        |  SELECT event_id AS error_id,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS bs,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS BIGINT) AS be
        |  FROM ev WHERE event_type = 'error'
        |)
        |SELECT error_id, CAST(count(*) AS BIGINT) AS n_active_intervals,
        |  CAST(sum(least(e, be) - greatest(s, bs)) AS BIGINT) AS overlap_us
        |FROM act JOIN inc ON s < be AND bs < e
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_interval_join_user" ->
      """WITH ev AS (
        |  SELECT * FROM events WHERE user_id IS NOT NULL
        |), act AS (
        |  SELECT user_id,
        |    CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
        |    CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) + 1 AS BIGINT) AS e
        |  FROM ev GROUP BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |), inc AS (
        |  SELECT user_id AS b_user, event_id AS error_id,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS bs,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS BIGINT) AS be
        |  FROM ev WHERE event_type = 'error'
        |)
        |SELECT error_id, CAST(count(*) AS BIGINT) AS n_active_intervals,
        |  CAST(sum(least(e, be) - greatest(s, bs)) AS BIGINT) AS overlap_us
        |FROM act JOIN inc ON act.user_id = inc.b_user AND s < be AND bs < e
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // θ = (nΣxy − ΣxΣy)/(nΣxx − Σx²), lifts from per-variant sums;
    // every tree mirrored over exact integer moments
    "q_cuped" ->
      """WITH u AS (
        |  SELECT user_id % 2 AS v,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'click'
        |      AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
        |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS x,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |      AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
        |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN v = 0 THEN x ELSE 0 END) AS BIGINT) AS sxc,
        |    CAST(sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS BIGINT) AS syc,
        |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN v = 1 THEN x ELSE 0 END) AS BIGINT) AS sxt,
        |    CAST(sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS BIGINT) AS syt
        |  FROM u
        |)
        |SELECT nc AS n_control, nt AS n_treatment,
        |  CASE WHEN nc = 0 OR nt = 0 THEN NULL
        |    ELSE CAST(round(1e9 * (CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE) -
        |      CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE))) AS BIGINT) END AS lift_nano,
        |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
        |         OR nc = 0 OR nt = 0 THEN NULL
        |    ELSE CAST(round(1e9 *
        |      ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) AS BIGINT) END AS theta_nano,
        |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
        |         OR nc = 0 OR nt = 0 THEN NULL
        |    ELSE CAST(round(1e9 * ((CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE) -
        |        CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE)) -
        |      ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) *
        |      (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE) -
        |       CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE)))) AS BIGINT) END AS cuped_lift_nano
        |FROM m""".stripMargin,

    // 2x2 counts exact; lift and the closed-form chi-square each one
    // mirrored double tree
    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id % 2 AS v,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        |), c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN v = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN v = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN v = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN v = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM u
        |)
        |SELECT a + b AS n_control, c + d AS n_treatment,
        |  b AS conv_control, d AS conv_treatment,
        |  CASE WHEN a + b = 0 OR c + d = 0 THEN NULL
        |    ELSE CAST(round(1e9 * (CAST(d AS DOUBLE) / (CAST(c AS DOUBLE) + CAST(d AS DOUBLE)) -
        |      CAST(b AS DOUBLE) / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)))) AS BIGINT) END AS lift_nano,
        |  CASE WHEN (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE)) *
        |            (CAST(a AS DOUBLE) + CAST(c AS DOUBLE)) * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE)) = 0 THEN NULL
        |    ELSE CAST(round(1e9 *
        |      (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE) + CAST(d AS DOUBLE)) *
        |      (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) *
        |      (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) /
        |      ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE)) *
        |       (CAST(a AS DOUBLE) + CAST(c AS DOUBLE)) * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE)))) AS BIGINT)
        |  END AS chi2_nano
        |FROM c""".stripMargin,

    // the KM product as order-free log-space nano sums; the
    // cumulative runs over the duration HISTOGRAM (the ks-drift
    // contract), at-risk by prefix subtraction
    "q_kaplan_meier" ->
      """WITH per AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS tp,
        |    max(CAST(ts AS TIMESTAMP)) AS tl
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        |), d AS (
        |  SELECT (epoch_us(coalesce(tp, tl)) - epoch_us(t0)) // 3600000000 AS t,
        |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS e
        |  FROM per
        |), hist AS (
        |  SELECT t, CAST(sum(e) AS BIGINT) AS n_events,
        |    CAST(sum(1 - e) AS BIGINT) AS n_censored
        |  FROM d GROUP BY 1
        |), risk AS (
        |  SELECT t, n_events, n_censored,
        |    CAST(sum(n_events + n_censored) OVER () -
        |      coalesce(sum(n_events + n_censored) OVER (
        |        ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM hist
        |), step AS (
        |  SELECT t, n_risk, n_events, n_censored,
        |    CASE WHEN n_events = 0 THEN 0
        |         WHEN n_events = n_risk THEN NULL
        |         ELSE CAST(round(1e9 * ln(1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE))) AS BIGINT)
        |    END AS l
        |  FROM risk
        |)
        |SELECT t, n_risk, n_events, n_censored,
        |  CASE WHEN max(CASE WHEN l IS NULL THEN 1 ELSE 0 END) OVER (
        |         ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 THEN NULL
        |       ELSE CAST(sum(l) OVER (
        |         ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  END AS log_s_nano
        |FROM step ORDER BY t""".stripMargin,

    // micro-unit log points then exact sums; the normal-equation
    // products move to doubles (n·Σxy overflows longs at k≈10³)
    "q_zipf" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split_regex(coalesce(text, ''), ' +'),
        |    t -> len(t) > 0)) AS tok
        |  FROM documents
        |), f AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS f FROM tok
        |  GROUP BY 1 ORDER BY f DESC, tok LIMIT 500
        |), pts AS (
        |  SELECT
        |    CAST(round(1e6 * ln(CAST(row_number() OVER (ORDER BY f DESC, tok) AS DOUBLE))) AS BIGINT) AS x,
        |    CAST(round(1e6 * ln(CAST(f AS DOUBLE))) AS BIGINT) AS y
        |  FROM f
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx
        |  FROM pts
        |)
        |SELECT n_tokens,
        |  CASE WHEN (CAST(n_tokens AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0 THEN NULL
        |  ELSE CAST(round((1e9 * (CAST(n_tokens AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |                          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) /
        |    (CAST(n_tokens AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT) END AS slope_nano
        |FROM s""".stripMargin,

    // the q_incr_neardup shingle conventions; distinct hashes per
    // source, one hash self-join, Jaccard in one mirrored division
    "q_source_overlap" ->
      """WITH tok AS (
        |  SELECT source, string_split_regex(text, ' +') AS toks
        |  FROM documents WHERE source IS NOT NULL
        |), sh AS (
        |  SELECT source, unnest(list_distinct(list_transform(generate_series(1, len(toks)-2),
        |    i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2]))) AS g
        |  FROM tok
        |), hs AS (
        |  SELECT DISTINCT source AS src,
        |    CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS h
        |  FROM sh
        |), sizes AS (
        |  SELECT src, CAST(count(*) AS BIGINT) AS n_sh FROM hs GROUP BY 1
        |), common AS (
        |  SELECT a.src AS a, b.src AS b, CAST(count(*) AS BIGINT) AS n_common
        |  FROM hs a JOIN hs b ON a.h = b.h AND a.src < b.src GROUP BY 1, 2
        |)
        |SELECT common.a, common.b, sa.n_sh AS n_a, sb.n_sh AS n_b, n_common,
        |  CAST(round(1e9 * CAST(n_common AS DOUBLE) /
        |    CAST(n_a + n_b - n_common AS DOUBLE)) AS BIGINT) AS jaccard_nano
        |FROM common
        |JOIN sizes sa ON sa.src = common.a
        |JOIN sizes sb ON sb.src = common.b
        |ORDER BY 1, 2""".stripMargin,

    // generate_series spine, string-head digit, mirrored log10 and
    // share trees
    "q_benford" ->
      """WITH v AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        |), d AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM v WHERE cents > 0 GROUP BY 1
        |), spine AS (
        |  SELECT unnest(range(1, 10)) AS digit
        |), f AS (
        |  SELECT spine.digit, CAST(coalesce(d.n, 0) AS BIGINT) AS n
        |  FROM spine LEFT JOIN d USING (digit)
        |), t AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nt FROM f
        |)
        |SELECT CAST(f.digit AS BIGINT) AS digit, f.n,
        |  CAST(round(1e9 * CAST(f.n AS DOUBLE) / CAST(nt AS DOUBLE)) AS BIGINT) AS share_nano,
        |  CAST(round(1e9 * log10((CAST(f.digit AS DOUBLE) + 1.0) / CAST(f.digit AS DOUBLE))) AS BIGINT) AS benford_nano,
        |  abs(CAST(round(1e9 * CAST(f.n AS DOUBLE) / CAST(nt AS DOUBLE)) AS BIGINT) -
        |      CAST(round(1e9 * log10((CAST(f.digit AS DOUBLE) + 1.0) / CAST(f.digit AS DOUBLE))) AS BIGINT)) AS dev_nano
        |FROM f, t ORDER BY digit""".stripMargin,

    // position-probe counting (NOT length(replace(...)) — that is
    // non-overlapping and disagrees on self-overlapping patterns)
    "q_multi_match" ->
      """WITH pos AS (
        |  SELECT doc_id, text, u.i
        |  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
        |  WHERE text IS NOT NULL
        |), pats(pattern) AS (
        |  VALUES ('scan'), ('join'), ('data'), ('stream'), ('an'), ('atat')
        |), hits AS (
        |  SELECT pos.doc_id, pats.pattern,
        |    CASE WHEN substr(pos.text, pos.i, length(pats.pattern)) = pats.pattern
        |      THEN 1 ELSE 0 END AS h
        |  FROM pos, pats
        |)
        |SELECT doc_id, pattern, CAST(sum(h) AS BIGINT) AS n
        |FROM hits GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // five exact integer statistics, one mirrored KN formula
    "q_kn_bigrams" ->
      """WITH tokarr AS (
        |  SELECT list_filter(string_split_regex(coalesce(text, ''), ' +'), x -> len(x) > 0) AS t
        |  FROM documents
        |), bg AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM tokarr, unnest(range(1, len(t))) AS u(i)
        |), cb AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
        |), lft AS (
        |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |    CAST(count(*) AS BIGINT) AS n1fw FROM cb GROUP BY 1
        |), rgt AS (
        |  SELECT w2, CAST(count(*) AS BIGINT) AS n1bw FROM cb GROUP BY 1
        |), ty AS (
        |  SELECT CAST(count(*) AS BIGINT) AS ntypes FROM cb
        |)
        |SELECT cb.w1, cb.w2, cb.c12, lft.c1, lft.n1fw, rgt.n1bw,
        |  CAST(round(1e9 * (
        |    (CAST(c12 AS DOUBLE) - 0.75) / CAST(c1 AS DOUBLE) +
        |    (0.75 * CAST(n1fw AS DOUBLE) / CAST(c1 AS DOUBLE)) *
        |      (CAST(n1bw AS DOUBLE) / CAST(ntypes AS DOUBLE)))) AS BIGINT) AS p_kn_nano
        |FROM cb JOIN lft USING (w1) JOIN rgt USING (w2), ty
        |ORDER BY c12 DESC, w1, w2 LIMIT 100""".stripMargin,

    // hash-percent confidence, 10 integer-div bins; |100·Σy − Σp|
    // exact, one mirrored division per bin
    "q_calibration" ->
      """WITH d AS (
        |  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS p,
        |    CASE WHEN length(text) > 500 THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), b AS (
        |  SELECT LEAST((p * 10) // 100, 9) AS bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sum_label, CAST(sum(p) AS BIGINT) AS sum_pct
        |  FROM d GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nt FROM b
        |)
        |SELECT CAST(bin AS BIGINT) AS bin, n, sum_label, sum_pct,
        |  CAST(round((1e9 * CAST(abs(100*sum_label - sum_pct) AS DOUBLE)) /
        |    (100.0 * CAST(nt AS DOUBLE))) AS BIGINT) AS ece_nano
        |FROM b, t ORDER BY bin""".stripMargin,

    // ranks via row_number, tie groups by score, the U2 identity in
    // integers; one mirrored division at the end
    "q_auc" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v,
        |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        |  FROM embeddings
        |), plane AS (
        |  SELECT list_transform(range(0, 64), i ->
        |    CASE WHEN CAST(concat('0x', substr(md5(concat('0', ':', CAST(i AS VARCHAR))), 1, 15)) AS BIGINT) % 2 = 1
        |      THEN 1 ELSE -1 END) AS s
        |), scored AS (
        |  SELECT vec_id, y,
        |    CAST(list_sum(list_transform(range(1, len(q.v) + 1),
        |      ix -> q.v[ix] * plane.s[ix])) AS BIGINT) AS score
        |  FROM q, plane
        |), r AS (
        |  SELECT score, y, row_number() OVER (ORDER BY score, vec_id) AS rk FROM scored
        |), g AS (
        |  SELECT score, CAST(min(rk) AS BIGINT) AS st,
        |    CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
        |  FROM r GROUP BY 1
        |), s AS (
        |  SELECT CAST(sum(p) AS BIGINT) AS np, CAST(sum(c - p) AS BIGINT) AS nn,
        |    CAST(sum(p * (2*st + c - 1)) AS BIGINT) AS u2
        |  FROM g
        |)
        |SELECT np AS n_pos, nn AS n_neg,
        |  CAST(round((1e9 * CAST(u2 - np*(np+1) AS DOUBLE)) /
        |    (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))) AS BIGINT) AS auc_nano
        |FROM s""".stripMargin,

    // same char histogram via string_split(text, ''); the −p·ln(p)
    // tree is mirrored and nano-rounded per character
    "q_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |), cnt AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS nc
        |  FROM chars WHERE ch <> '' GROUP BY 1, 2
        |), tot AS (
        |  SELECT doc_id, CAST(sum(nc) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS distinct_chars
        |  FROM cnt GROUP BY 1
        |)
        |SELECT cnt.doc_id, first(tot.n) AS n_chars,
        |  first(tot.distinct_chars) AS distinct_chars,
        |  CAST(sum(CAST(round(-1e9 * (CAST(nc AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)) AS BIGINT) AS h_nano
        |FROM cnt JOIN tot USING (doc_id)
        |GROUP BY cnt.doc_id
        |ORDER BY cnt.doc_id""".stripMargin,

    // each Bellman-Ford round is the union-min: relaxation
    // candidates UNION ALL current distances, min() per node
    "q_sssp" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
        |), sym AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
        |), e AS (
        |  SELECT src, dst, 1 + (src + dst) % 7 AS w FROM sym
        |), s0 AS (
        |  SELECT DISTINCT src AS id, CAST(0 AS BIGINT) AS dist FROM ed WHERE src % 202 = 0
        |), d1 AS (
        |  SELECT id, min(dist) AS dist FROM (
        |    SELECT e.dst AS id, d.dist + e.w AS dist FROM e JOIN s0 d ON d.id = e.src
        |    UNION ALL SELECT id, dist FROM s0
        |  ) GROUP BY id
        |), d2 AS (
        |  SELECT id, min(dist) AS dist FROM (
        |    SELECT e.dst AS id, d.dist + e.w AS dist FROM e JOIN d1 d ON d.id = e.src
        |    UNION ALL SELECT id, dist FROM d1
        |  ) GROUP BY id
        |), d3 AS (
        |  SELECT id, min(dist) AS dist FROM (
        |    SELECT e.dst AS id, d.dist + e.w AS dist FROM e JOIN d2 d ON d.id = e.src
        |    UNION ALL SELECT id, dist FROM d2
        |  ) GROUP BY id
        |), d4 AS (
        |  SELECT id, min(dist) AS dist FROM (
        |    SELECT e.dst AS id, d.dist + e.w AS dist FROM e JOIN d3 d ON d.id = e.src
        |    UNION ALL SELECT id, dist FROM d3
        |  ) GROUP BY id
        |)
        |SELECT CAST(id AS BIGINT) AS id, CAST(dist AS BIGINT) AS dist
        |FROM d4 ORDER BY id""".stripMargin,

    // per-wedge nano rounding then exact integer sums; top-100 by
    // the (score DESC, u, v) total order
    "q_adamic_adar" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst
        |  FROM lineitem WHERE l_partkey % 8 = 0
        |), e AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
        |), deg AS (
        |  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
        |), w AS (
        |  SELECT a.dst AS u, b.dst AS v, a.src AS z
        |  FROM e a JOIN e b ON a.src = b.src WHERE a.dst < b.dst
        |), sc AS (
        |  SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors,
        |    CAST(sum(CAST(round(1e9 / ln(CAST(deg.deg AS DOUBLE))) AS BIGINT)) AS BIGINT) AS aa_nano
        |  FROM w JOIN deg ON deg.id = w.z GROUP BY 1, 2
        |)
        |SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
        |  common_neighbors, aa_nano
        |FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = sc.u AND e.dst = sc.v)
        |ORDER BY aa_nano DESC, u, v LIMIT 100""".stripMargin,

    // capped twin: row_number-by-smallest-dst keeps 16 neighbors per
    // node, degrees and wedges over the CAPPED adjacency, adjacency
    // exclusion against the FULL graph — the cap replayed exactly
    "q_adamic_adar_capped" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst
        |  FROM lineitem WHERE l_partkey % 8 = 0
        |), e AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
        |), ec AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) AS rn FROM e
        |  ) WHERE rn <= 16
        |), deg AS (
        |  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM ec GROUP BY 1
        |), w AS (
        |  SELECT a.dst AS u, b.dst AS v, a.src AS z
        |  FROM ec a JOIN ec b ON a.src = b.src WHERE a.dst < b.dst
        |), sc AS (
        |  SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors,
        |    CAST(sum(CAST(round(1e9 / ln(CAST(deg.deg AS DOUBLE))) AS BIGINT)) AS BIGINT) AS aa_nano
        |  FROM w JOIN deg ON deg.id = w.z GROUP BY 1, 2
        |)
        |SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
        |  common_neighbors, aa_nano
        |FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = sc.u AND e.dst = sc.v)
        |ORDER BY aa_nano DESC, u, v LIMIT 100""".stripMargin,

    // the cap's dropped-wedge accounting: C(d,2) vs C(min(d,16),2)
    // sums over the uncapped degree frame — d*(d-1) is always even,
    // so integer // 2 is exact
    "q_adamic_adar_capstats" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst
        |  FROM lineitem WHERE l_partkey % 8 = 0
        |), e AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
        |), deg AS (
        |  SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(CASE WHEN d > 16 THEN 1 ELSE 0 END) AS BIGINT) AS nodes_capped,
        |  CAST(sum(d * (d - 1) // 2) AS BIGINT) AS wedges_exact,
        |  CAST(sum(least(d, 16) * (least(d, 16) - 1) // 2) AS BIGINT) AS wedges_kept,
        |  CAST(sum(d * (d - 1) // 2) - sum(least(d, 16) * (least(d, 16) - 1) // 2) AS BIGINT) AS wedges_dropped
        |FROM deg""".stripMargin,

    // the four edge cross products of the CCW diamond, verbatim
    // integers — boundary inclusive (>= 0)
    "q_geofence" ->
      """WITH p AS (
        |  SELECT c_custkey AS id,
        |    CAST(concat('0x', substr(md5(concat('gx', CAST(c_custkey AS VARCHAR))), 1, 15))
        |         AS BIGINT) % 1000000 AS x,
        |    CAST(concat('0x', substr(md5(concat('gy', CAST(c_custkey AS VARCHAR))), 1, 15))
        |         AS BIGINT) % 1000000 AS y
        |  FROM customer
        |)
        |SELECT id, x, y,
        |  (400000 * (y - 100000) - 400000 * (x - 500000) >= 0 AND
        |   -400000 * (y - 500000) - 400000 * (x - 900000) >= 0 AND
        |   -400000 * (y - 900000) - (-400000) * (x - 500000) >= 0 AND
        |   400000 * (y - 500000) - (-400000) * (x - 100000) >= 0) AS inside
        |FROM p ORDER BY id""".stripMargin,

    // lower median at index ⌊(n−1)/2⌋ over the non-null sorted
    // array, the groupStats convention
    "q_impute" ->
      """WITH v AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 7 = 0 THEN NULL
        |         ELSE CAST(round(value * 100) AS BIGINT) END AS cents
        |  FROM events WHERE value IS NOT NULL
        |), med AS (
        |  SELECT event_type,
        |    sorted[CAST(floor((n - 1) / 2) AS INT) + 1] AS m
        |  FROM (
        |    SELECT event_type, list_sort(list(cents)) AS sorted,
        |      CAST(count(cents) AS BIGINT) AS n
        |    FROM v WHERE cents IS NOT NULL GROUP BY 1)
        |)
        |SELECT v.event_id, v.event_type, v.cents,
        |  COALESCE(v.cents, med.m) AS filled,
        |  (v.cents IS NULL AND med.m IS NOT NULL) AS was_imputed
        |FROM v LEFT JOIN med USING (event_type)
        |ORDER BY v.event_id""".stripMargin,

    // modularity rides the q_labelprop unroll: the partition is the
    // same 3-round replica, then integer intra/mass sums and the
    // mirrored Q_c formula per community
    "q_modularity" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
        |), e AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
        |), l0 AS (
        |  SELECT DISTINCT src AS id, src AS lab FROM e
        |), v1 AS (
        |  SELECT id, lab, count(*) AS c FROM (
        |    SELECT e.dst AS id, l.lab FROM e JOIN l0 l ON l.id = e.src
        |    UNION ALL SELECT id, lab FROM l0
        |  ) GROUP BY 1, 2
        |), l1 AS (
        |  SELECT id, lab FROM (
        |    SELECT id, lab, row_number() OVER (
        |      PARTITION BY id ORDER BY c DESC, lab) AS rn FROM v1
        |  ) WHERE rn = 1
        |), v2 AS (
        |  SELECT id, lab, count(*) AS c FROM (
        |    SELECT e.dst AS id, l.lab FROM e JOIN l1 l ON l.id = e.src
        |    UNION ALL SELECT id, lab FROM l1
        |  ) GROUP BY 1, 2
        |), l2 AS (
        |  SELECT id, lab FROM (
        |    SELECT id, lab, row_number() OVER (
        |      PARTITION BY id ORDER BY c DESC, lab) AS rn FROM v2
        |  ) WHERE rn = 1
        |), v3 AS (
        |  SELECT id, lab, count(*) AS c FROM (
        |    SELECT e.dst AS id, l.lab FROM e JOIN l2 l ON l.id = e.src
        |    UNION ALL SELECT id, lab FROM l2
        |  ) GROUP BY 1, 2
        |), l3 AS (
        |  SELECT id, lab FROM (
        |    SELECT id, lab, row_number() OVER (
        |      PARTITION BY id ORDER BY c DESC, lab) AS rn FROM v3
        |  ) WHERE rn = 1
        |), deg AS (
        |  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
        |), m2t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m2 FROM e
        |), intra AS (
        |  SELECT ls.lab AS lab, CAST(count(*) AS BIGINT) AS intra_edges
        |  FROM e JOIN l3 ls ON ls.id = e.src JOIN l3 ld ON ld.id = e.dst
        |  WHERE ls.lab = ld.lab GROUP BY 1
        |), mass AS (
        |  SELECT l3.lab, CAST(sum(deg.deg) AS BIGINT) AS degree_mass
        |  FROM deg JOIN l3 ON l3.id = deg.id GROUP BY 1
        |)
        |SELECT CAST(mass.lab AS BIGINT) AS lab,
        |  CAST(COALESCE(intra.intra_edges, 0) AS BIGINT) AS intra_edges,
        |  mass.degree_mass,
        |  CAST(round(1e9 * (
        |    CAST(COALESCE(intra.intra_edges, 0) AS DOUBLE) / CAST(m2 AS DOUBLE) -
        |    (CAST(degree_mass AS DOUBLE) / CAST(m2 AS DOUBLE)) *
        |    (CAST(degree_mass AS DOUBLE) / CAST(m2 AS DOUBLE)))) AS BIGINT) AS q_nano
        |FROM mass LEFT JOIN intra USING (lab), m2t
        |ORDER BY lab""".stripMargin,

    // one degree join then pure integer moment sums; the Pearson
    // tree is mirrored: (m·sxy − sx·sy) / sqrt((m·sxx − sx²)(m·syy − sy²))
    "q_assortativity" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
        |), e AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
        |), deg AS (
        |  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
        |), xy AS (
        |  SELECT dx.deg AS x, dy.deg AS y
        |  FROM e JOIN deg dx ON dx.id = e.src JOIN deg dy ON dy.id = e.dst
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m2,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM xy
        |)
        |SELECT m2,
        |  CASE WHEN (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
        |         OR (CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0
        |    THEN NULL
        |    ELSE CAST(round((1e9 * (CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) /
        |      sqrt((CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |           (CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT)
        |  END AS r_nano
        |FROM s""".stripMargin,

    // same discrete ⌊p·(n−1)⌋ index as q_quantiles; clip is pure
    // integer comparisons against bounds that occur in the data
    "q_winsorize" ->
      """WITH v AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |), b AS (
        |  SELECT event_type,
        |    sorted[CAST(floor((n - 1) * 0.05) AS INT) + 1] AS lo,
        |    sorted[CAST(floor((n - 1) * 0.95) AS INT) + 1] AS hi
        |  FROM (
        |    SELECT event_type, list_sort(list(cents)) AS sorted,
        |      CAST(count(*) AS BIGINT) AS n
        |    FROM v GROUP BY 1)
        |)
        |SELECT v.event_id, v.event_type, v.cents,
        |  LEAST(GREATEST(v.cents, b.lo), b.hi) AS clipped,
        |  (v.cents < b.lo OR v.cents > b.hi) AS was_clipped
        |FROM v JOIN b USING (event_type)
        |ORDER BY event_id""".stripMargin,

    // CUSUM replays as a recursive CTE: greatest(0, s + v - target)
    // is pure integer arithmetic, no division anywhere
    "q_cusum" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
        |    row_number() OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ) AS rn
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), r AS (
        |  SELECT user_id, rn, v, GREATEST(0, v - 100) AS s FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.v, GREATEST(0, r.s + e.v - 100)
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT user_id, rn, v, CAST(s AS BIGINT) AS cusum, s > 5000 AS alarm
        |FROM r ORDER BY user_id, rn""".stripMargin,

    // the chunked scan's claim IS "bit-identical to the sequential
    // recurrence" — so its oracle is the sequential recursive CTE,
    // verbatim
    "q_cusum_chunked" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
        |    row_number() OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ) AS rn
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), r AS (
        |  SELECT user_id, rn, v, GREATEST(0, v - 100) AS s FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.v, GREATEST(0, r.s + e.v - 100)
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT user_id, rn, v, CAST(s AS BIGINT) AS cusum, s > 5000 AS alarm
        |FROM r ORDER BY user_id, rn""".stripMargin,

    // the trainer's oracle replays the identical dataflow: algebraic
    // sigmoid (no libm), micro-rounded residuals of bit-identical
    // doubles, exact HUGEINT gradient sums (order-free like the
    // engine's decimal sums), correctly-rounded conversion, same
    // update expression — 3 iterations unrolled; raw-double hash
    "q_logreg" ->
      """WITH e AS (
        |  SELECT CAST(lang = 'en' AS BIGINT) AS y,
        |    length(text) // 100 AS x1,
        |    len(string_split(text, ' ')) // 10 AS x2,
        |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS x3
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        |), cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
        |wa AS (SELECT CAST(0 AS DOUBLE) AS b, CAST(0 AS DOUBLE) AS c1,
        |              CAST(0 AS DOUBLE) AS c2, CAST(0 AS DOUBLE) AS c3),
        |r1 AS (
        |  SELECT y, x1, x2, x3, CAST(round(CAST(1000000.0 AS DOUBLE) *
        |    ((CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE) * (z / (CAST(1.0 AS DOUBLE) + abs(z))))
        |      - CAST(y AS DOUBLE))) AS BIGINT) AS r6
        |  FROM (SELECT e.y, e.x1, e.x2, e.x3,
        |    ((w.b + w.c1 * CAST(e.x1 AS DOUBLE)) + w.c2 * CAST(e.x2 AS DOUBLE))
        |      + w.c3 * CAST(e.x3 AS DOUBLE) AS z FROM e, wa w)
        |), g1 AS (SELECT SUM(r6) AS g0, SUM(r6 * x1) AS gx1,
        |                 SUM(r6 * x2) AS gx2, SUM(r6 * x3) AS gx3 FROM r1),
        |wb AS (SELECT
        |  w.b  - CAST(0.5 AS DOUBLE) * ((CAST(g.g0  AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS b,
        |  w.c1 - CAST(0.5 AS DOUBLE) * ((CAST(g.gx1 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS c1,
        |  w.c2 - CAST(0.5 AS DOUBLE) * ((CAST(g.gx2 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS c2,
        |  w.c3 - CAST(0.5 AS DOUBLE) * ((CAST(g.gx3 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS c3
        |  FROM wa w, g1 g, cnt c),
        |r2 AS (
        |  SELECT y, x1, x2, x3, CAST(round(CAST(1000000.0 AS DOUBLE) *
        |    ((CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE) * (z / (CAST(1.0 AS DOUBLE) + abs(z))))
        |      - CAST(y AS DOUBLE))) AS BIGINT) AS r6
        |  FROM (SELECT e.y, e.x1, e.x2, e.x3,
        |    ((w.b + w.c1 * CAST(e.x1 AS DOUBLE)) + w.c2 * CAST(e.x2 AS DOUBLE))
        |      + w.c3 * CAST(e.x3 AS DOUBLE) AS z FROM e, wb w)
        |), g2 AS (SELECT SUM(r6) AS g0, SUM(r6 * x1) AS gx1,
        |                 SUM(r6 * x2) AS gx2, SUM(r6 * x3) AS gx3 FROM r2),
        |wc AS (SELECT
        |  w.b  - CAST(0.5 AS DOUBLE) * ((CAST(g.g0  AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS b,
        |  w.c1 - CAST(0.5 AS DOUBLE) * ((CAST(g.gx1 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS c1,
        |  w.c2 - CAST(0.5 AS DOUBLE) * ((CAST(g.gx2 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS c2,
        |  w.c3 - CAST(0.5 AS DOUBLE) * ((CAST(g.gx3 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS c3
        |  FROM wb w, g2 g, cnt c),
        |r3 AS (
        |  SELECT y, x1, x2, x3, CAST(round(CAST(1000000.0 AS DOUBLE) *
        |    ((CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE) * (z / (CAST(1.0 AS DOUBLE) + abs(z))))
        |      - CAST(y AS DOUBLE))) AS BIGINT) AS r6
        |  FROM (SELECT e.y, e.x1, e.x2, e.x3,
        |    ((w.b + w.c1 * CAST(e.x1 AS DOUBLE)) + w.c2 * CAST(e.x2 AS DOUBLE))
        |      + w.c3 * CAST(e.x3 AS DOUBLE) AS z FROM e, wc w)
        |), g3 AS (SELECT SUM(r6) AS g0, SUM(r6 * x1) AS gx1,
        |                 SUM(r6 * x2) AS gx2, SUM(r6 * x3) AS gx3 FROM r3),
        |wd AS (SELECT
        |  w.b  - CAST(0.5 AS DOUBLE) * ((CAST(g.g0  AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS b,
        |  w.c1 - CAST(0.5 AS DOUBLE) * ((CAST(g.gx1 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS c1,
        |  w.c2 - CAST(0.5 AS DOUBLE) * ((CAST(g.gx2 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS c2,
        |  w.c3 - CAST(0.5 AS DOUBLE) * ((CAST(g.gx3 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) / c.n) AS c3
        |  FROM wc w, g3 g, cnt c)
        |SELECT 'intercept' AS term, b AS weight FROM wd
        |UNION ALL SELECT 'x1' AS term, c1 AS weight FROM wd
        |UNION ALL SELECT 'x2' AS term, c2 AS weight FROM wd
        |UNION ALL SELECT 'x3' AS term, c3 AS weight FROM wd
        |ORDER BY term""".stripMargin,

    // the MI expression tree mirrors the operator token for token:
    // (c/N)·ln(c·N/(nx·ny)) in doubles over exact integer counts,
    // nano-rounded per cell
    "q_mutual_info" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_xy
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2
        |), nx AS (
        |  SELECT lang, CAST(sum(n_xy) AS BIGINT) AS nx FROM cells GROUP BY 1
        |), ny AS (
        |  SELECT source, CAST(sum(n_xy) AS BIGINT) AS ny FROM cells GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells
        |)
        |SELECT cells.lang, cells.source, n_xy,
        |  CAST(round(1e9 * (CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln((CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)) /
        |       (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))) AS BIGINT) AS mi_nano
        |FROM cells JOIN nx USING (lang) JOIN ny USING (source), t
        |ORDER BY 1, 2""".stripMargin,

    // the ±1 planes rebuild from the md5 hash-parity formula; each
    // projected coordinate is an exact integer dot
    "q_random_proj" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), planes AS (
        |  SELECT j, list_transform(range(0, 64), i ->
        |    CASE WHEN CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', CAST(i AS VARCHAR))), 1, 15)) AS BIGINT) % 2 = 1
        |      THEN 1 ELSE -1 END) AS s
        |  FROM range(0, 8) t(j)
        |), dots AS (
        |  SELECT q.vec_id, CAST(p.j AS BIGINT) AS j,
        |    CAST(list_sum(list_transform(range(1, len(q.v) + 1),
        |      ix -> q.v[ix] * p.s[ix])) AS BIGINT) AS d
        |  FROM q, planes p
        |)
        |SELECT vec_id, j, d FROM dots ORDER BY vec_id, j""".stripMargin,

    // the grid construction replays on the q_countmin md5-hash
    // formula; est = min over rows of the cell-wise dot, exact =
    // sum of squared key frequencies
    "q_cm_joinsize" ->
      """WITH rows4 AS (
        |  SELECT unnest(range(0, 4)) AS r
        |), cells AS (
        |  SELECT r,
        |    CAST(concat('0x', substr(md5(concat(CAST(r AS VARCHAR), ':', CAST(l_partkey AS VARCHAR))), 1, 15)) AS BIGINT) % 4096 AS c,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem, rows4
        |  WHERE l_partkey IS NOT NULL
        |  GROUP BY 1, 2
        |), dots AS (
        |  SELECT r, sum(cnt * cnt) AS dot FROM cells GROUP BY r
        |), est AS (
        |  SELECT CAST(min(dot) AS BIGINT) AS join_size_est FROM dots
        |), ex AS (
        |  SELECT CAST(sum(f * f) AS BIGINT) AS exact_size FROM (
        |    SELECT count(*) AS f FROM lineitem GROUP BY l_partkey)
        |)
        |SELECT est.join_size_est, ex.exact_size FROM est, ex""".stripMargin,

    // each HITS half-step: gather-sum, then the integer rescale
    // x // GREATEST(1, (max+1e9-1)//1e9) as a scalar subquery —
    // DuckDB floor division on non-negative longs ≡ Spark `div`
    "q_hits" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
        |), n AS (
        |  SELECT src AS id FROM ed UNION SELECT dst FROM ed
        |), h0 AS (
        |  SELECT id, CAST(1 AS BIGINT) AS hub FROM n
        |), a1r AS (
        |  SELECT n.id, COALESCE(s.s, 0) AS auth FROM n LEFT JOIN (
        |    SELECT e.dst AS id, CAST(sum(h.hub) AS BIGINT) AS s
        |    FROM ed e JOIN h0 h ON h.id = e.src GROUP BY 1) s ON s.id = n.id
        |), a1 AS (
        |  SELECT id, auth // GREATEST(1, ((SELECT max(auth) FROM a1r) + 999999999) // 1000000000) AS auth
        |  FROM a1r
        |), h1r AS (
        |  SELECT n.id, COALESCE(s.s, 0) AS hub FROM n LEFT JOIN (
        |    SELECT e.src AS id, CAST(sum(a.auth) AS BIGINT) AS s
        |    FROM ed e JOIN a1 a ON a.id = e.dst GROUP BY 1) s ON s.id = n.id
        |), h1 AS (
        |  SELECT id, hub // GREATEST(1, ((SELECT max(hub) FROM h1r) + 999999999) // 1000000000) AS hub
        |  FROM h1r
        |), a2r AS (
        |  SELECT n.id, COALESCE(s.s, 0) AS auth FROM n LEFT JOIN (
        |    SELECT e.dst AS id, CAST(sum(h.hub) AS BIGINT) AS s
        |    FROM ed e JOIN h1 h ON h.id = e.src GROUP BY 1) s ON s.id = n.id
        |), a2 AS (
        |  SELECT id, auth // GREATEST(1, ((SELECT max(auth) FROM a2r) + 999999999) // 1000000000) AS auth
        |  FROM a2r
        |), h2r AS (
        |  SELECT n.id, COALESCE(s.s, 0) AS hub FROM n LEFT JOIN (
        |    SELECT e.src AS id, CAST(sum(a.auth) AS BIGINT) AS s
        |    FROM ed e JOIN a2 a ON a.id = e.dst GROUP BY 1) s ON s.id = n.id
        |), h2 AS (
        |  SELECT id, hub // GREATEST(1, ((SELECT max(hub) FROM h2r) + 999999999) // 1000000000) AS hub
        |  FROM h2r
        |)
        |SELECT CAST(h2.id AS BIGINT) AS id, CAST(h2.hub AS BIGINT) AS hub,
        |  CAST(a2.auth AS BIGINT) AS auth
        |FROM h2 JOIN a2 ON a2.id = h2.id
        |ORDER BY id""".stripMargin,

    // both engines implement the classic unit-cost Wagner-Fischer
    // levenshtein; min over the (distance, key) pair is the same
    // struct arg-min total order
    "q_levenshtein" ->
      """WITH dirty AS (
        |  SELECT p_partkey AS dirty_id, replace(p_name, 'e', '') AS dirty_name,
        |    regexp_replace(lower(trim(replace(p_name, 'e', ''))), '[aeiou ]', '', 'g') AS blk
        |  FROM part WHERE p_partkey % 11 = 0
        |), cat AS (
        |  SELECT p_partkey, p_name,
        |    regexp_replace(lower(trim(p_name)), '[aeiou ]', '', 'g') AS blk
        |  FROM part
        |), scored AS (
        |  SELECT d.dirty_id,
        |    CAST(levenshtein(d.dirty_name, c.p_name) AS BIGINT) AS dist,
        |    c.p_partkey
        |  FROM dirty d JOIN cat c ON d.blk = c.blk
        |), ranked AS (
        |  SELECT dirty_id, dist, p_partkey AS match_key, row_number() OVER (
        |    PARTITION BY dirty_id ORDER BY dist, p_partkey) AS rn
        |  FROM scored
        |)
        |SELECT dirty_id, dist, match_key FROM ranked WHERE rn = 1
        |ORDER BY dirty_id""".stripMargin,

    // strip_accents/nfc_normalize are DuckDB's native pair; both
    // engines canonically decompose, drop combining marks (fold) or
    // recompose (nfc), and md5 the identical UTF-8 bytes
    "q_normalize" ->
      """SELECT doc_id,
        |  md5(strip_accents(translate(text, 'aeiou', 'àéîøü'))) AS fold_md5,
        |  CAST(length(strip_accents(translate(text, 'aeiou', 'àéîøü'))) AS BIGINT) AS fold_len,
        |  md5(nfc_normalize(substr(text, 1, 40) || 'e' || chr(769))) AS nfc_md5
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // synchronous LPA unrolls: each round is a vote count plus the
    // (count DESC, label ASC) pick — row_number is the SQL spelling
    // of the operator's struct arg-min, both total orders
    "q_labelprop" ->
      """WITH ed AS (
        |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
        |), e AS (
        |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
        |), l0 AS (
        |  SELECT DISTINCT src AS id, src AS lab FROM e
        |), v1 AS (
        |  SELECT id, lab, count(*) AS c FROM (
        |    SELECT e.dst AS id, l.lab FROM e JOIN l0 l ON l.id = e.src
        |    UNION ALL SELECT id, lab FROM l0
        |  ) GROUP BY 1, 2
        |), l1 AS (
        |  SELECT id, lab FROM (
        |    SELECT id, lab, row_number() OVER (
        |      PARTITION BY id ORDER BY c DESC, lab) AS rn FROM v1
        |  ) WHERE rn = 1
        |), v2 AS (
        |  SELECT id, lab, count(*) AS c FROM (
        |    SELECT e.dst AS id, l.lab FROM e JOIN l1 l ON l.id = e.src
        |    UNION ALL SELECT id, lab FROM l1
        |  ) GROUP BY 1, 2
        |), l2 AS (
        |  SELECT id, lab FROM (
        |    SELECT id, lab, row_number() OVER (
        |      PARTITION BY id ORDER BY c DESC, lab) AS rn FROM v2
        |  ) WHERE rn = 1
        |), v3 AS (
        |  SELECT id, lab, count(*) AS c FROM (
        |    SELECT e.dst AS id, l.lab FROM e JOIN l2 l ON l.id = e.src
        |    UNION ALL SELECT id, lab FROM l2
        |  ) GROUP BY 1, 2
        |), l3 AS (
        |  SELECT id, lab FROM (
        |    SELECT id, lab, row_number() OVER (
        |      PARTITION BY id ORDER BY c DESC, lab) AS rn FROM v3
        |  ) WHERE rn = 1
        |)
        |SELECT CAST(id AS BIGINT) AS id, CAST(lab AS BIGINT) AS lab
        |FROM l3 ORDER BY id""".stripMargin,

    // the EWMA recurrence replays as a recursive CTE: DuckDB's `//`
    // on non-negative longs is the same floor division as Spark's
    // arithmetic shift, so every intermediate level matches exactly
    "q_ewma" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
        |    row_number() OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ) AS rn
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), r AS (
        |  SELECT user_id, rn, v, v AS s FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.v, (e.v + r.s) // 2
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT user_id, rn, v, s AS ewma FROM r
        |ORDER BY user_id, rn""".stripMargin,

    // the chunked-scan oracle replays the ENGINE's dataflow, not the
    // sequential recurrence: same within-bucket affine recurrences
    // (A_j = A*0.5; B_j = 0.5*v + 0.5*B; Bp seeds s_1 = v_1), same
    // bucket-carry recursion, same final A*s_in + B — every double
    // is the same IEEE round-to-nearest mul/add sequence, so the
    // hash compare is exact on raw doubles
    "q_ewma_chunked" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS b,
        |    row_number() OVER (
        |      PARTITION BY user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS j
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), w AS (
        |  SELECT user_id, b, j, v, CAST(0.5 AS DOUBLE) AS a,
        |    0.5 * CAST(v AS DOUBLE) AS bz, CAST(v AS DOUBLE) AS bp
        |  FROM e WHERE j = 1
        |  UNION ALL
        |  SELECT e.user_id, e.b, e.j, e.v, w.a * 0.5,
        |    0.5 * CAST(e.v AS DOUBLE) + 0.5 * w.bz,
        |    0.5 * CAST(e.v AS DOUBLE) + 0.5 * w.bp
        |  FROM w JOIN e ON e.user_id = w.user_id AND e.b = w.b AND e.j = w.j + 1
        |), s AS (
        |  SELECT user_id, b, a, bz, bp, j AS cnt
        |  FROM w QUALIFY j = max(j) OVER (PARTITION BY user_id, b)
        |), s2 AS (
        |  SELECT user_id, b, a, bz, bp, cnt,
        |    row_number() OVER (PARTITION BY user_id ORDER BY b) AS ci,
        |    sum(cnt) OVER (PARTITION BY user_id ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
        |  FROM s
        |), c AS (
        |  SELECT user_id, b, ci, CAST(NULL AS DOUBLE) AS s_in, bp AS s_out,
        |    CAST(0 AS BIGINT) AS off
        |  FROM s2 WHERE ci = 1
        |  UNION ALL
        |  SELECT s2.user_id, s2.b, s2.ci, c.s_out AS s_in,
        |    s2.a * c.s_out + s2.bz AS s_out, CAST(s2.off AS BIGINT)
        |  FROM c JOIN s2 ON s2.user_id = c.user_id AND s2.ci = c.ci + 1
        |)
        |SELECT w.user_id, CAST(c.off + w.j AS BIGINT) AS rn, w.v,
        |  CASE WHEN c.s_in IS NULL THEN w.bp
        |       ELSE w.a * c.s_in + w.bz END AS ewma
        |FROM w JOIN c ON w.user_id = c.user_id AND w.b = c.b
        |ORDER BY w.user_id, rn""".stripMargin,

    // skyline replays as the textbook sort-scan: per-x max, then a
    // suffix max over larger x; survive iff y strictly beats it.
    "q_skyline" ->
      """WITH pts AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |         CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |), m AS (
        |  SELECT price_cents, max(qty) AS qty FROM pts GROUP BY price_cents
        |), r AS (
        |  SELECT price_cents, qty, max(qty) OVER (
        |    ORDER BY price_cents DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sm
        |  FROM m
        |)
        |SELECT price_cents, qty FROM r
        |WHERE sm IS NULL OR qty > sm
        |ORDER BY price_cents""".stripMargin,

    // first-touch funnel replays as chained min() CTEs: t1 = first
    // signup, t2 = first view strictly after t1 within 7 days of t1,
    // t3 = first purchase strictly after t2 within the same window.
    // All comparisons on exact integer microseconds.
    "q_funnel_steps" ->
      """WITH s1 AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        |  FROM events WHERE user_id IS NOT NULL AND event_type = 'signup'
        |  GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, s1.t1, min(CAST(e.ts AS TIMESTAMP)) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) > s1.t1
        |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) <= epoch_us(s1.t1) + 604800000000
        |  GROUP BY e.user_id, s1.t1
        |), s3 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
        |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) <= epoch_us(s2.t1) + 604800000000
        |  GROUP BY e.user_id
        |)
        |SELECT 1 AS step, 'signup' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM s1
        |UNION ALL
        |SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
        |ORDER BY step""".stripMargin,

    // ntile over the full order is the semantic; the operator
    // computes it without the single-task window. min/max of double
    // are comparisons, not arithmetic — bit-exact both engines.
    "q_histogram_eqdepth" ->
      """SELECT tile, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(value) AS lo, max(value) AS hi
        |FROM (
        |  SELECT value,
        |    CAST(ntile(20) OVER (ORDER BY value, event_id) AS INT) AS tile
        |  FROM events WHERE value IS NOT NULL
        |)
        |GROUP BY tile
        |ORDER BY tile""".stripMargin,

    // dense ids are the plain row_number the operator avoids; the
    // draw is hash60('0:rid:j') mod N, replicated literally.
    "q_negatives" ->
      s"""WITH ids AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rid
         |  FROM documents
         |), n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
         |drawn AS (
         |  SELECT i.doc_id AS anchor_id, t.j, i.rid,
         |    1 + (${duckHash60.format(
                  "concat('0:', CAST(i.rid AS VARCHAR), ':', CAST(t.j AS VARCHAR))")}
         |         % n.total) AS neg_rid
         |  FROM ids i CROSS JOIN n CROSS JOIN generate_series(1, 3) AS t(j)
         |)
         |SELECT d.anchor_id, CAST(d.j AS INT) AS j, i2.doc_id AS neg_id
         |FROM drawn d JOIN ids i2 ON i2.rid = d.neg_rid
         |WHERE d.neg_rid <> d.rid
         |ORDER BY anchor_id, j""".stripMargin,

    // division, sqrt, ×2^20, floor — each correctly rounded or exact
    // under IEEE-754, so both engines compute identical cutoffs.
    "q_temp_mix" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1
        |), cut AS (
        |  SELECT lang,
        |    CASE WHEN n = min(n) OVER () THEN 1048576
        |         ELSE CAST(floor(1048576.0 *
        |           sqrt(CAST(min(n) OVER () AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)
        |    END AS cutoff
        |  FROM c
        |)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN cut USING (lang)
        |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 1048576 < cutoff
        |ORDER BY d.doc_id""".stripMargin,

    // replace() (DuckDB) ≡ literal-pattern regexp_replace (Spark);
    // the block key is the consonant skeleton — DuckDB needs the
    // explicit 'g' flag to match Spark's replace-all regexp_replace;
    // levenshtein has identical unit-edit semantics in both engines.
    "q_fuzzy_match" ->
      """WITH dirty AS (
        |  SELECT p_partkey AS dirty_id, replace(p_name, 'e', '') AS dirty_name
        |  FROM part WHERE p_partkey % 7 = 0
        |)
        |SELECT d.dirty_id, c.p_partkey, d.dirty_name, c.p_name,
        |  CAST(levenshtein(d.dirty_name, c.p_name) AS INT) AS dist
        |FROM dirty d JOIN part c
        |  ON regexp_replace(lower(trim(d.dirty_name)), '[aeiou ]', '', 'g')
        |   = regexp_replace(lower(trim(c.p_name)), '[aeiou ]', '', 'g')
        |WHERE abs(len(d.dirty_name) - len(c.p_name)) <= 2
        |  AND levenshtein(d.dirty_name, c.p_name) <= 2
        |ORDER BY d.dirty_id, c.p_partkey""".stripMargin,

    // island detection: a row opens an island iff its start exceeds
    // the running max end; "end" is reserved in DuckDB -> quoted.
    "q_intervals" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS s_ts,
        |    CAST(ts AS TIMESTAMP) + to_seconds(event_id % 300 + 60) AS e_ts
        |  FROM events WHERE user_id IS NOT NULL
        |), g AS (
        |  SELECT user_id, s_ts, e_ts,
        |    CASE WHEN max(e_ts) OVER w IS NULL OR s_ts > max(e_ts) OVER w
        |         THEN 1 ELSE 0 END AS opens
        |  FROM iv
        |  WINDOW w AS (PARTITION BY user_id ORDER BY s_ts, e_ts
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |), i AS (
        |  SELECT user_id, s_ts, e_ts,
        |    sum(opens) OVER (PARTITION BY user_id ORDER BY s_ts, e_ts
        |                     ROWS UNBOUNDED PRECEDING) AS island
        |  FROM g
        |)
        |SELECT user_id, min(s_ts) AS start, max(e_ts) AS "end",
        |  CAST(count(*) AS BIGINT) AS n_merged
        |FROM i GROUP BY user_id, island
        |ORDER BY user_id, start""".stripMargin,

    "q_snapshot_diff" ->
      """WITH olds AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |), news AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'ESC-' || o_orderpriority
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 89 <> 0
        |), d AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |           OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
        |           THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    o.o_orderstatus AS o_orderstatus_old,
        |    n.o_orderstatus AS o_orderstatus_new,
        |    o.o_orderpriority AS o_orderpriority_old,
        |    n.o_orderpriority AS o_orderpriority_new
        |  FROM olds o FULL OUTER JOIN news n ON o.o_orderkey = n.o_orderkey
        |)
        |SELECT * FROM d WHERE status <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin
  )

  private def gopherOracles: Map[String, String] = Map(
    // Same derived line structure (regexes are Java/RE2-common), then
    // dup fractions as 1 − distinct/total and char-weighted twins.
    "q_gopher_repetition" ->
      """WITH lined AS (
        |  SELECT doc_id, regexp_replace(
        |    regexp_replace(text, '(\S+ \S+) ', '\1' || chr(10), 'g'),
        |    '(([^' || chr(10) || ']*' || chr(10) || '){3}[^' || chr(10) || ']*)' || chr(10),
        |    '\1' || chr(10) || chr(10), 'g') AS t2
        |  FROM documents
        |), u AS (
        |  SELECT doc_id,
        |    list_filter(string_split(t2, chr(10)), x -> len(x) > 0) AS ls,
        |    list_filter(string_split(t2, chr(10) || chr(10)), x -> len(x) > 0) AS ps
        |  FROM lined
        |)
        |SELECT doc_id,
        |  CASE WHEN len(ls) > 0 THEN 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / CAST(len(ls) AS DOUBLE) ELSE 0.0 END AS dup_line_frac,
        |  CASE WHEN coalesce(list_sum(list_transform(ls, x -> len(x))), 0) > 0 THEN
        |    CAST(list_sum(list_transform(ls, x -> len(x))) - list_sum(list_transform(list_distinct(ls), x -> len(x))) AS DOUBLE)
        |      / CAST(list_sum(list_transform(ls, x -> len(x))) AS DOUBLE) ELSE 0.0 END AS dup_line_char_frac,
        |  CASE WHEN len(ps) > 0 THEN 1.0 - CAST(len(list_distinct(ps)) AS DOUBLE) / CAST(len(ps) AS DOUBLE) ELSE 0.0 END AS dup_para_frac,
        |  CASE WHEN coalesce(list_sum(list_transform(ps, x -> len(x))), 0) > 0 THEN
        |    CAST(list_sum(list_transform(ps, x -> len(x))) - list_sum(list_transform(list_distinct(ps), x -> len(x))) AS DOUBLE)
        |      / CAST(list_sum(list_transform(ps, x -> len(x))) AS DOUBLE) ELSE 0.0 END AS dup_para_char_frac
        |FROM u ORDER BY doc_id""".stripMargin,
    // Top bigram by (count, token chars, lexicographic) — the same
    // deterministic argmax ranking as the Spark window.
    "q_gopher_topgram" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, ' +'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, ts[i.i] || ' ' || ts[i.i+1] AS gram
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts)-1)) AS i) i
        |  WHERE len(ts) >= 2
        |), c AS (
        |  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2
        |), r AS (
        |  SELECT doc_id, gram, cnt,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, len(gram) - 1 DESC, gram ASC) AS rn
        |  FROM c
        |), tot AS (
        |  SELECT doc_id, list_sum(list_transform(ts, x -> len(x))) AS tc FROM tok
        |)
        |SELECT d.doc_id,
        |  coalesce(t.gram, '') AS top_gram,
        |  CASE WHEN tot.tc > 0 AND t.cnt IS NOT NULL
        |    THEN CAST(t.cnt * (len(t.gram) - 1) AS DOUBLE) / CAST(tot.tc AS DOUBLE) ELSE 0.0 END AS top_gram_char_frac
        |FROM documents d
        |JOIN tot USING (doc_id)
        |LEFT JOIN (SELECT * FROM r WHERE rn = 1) t USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // Duplicated trigrams back to their start positions, exploded to
    // covered token positions, UNIONED (DISTINCT), then char-summed.
    "q_gopher_dupgram" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, ' +'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), tr AS (
        |  SELECT doc_id, i.i - 1 AS pos, ts[i.i] AS t
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) i
        |), g AS (
        |  SELECT doc_id, i.i - 1 AS gpos, ts[i.i] || ' ' || ts[i.i+1] || ' ' || ts[i.i+2] AS gram
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) i
        |  WHERE len(ts) >= 3
        |), dup AS (
        |  SELECT doc_id, gram FROM g GROUP BY 1, 2 HAVING count(*) >= 2
        |), cov AS (
        |  SELECT DISTINCT g.doc_id, g.gpos + o.o AS pos
        |  FROM g JOIN dup USING (doc_id, gram),
        |       LATERAL (SELECT unnest(generate_series(0, 2)) AS o) o
        |), cc AS (
        |  SELECT cov.doc_id, sum(len(tr.t)) AS dc
        |  FROM cov JOIN tr USING (doc_id, pos) GROUP BY 1
        |), tot AS (
        |  SELECT doc_id, sum(len(t)) AS tc FROM tr GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  CASE WHEN tot.tc > 0 THEN CAST(coalesce(cc.dc, 0) AS DOUBLE) / CAST(tot.tc AS DOUBLE) ELSE 0.0 END AS dup_ngram_char_frac
        |FROM documents d
        |LEFT JOIN tot USING (doc_id)
        |LEFT JOIN cc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // Rule battery: metrics in exact integers, one IEEE division per
    // fraction, thresholds compared on identical doubles.
    "q_gopher_rules" ->
      """WITH tok AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, ' +'), x -> len(x) > 0) AS ts,
        |    list_filter(string_split_regex(lower(text), ' +'), x -> len(x) > 0) AS lts,
        |    list_filter(string_split(text, chr(10)), x -> len(x) > 0) AS ls
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    len(ts) AS nw,
        |    coalesce(list_sum(list_transform(ts, x -> len(x))), 0) AS tc,
        |    len(text) - len(replace(text, '#', '')) AS nhash,
        |    len(text) - len(replace(text, '…', '')) AS nuell,
        |    (len(replace(text, '…', '')) - len(replace(replace(text, '…', ''), '...', ''))) // 3 AS naell,
        |    len(ls) AS nl,
        |    len(list_filter(ls, x -> starts_with(trim(x), '-') OR starts_with(trim(x), '*') OR starts_with(trim(x), '•'))) AS nbul,
        |    len(list_filter(ls, x -> ends_with(trim(x), '...') OR ends_with(trim(x), '…'))) AS nell,
        |    len(list_filter(ts, x -> regexp_matches(x, '[A-Za-z]'))) AS nalpha,
        |    len(list_filter(['the', 'a', 'data', 'value', 'table'], s -> list_contains(lts, s))) AS nstop
        |  FROM tok
        |), v AS (
        |  SELECT doc_id, nw, nstop,
        |    CASE WHEN nw > 0 THEN CAST(tc AS DOUBLE) / CAST(nw AS DOUBLE) ELSE 0.0 END AS mean_word_len,
        |    CASE WHEN nw > 0 THEN CAST(nhash + nuell + naell AS DOUBLE) / CAST(nw AS DOUBLE) ELSE 0.0 END AS symbol_ratio,
        |    CASE WHEN nl > 0 THEN CAST(nbul AS DOUBLE) / CAST(nl AS DOUBLE) ELSE 0.0 END AS bullet_frac,
        |    CASE WHEN nl > 0 THEN CAST(nell AS DOUBLE) / CAST(nl AS DOUBLE) ELSE 0.0 END AS ellipsis_frac,
        |    CASE WHEN nw > 0 THEN CAST(nalpha AS DOUBLE) / CAST(nw AS DOUBLE) ELSE 0.0 END AS alpha_frac
        |  FROM m
        |)
        |SELECT doc_id, CAST(nw AS INT) AS n_words, mean_word_len, symbol_ratio,
        |  bullet_frac, ellipsis_frac, alpha_frac, CAST(nstop AS INT) AS n_stop,
        |  (nw >= 20 AND nw <= 100000) AS r_word_count,
        |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r_word_len,
        |  (symbol_ratio <= 0.1) AS r_symbol,
        |  (bullet_frac <= 0.9) AS r_bullet,
        |  (ellipsis_frac <= 0.3) AS r_ellipsis,
        |  (alpha_frac >= 0.8) AS r_alpha,
        |  (nstop >= 2) AS r_stop,
        |  (nw >= 20 AND nw <= 100000 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
        |    AND alpha_frac >= 0.8 AND nstop >= 2) AS pass
        |FROM v ORDER BY doc_id""".stripMargin,
    // Expectations restated: one violation count per row check (NULL
    // predicate = violation), sum(n-1) per uniqueness keyset.
    "q_expectations" ->
      """WITH rows_out AS (
        |  SELECT 'event_id_nonnull' AS "check",
        |    CAST(count(*) FILTER (WHERE NOT coalesce(event_id IS NOT NULL, false)) AS BIGINT) AS violations,
        |    CAST(count(*) AS BIGINT) AS total FROM events
        |  UNION ALL
        |  SELECT 'type_known',
        |    CAST(count(*) FILTER (WHERE NOT coalesce(event_type IN ('click', 'view', 'purchase', 'error'), false)) AS BIGINT),
        |    CAST(count(*) AS BIGINT) FROM events
        |  UNION ALL
        |  SELECT 'value_in_range',
        |    CAST(count(*) FILTER (WHERE NOT coalesce(value >= 0.0 AND value < 50.0, false)) AS BIGINT),
        |    CAST(count(*) AS BIGINT) FROM events
        |  UNION ALL
        |  SELECT 'event_id_unique', CAST(coalesce(sum(n - 1), 0) AS BIGINT),
        |    CAST(coalesce(sum(n), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS n FROM events GROUP BY event_id)
        |  UNION ALL
        |  SELECT 'user_type_unique', CAST(coalesce(sum(n - 1), 0) AS BIGINT),
        |    CAST(coalesce(sum(n), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS n FROM events GROUP BY user_id, event_type)
        |)
        |SELECT "check", violations, total, violations = 0 AS passed
        |FROM rows_out ORDER BY "check"""".stripMargin,
    // SCD2 restated: latest-per-user windows on both sides of the
    // cutoff; changed keys emit (closed old, open new), unchanged emit
    // the open row, new keys emit one open row.
    "q_scd2" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type FROM events WHERE user_id IS NOT NULL
        |), snap AS (
        |  SELECT user_id, event_type AS tier, ts AS valid_from
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM ev WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
        |  WHERE rn = 1
        |), upd AS (
        |  SELECT user_id, event_type AS tier, ts
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM ev WHERE ts >= TIMESTAMP '2024-01-15 00:00:00')
        |  WHERE rn = 1
        |), existing AS (
        |  SELECT s.user_id, s.tier, s.valid_from,
        |    CASE WHEN u.user_id IS NOT NULL AND u.tier IS DISTINCT FROM s.tier THEN u.ts END AS valid_to,
        |    NOT (u.user_id IS NOT NULL AND u.tier IS DISTINCT FROM s.tier) AS is_current
        |  FROM snap s LEFT JOIN upd u USING (user_id)
        |), reopened AS (
        |  SELECT u.user_id, u.tier, u.ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to,
        |    true AS is_current
        |  FROM upd u LEFT JOIN snap s USING (user_id)
        |  WHERE s.user_id IS NULL OR u.tier IS DISTINCT FROM s.tier
        |)
        |SELECT * FROM existing UNION ALL SELECT * FROM reopened
        |ORDER BY user_id, valid_from""".stripMargin,
    // Point-in-time join restated as the interval BETWEEN join the
    // as-of plan avoids: at most one dim version contains each fact
    // ts (intervals tile), so the LEFT JOIN is row-preserving.
    "q_scd2_pit" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type FROM events WHERE user_id IS NOT NULL
        |), snap AS (
        |  SELECT user_id, event_type AS tier, ts AS valid_from
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM ev WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
        |  WHERE rn = 1
        |), upd AS (
        |  SELECT user_id, event_type AS tier, ts
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM ev WHERE ts >= TIMESTAMP '2024-01-15 00:00:00')
        |  WHERE rn = 1
        |), existing AS (
        |  SELECT s.user_id, s.tier, s.valid_from,
        |    CASE WHEN u.user_id IS NOT NULL AND u.tier IS DISTINCT FROM s.tier THEN u.ts END AS valid_to
        |  FROM snap s LEFT JOIN upd u USING (user_id)
        |), reopened AS (
        |  SELECT u.user_id, u.tier, u.ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM upd u LEFT JOIN snap s USING (user_id)
        |  WHERE s.user_id IS NULL OR u.tier IS DISTINCT FROM s.tier
        |), dim AS (
        |  SELECT * FROM existing UNION ALL SELECT * FROM reopened
        |)
        |SELECT f.event_id, f.user_id, f.ts, d.tier
        |FROM ev f LEFT JOIN dim d
        |  ON d.user_id = f.user_id
        |  AND d.valid_from <= f.ts
        |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
        |ORDER BY f.event_id""".stripMargin,

    // BPE pair counts rebuilt from the same word-frequency dict and
    // 1-char-symbols + </w> model; total order (cnt, a, b) makes the
    // top-100 cutoff deterministic in both engines.
    "q_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(text, ' +')) AS word FROM documents
        |), f AS (
        |  SELECT word, count(*) AS freq FROM w WHERE len(word) > 0 GROUP BY 1
        |  ORDER BY freq DESC, word ASC LIMIT 1000000
        |), s AS (
        |  SELECT word, freq,
        |    list_append(list_transform(generate_series(1, len(word)), i -> word[i:i]), '</w>') AS sym
        |  FROM f
        |), p AS (
        |  SELECT sym[i.i] AS a, sym[i.i+1] AS b, freq
        |  FROM s, LATERAL (SELECT unnest(generate_series(1, len(sym)-1)) AS i) i
        |)
        |SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM p GROUP BY 1, 2
        |ORDER BY cnt DESC, a ASC, b ASC
        |LIMIT 100""".stripMargin,
    // The bloom is a pure pre-filter (no false negatives, false
    // positives re-checked) — plain anti-join semantics.
    "q_bloom_anti" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem l
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  private def temporalOracles: Map[String, String] = Map(
    // The as-of semantics restated as a correlated LATERAL top-1:
    // most recent click at-or-before each purchase, ties broken by
    // the largest click_id — exactly asOfJoin's (ts, tieBreak) order.
    "q_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS click_id,
        |         CAST(round(value*100) AS BIGINT) AS click_cents
        |  FROM events WHERE user_id IS NOT NULL AND event_type = 'click'
        |)
        |SELECT p.event_id, p.user_id, x.click_id, x.click_cents
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.click_id, c.click_cents FROM c
        |  WHERE c.user_id = p.user_id AND c.ts <= p.ts
        |  ORDER BY c.ts DESC, c.click_id DESC LIMIT 1
        |) x ON true""".stripMargin,

    "q_range_join" ->
      """WITH iv AS (
        |  SELECT o_orderkey,
        |         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS start_day
        |  FROM orders WHERE o_orderkey % 200 = 0
        |), pts AS (
        |  SELECT l_quantity,
        |         date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS ship_day
        |  FROM lineitem WHERE l_discount > 0.08
        |)
        |SELECT iv.o_orderkey, count(*) AS n_matches, sum(l_quantity) AS sum_qty
        |FROM iv JOIN pts
        |  ON pts.ship_day >= iv.start_day AND pts.ship_day < iv.start_day + 5
        |GROUP BY 1""".stripMargin,

    // Same md5 bucket on both sides (graft_hash60 ≡ first 15 md5 hex
    // chars as a non-negative int), same cut-points.
    "q_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'valid'
        |            ELSE 'test' END AS split,
        |       lang, count(*) AS n_docs,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM b GROUP BY 1, 2""".stripMargin,

    "q_full_outer" ->
      """WITH c AS (
        |  SELECT c_custkey AS custkey, c_name FROM customer WHERE c_custkey < 200
        |), o AS (
        |  SELECT o_custkey AS custkey, count(*) AS n_big_orders
        |  FROM orders WHERE o_totalprice > 400000 GROUP BY 1
        |)
        |SELECT coalesce(c.custkey, o.custkey) AS custkey, c_name, n_big_orders
        |FROM c FULL OUTER JOIN o ON c.custkey = o.custkey""".stripMargin,

    // percent_rank = (rank-1)/(n-1) and cume_dist = k/n are exact
    // integer ratios — the single IEEE division matches across engines
    "q_window_ranks" ->
      """SELECT event_id, user_id, value,
        |  ntile(4)       OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist()    OVER w AS cume,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank
        |FROM events WHERE user_id IS NOT NULL AND user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY value ASC NULLS FIRST, event_id ASC)""".stripMargin,

    "q_clean_kit" ->
      """SELECT doc_id,
        |  lower(substr(text, 1, 40)) AS head_lower,
        |  upper(lang) AS lang_upper,
        |  trim(substr(text, 1, 20)) AS head_trim,
        |  regexp_replace(substr(text, 1, 60), '[aeiou]', '_', 'g') AS devoweled,
        |  translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
        |  nullif(lang, 'en') AS lang_nullif,
        |  coalesce(nullif(lang, 'en'), 'english') AS lang_coalesced,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents""".stripMargin,

    // DuckDB sum(BIGINT) over a window is HUGEINT — cast back before
    // the integer div/mod so pandas doesn't degrade it to float64.
    "q_pack_budget" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tok,
        |         CAST(coalesce(sum(n_tok) OVER (
        |           PARTITION BY lang ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
        |  FROM d
        |)
        |SELECT doc_id, lang, n_tok,
        |       cumb // 2048 AS bin, cumb % 2048 AS bin_offset
        |FROM c""".stripMargin,

    "q_strat_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_docs,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM b
        |WHERE bucket < (CASE lang WHEN 'en' THEN 30 WHEN 'de' THEN 100 ELSE 60 END)
        |GROUP BY 1""".stripMargin,

    // Exact KS: same histogram → cumulative → cross-multiplied max.
    "q_ks_drift" ->
      """WITH av AS (
        |  SELECT CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |), bv AS (
        |  SELECT CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-15 00:00:00'
        |), h AS (
        |  SELECT v, CAST(sum(na) AS BIGINT) AS nav, CAST(sum(nb) AS BIGINT) AS nbv
        |  FROM (SELECT v, 1 AS na, 0 AS nb FROM av
        |        UNION ALL SELECT v, 0, 1 FROM bv)
        |  GROUP BY v
        |), c AS (
        |  SELECT v,
        |    CAST(sum(nav) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
        |    CAST(sum(nbv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
        |  FROM h
        |), t AS (
        |  SELECT CAST((SELECT count(*) FROM av) AS BIGINT) AS n_a,
        |         CAST((SELECT count(*) FROM bv) AS BIGINT) AS n_b
        |)
        |SELECT CAST(max(abs(c.ca*t.n_b - c.cb*t.n_a)) AS BIGINT) AS ks_num,
        |  t.n_a, t.n_b,
        |  CAST(CAST(max(abs(c.ca*t.n_b - c.cb*t.n_a)) AS BIGINT) AS DOUBLE)
        |    / CAST(t.n_a*t.n_b AS DOUBLE) AS ks
        |FROM c, t GROUP BY t.n_a, t.n_b""".stripMargin,

    // PSI: identical expression shape to Drift.psi — exact-integer
    // numerators/denominators, two divisions, one ln, round to nano.
    "q_psi_bins" ->
      """WITH av AS (
        |  SELECT CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |), bv AS (
        |  SELECT CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-15 00:00:00'
        |), h AS (
        |  SELECT CAST(floor(v / 500) AS BIGINT) AS bucket,
        |         CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b
        |  FROM (SELECT v, 1 AS na, 0 AS nb FROM av
        |        UNION ALL SELECT v, 0, 1 FROM bv)
        |  GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb,
        |         CAST(count(*) AS BIGINT) AS nbk
        |  FROM h
        |)
        |SELECT h.bucket, h.n_a, h.n_b,
        |  CAST(round(
        |    (CAST(h.n_a + 1 AS DOUBLE) / CAST(t.ta + t.nbk AS DOUBLE)
        |      - CAST(h.n_b + 1 AS DOUBLE) / CAST(t.tb + t.nbk AS DOUBLE))
        |    * ln((CAST(h.n_a + 1 AS DOUBLE) * CAST(t.tb + t.nbk AS DOUBLE))
        |         / (CAST(t.ta + t.nbk AS DOUBLE) * CAST(h.n_b + 1 AS DOUBLE)))
        |    * 1e9) AS BIGINT) AS psi_e9
        |FROM h, t ORDER BY h.bucket""".stripMargin,

    // Water-filling: the same segment walk over the size-sorted
    // group frame — row i's candidate tau = (B - prefix) // m lands
    // in its own segment [prev, n) for exactly one row (none iff the
    // budget exceeds the corpus); remainder +1s in group order.
    "q_water_fill" ->
      """WITH c AS (
        |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n FROM documents GROUP BY 1
        |), p AS (
        |  SELECT lang, n,
        |    CAST(row_number() OVER (ORDER BY n, lang) AS BIGINT) AS i,
        |    CAST(sum(n) OVER (ORDER BY n, lang ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(coalesce(lag(n) OVER (ORDER BY n, lang), 0) AS BIGINT) AS prev
        |  FROM c
        |), t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS g FROM c
        |), lvl AS (
        |  SELECT CAST((140000 - (cum - n)) // (t.g - i + 1) AS BIGINT) AS tau,
        |    CAST(140000 - (cum - n)
        |         - (t.g - i + 1) * ((140000 - (cum - n)) // (t.g - i + 1)) AS BIGINT) AS r
        |  FROM p, t
        |  WHERE (140000 - (cum - n)) // (t.g - i + 1) >= prev
        |    AND (140000 - (cum - n)) // (t.g - i + 1) < n
        |), ranked AS (
        |  SELECT c.lang, c.n, l.tau, l.r,
        |    row_number() OVER (PARTITION BY (c.n > l.tau) ORDER BY c.lang) AS caprank
        |  FROM c LEFT JOIN lvl l ON TRUE
        |)
        |SELECT lang, n AS n_chars,
        |  CAST(CASE WHEN tau IS NULL OR n <= tau THEN n
        |       ELSE tau + CASE WHEN caprank <= r THEN 1 ELSE 0 END END AS BIGINT) AS alloc
        |FROM ranked ORDER BY lang""".stripMargin,

    "q_freq_pairs" ->
      """WITH f AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        |  WHERE l_orderkey % 4 = 0
        |), freq AS (
        |  SELECT i FROM f GROUP BY i HAVING count(*) >= 2
        |), pf AS (
        |  SELECT f.b, f.i FROM f JOIN freq USING (i)
        |)
        |SELECT a.i AS item_a, b2.i AS item_b, CAST(count(*) AS BIGINT) AS support
        |FROM pf a JOIN pf b2 ON a.b = b2.b AND a.i < b2.i
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY 1, 2""".stripMargin,

    // item-item cosine: identical expression shape to
    // Baskets.cosinePairs — exact counts, one sqrt, one division,
    // round to nano.
    "q_item_cosine" ->
      """WITH f AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        |  WHERE l_orderkey % 4 = 0
        |), freq AS (
        |  SELECT i FROM f GROUP BY i HAVING count(*) >= 2
        |), pf AS (
        |  SELECT f.b, f.i FROM f JOIN freq USING (i)
        |), cnt AS (
        |  SELECT i, CAST(count(*) AS BIGINT) AS c FROM pf GROUP BY i
        |), pairs AS (
        |  SELECT a.i AS item_a, b2.i AS item_b, CAST(count(*) AS BIGINT) AS support
        |  FROM pf a JOIN pf b2 ON a.b = b2.b AND a.i < b2.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT p.item_a, p.item_b, p.support,
        |  CAST(round(CAST(p.support AS DOUBLE)
        |      / sqrt(CAST(ca.c * cb.c AS DOUBLE)) * 1e9) AS BIGINT) AS cos_e9
        |FROM pairs p
        |JOIN cnt ca ON ca.i = p.item_a
        |JOIN cnt cb ON cb.i = p.item_b
        |ORDER BY p.item_a, p.item_b""".stripMargin,

    // Geo radius join: brute-force O(n²) replica — exact integer
    // squared distances make the grid join's answer bit-comparable.
    "q_geo_radius" ->
      """WITH p AS (
        |  SELECT c_custkey AS id,
        |    CAST(concat('0x', substr(md5(concat('gx', CAST(c_custkey AS VARCHAR))), 1, 15))
        |         AS BIGINT) % 1000000 AS x,
        |    CAST(concat('0x', substr(md5(concat('gy', CAST(c_custkey AS VARCHAR))), 1, 15))
        |         AS BIGINT) % 1000000 AS y
        |  FROM customer
        |)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000
        |ORDER BY 1, 2""".stripMargin,

    // TWAP: the same LOCF segment decomposition via lead(); exact
    // integer numerator/denominator, one division.
    "q_twap" ->
      """WITH obs AS (
        |  SELECT event_type AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |         max(CAST(round(value*100) AS BIGINT)) AS v
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1, 2
        |), w AS (
        |  SELECT k, t, v,
        |    coalesce(lead(t) OVER (PARTITION BY k ORDER BY t), 1704326400) AS nxt
        |  FROM obs WHERE t < 1704326400
        |), seg AS (
        |  SELECT k, v,
        |    greatest(least(nxt, 1704326400) - greatest(t, 1704240000), 0) AS len
        |  FROM w
        |)
        |SELECT k AS event_type,
        |  CASE WHEN sum(len) > 0
        |       THEN CAST(sum(v*len) AS DOUBLE) / CAST(sum(len) AS DOUBLE) END AS twap,
        |  CAST(sum(len) AS BIGINT) AS covered_seconds
        |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin,

    // OHLC: arg_min/arg_max on the instant, same per-second
    // pre-dedup as q_twap.
    "q_ohlc" ->
      """WITH obs AS (
        |  SELECT event_type AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |         max(CAST(round(value*100) AS BIGINT)) AS v
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT k AS event_type, CAST(t - t % 600 AS BIGINT) AS bucket_epoch,
        |  CAST(arg_min(v, t) AS BIGINT) AS open,
        |  CAST(max(v) AS BIGINT) AS high,
        |  CAST(min(v) AS BIGINT) AS low,
        |  CAST(arg_max(v, t) AS BIGINT) AS close,
        |  CAST(count(*) AS BIGINT) AS n_obs
        |FROM obs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // MAD outliers: exact lower-medians over sorted cent arrays,
    // Hampel flags counted per group.
    "q_mad_outliers" ->
      """WITH v AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, list_sort(list(cents)) AS sorted, count(*) AS n
        |  FROM v GROUP BY 1
        |), m AS (
        |  SELECT event_type, n, sorted,
        |    sorted[CAST((n-1)//2 AS BIGINT) + 1] AS median
        |  FROM g
        |), s AS (
        |  SELECT event_type, n, median,
        |    list_sort(list_transform(sorted, x -> abs(x - median)))[CAST((n-1)//2 AS BIGINT) + 1] AS mad
        |  FROM m
        |), c AS (
        |  SELECT v.event_type,
        |    sum(CASE WHEN abs(v.cents - s.median) > 3*s.mad THEN 1 ELSE 0 END) AS n_outliers
        |  FROM v JOIN s USING (event_type) GROUP BY 1
        |)
        |SELECT s.event_type, CAST(s.n AS BIGINT) AS n,
        |  CAST(s.median AS BIGINT) AS median, CAST(s.mad AS BIGINT) AS mad,
        |  CAST(c.n_outliers AS BIGINT) AS n_outliers
        |FROM s JOIN c USING (event_type) ORDER BY 1""".stripMargin,

    // Interpolation restated as the per-point neighbor lookup the
    // windowed plan avoids; same second-floored epochs, same
    // dedup-by-max-cents, same one-division lerp tree.
    "q_interpolate" ->
      """WITH obs AS (
        |  SELECT event_type AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |         CAST(max(CAST(round(value*100) AS BIGINT)) AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1, 2
        |), grid AS (
        |  SELECT k, unnest(generate_series(1704240000, 1704412800, 3600)) AS t
        |  FROM (SELECT DISTINCT event_type AS k FROM events WHERE value IS NOT NULL)
        |), nb AS (
        |  SELECT g.k, g.t,
        |    (SELECT max(o.t) FROM obs o WHERE o.k = g.k AND o.t <= g.t) AS tb,
        |    (SELECT min(o.t) FROM obs o WHERE o.k = g.k AND o.t >= g.t) AS ta
        |  FROM grid g
        |)
        |SELECT n.k AS event_type, n.t AS grid_epoch,
        |  CASE WHEN n.tb IS NULL OR n.ta IS NULL THEN NULL
        |       WHEN n.tb = n.ta THEN vb.v
        |       ELSE vb.v + ((va.v - vb.v) * CAST(n.t - n.tb AS DOUBLE))
        |                   / CAST(n.ta - n.tb AS DOUBLE)
        |  END AS value
        |FROM nb n
        |LEFT JOIN obs vb ON vb.k = n.k AND vb.t = n.tb
        |LEFT JOIN obs va ON va.k = n.k AND va.t = n.ta
        |ORDER BY event_type, grid_epoch""".stripMargin,

    "q_quantiles" ->
      """WITH v AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, list_sort(list(cents)) AS sorted, count(*) AS n
        |  FROM v GROUP BY 1
        |)
        |SELECT event_type, n,
        |       sorted[CAST(floor((n-1)*0.5) AS BIGINT) + 1] / 100.0 AS p50,
        |       sorted[CAST(floor((n-1)*0.9) AS BIGINT) + 1] / 100.0 AS p90,
        |       sorted[CAST(floor((n-1)*0.99) AS BIGINT) + 1] / 100.0 AS p99
        |FROM g""".stripMargin
  )

  private def extraOracles: Map[String, String] = Map(
    // micros arithmetic on both sides: Spark unix_micros == DuckDB
    // epoch_us after the shared nanos→micros truncation
    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), g AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM g
        |)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no, count(*) AS n_events,
        |       min(ts) AS sess_start, max(ts) AS sess_end
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(CAST(round(value*100) AS BIGINT) / 500.0) AS BIGINT) AS bucket,
        |       count(*) AS n_rows,
        |       min(CAST(round(value*100) AS BIGINT)) / 100.0 AS lo,
        |       max(CAST(round(value*100) AS BIGINT)) / 100.0 AS hi
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "q_range_frame" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  SUM(CAST(round(value*100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) / 100.0 AS trailing_1h
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "q_skew_join" ->
      """SELECT c_mktsegment, count(*) AS n_rows,
        |       count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.user_id IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "q_recap_nested" ->
      """WITH obs AS (
        |  SELECT event_id AS obs_id, user_id AS location_id,
        |         CAST(ts AS DATE) AS obs_date,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS obs_hour,
        |         (CAST(extract(minute FROM ts) AS INT) // 10) * 10 AS obs_slot,
        |         value AS temp_c, event_type AS condition,
        |         CASE WHEN event_type = 'purchase' THEN value END AS precip_mm
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), slot_first AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY location_id, obs_date, obs_hour, obs_slot ORDER BY obs_id) AS rn
        |    FROM obs) WHERE rn = 1
        |), cond_counts AS (
        |  SELECT location_id, obs_date, obs_hour, condition, count(*) AS c
        |  FROM slot_first GROUP BY 1,2,3,4
        |), dominant AS (
        |  SELECT location_id, obs_date, obs_hour, condition AS dominant_condition
        |  FROM (SELECT *, row_number() OVER (PARTITION BY location_id, obs_date, obs_hour ORDER BY c DESC, condition ASC) AS rn
        |        FROM cond_counts) WHERE rn = 1
        |), hourly AS (
        |  SELECT f.location_id, f.obs_date, f.obs_hour,
        |    round(sum(CAST(round(f.temp_c*100) AS BIGINT))*1.0/count(f.temp_c))/100.0 AS avg_temp_c,
        |    min(f.temp_c) AS min_temp_c,
        |    max(f.temp_c) AS max_temp_c,
        |    any_value(d.dominant_condition) AS dominant_condition,
        |    coalesce(sum(CAST(round(f.precip_mm*100) AS BIGINT)), 0)/100.0 AS total_precip_mm,
        |    count(f.temp_c) AS n_obs,
        |    count(*) AS n_slots
        |  FROM slot_first f JOIN dominant d
        |    ON f.location_id = d.location_id AND f.obs_date = d.obs_date AND f.obs_hour = d.obs_hour
        |  GROUP BY 1,2,3
        |), flags AS (
        |  SELECT location_id, obs_date,
        |         max(CASE WHEN obs_hour = 23 THEN true ELSE false END) AS is_full_recap
        |  FROM hourly GROUP BY 1,2
        |)
        |SELECT h.location_id, h.obs_date, f.is_full_recap, h.obs_hour,
        |  h.avg_temp_c, h.min_temp_c, h.max_temp_c, h.dominant_condition,
        |  h.total_precip_mm, h.n_obs, h.n_slots AS n_slots_filled
        |FROM hourly h JOIN flags f ON h.location_id = f.location_id AND h.obs_date = f.obs_date""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    // exactly the three requested grains; gid bits match the cube
    // convention (1 = the column is aggregated away at this grain)
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,

    // melt replays as the explicit per-type UNION ALL over the same
    // conditional-count wide frame
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |)
        |SELECT user_id, event_type, n FROM (
        |  SELECT user_id, 'click' AS event_type, click AS n FROM wide
        |  UNION ALL SELECT user_id, 'error', error FROM wide
        |  UNION ALL SELECT user_id, 'purchase', purchase FROM wide
        |  UNION ALL SELECT user_id, 'signup', signup FROM wide
        |  UNION ALL SELECT user_id, 'view', view FROM wide
        |)
        |ORDER BY user_id, event_type""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events WHERE user_id IS NOT NULL GROUP BY 1""".stripMargin,

    "q_set_ops" ->
      """WITH c AS (SELECT user_id FROM events WHERE user_id IS NOT NULL AND event_type = 'click'),
        |     b AS (SELECT user_id FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase')
        |SELECT user_id, 'both' AS set_op FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM b)
        |UNION ALL
        |SELECT user_id, 'click_only' AS set_op FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM b)""".stripMargin,

    "q_distinct_stats" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_rows,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days
        |FROM events WHERE user_id IS NOT NULL GROUP BY 1""".stripMargin,

    // Mirrors Similarity.cosineNearDupPairsLsh (bands=16, r=4,
    // threshold=0.5): DuckDB rebuilds the same 64-plane hash60 sign
    // family (plane p belongs to band p//4, bit p%4), reproduces the
    // banded candidate join, and verifies with the same quantized
    // cosine — an exact replication of the approximation, like
    // q_lsh_topk.
    "q_embed_neardup" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, v,
        |    sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
        |  FROM q
        |), planes AS (
        |  SELECT p.p // 4 AS band, p.p % 4 AS j, i.i,
        |    CASE WHEN CAST('0x' || substr(md5(p.p || ':' || i.i), 1, 15) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END AS s
        |  FROM (SELECT unnest(generate_series(0, 63)) AS p) p,
        |       (SELECT unnest(generate_series(0, 63)) AS i) i
        |), proj AS (
        |  SELECT n.vec_id, pl.band, pl.j, CAST(SUM(n.v[pl.i + 1] * pl.s) AS BIGINT) AS dot
        |  FROM nrm n JOIN planes pl ON pl.i < len(n.v)
        |  GROUP BY 1, 2, 3
        |), bkt AS (
        |  SELECT vec_id, band, CAST(SUM(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
        |  FROM proj GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM bkt a JOIN bkt b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), s AS (
        |  SELECT c.a_id, c.b_id,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(an.v)), k -> an.v[k]*bn.v[k])) AS BIGINT) AS DOUBLE)/(an.nv*bn.nv) AS cosine
        |  FROM cand c JOIN nrm an ON an.vec_id = c.a_id JOIN nrm bn ON bn.vec_id = c.b_id
        |)
        |SELECT a_id, b_id, cosine FROM s WHERE cosine >= 0.5""".stripMargin,

    // Cross-corpus contamination: q_embed_neardup's plane family,
    // banded EVAL × TRAIN instead of self; eval = natural tail +
    // planted train copies (ids shifted +10000).
    "q_semantic_contam" ->
      """WITH tr AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings WHERE vec_id < 1500
        |), ev AS (
        |  SELECT vec_id AS vid, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings WHERE vec_id >= 1500
        |  UNION ALL
        |  SELECT -vec_id - 1, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT))
        |  FROM embeddings WHERE vec_id < 100
        |), trn AS (
        |  SELECT vec_id, v,
        |    sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
        |  FROM tr
        |), evn AS (
        |  SELECT vid, v,
        |    sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
        |  FROM ev
        |), planes AS (
        |  SELECT p.p // 4 AS band, p.p % 4 AS j, i.i,
        |    CASE WHEN CAST('0x' || substr(md5(p.p || ':' || i.i), 1, 15) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END AS s
        |  FROM (SELECT unnest(generate_series(0, 63)) AS p) p,
        |       (SELECT unnest(generate_series(0, 63)) AS i) i
        |), projT AS (
        |  SELECT n.vec_id, pl.band, pl.j, CAST(SUM(n.v[pl.i + 1] * pl.s) AS BIGINT) AS dot
        |  FROM trn n JOIN planes pl ON pl.i < len(n.v) GROUP BY 1, 2, 3
        |), bktT AS (
        |  SELECT vec_id, band, CAST(SUM(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
        |  FROM projT GROUP BY 1, 2
        |), projE AS (
        |  SELECT n.vid, pl.band, pl.j, CAST(SUM(n.v[pl.i + 1] * pl.s) AS BIGINT) AS dot
        |  FROM evn n JOIN planes pl ON pl.i < len(n.v) GROUP BY 1, 2, 3
        |), bktE AS (
        |  SELECT vid, band, CAST(SUM(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
        |  FROM projE GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT e.vid AS eval_id, t.vec_id AS train_id
        |  FROM bktE e JOIN bktT t ON t.band = e.band AND t.bucket = e.bucket
        |), s AS (
        |  SELECT c.eval_id, c.train_id,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(en.v)), k -> en.v[k]*tn.v[k])) AS BIGINT) AS DOUBLE)/(en.nv*tn.nv) AS cosine
        |  FROM cand c JOIN evn en ON en.vid = c.eval_id JOIN trn tn ON tn.vec_id = c.train_id
        |)
        |SELECT eval_id, train_id, cosine FROM s WHERE cosine >= 0.95
        |ORDER BY eval_id, train_id""".stripMargin,

    // Same plane family and verify shape as q_embed_neardup, but
    // 28 bands × r planes at threshold 0.9 over the twin-seeded
    // corpus, where r = max(12, ceil_log2(corpus) + 5) MIRRORS
    // Similarity.autoPlanesPerBand from DuckDB's own COUNT(*) via the
    // identical integer power-of-two scan (no FP log on either side);
    // the twin factors (1 + k/128) are exact doubles, so quantization
    // agrees bit-for-bit across engines.
    "q_embed_neardup_hi" ->
      """WITH twin AS (
        |  SELECT vec_id + 1000000 AS tid,
        |    list_transform(generate_series(1, len(embedding)), i ->
        |      CAST(embedding[i] AS DOUBLE) * (1.0 + ((vec_id * 31 + (i - 1)) % 7 - 3) / 128.0)) AS e
        |  FROM embeddings
        |), corpus AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT tid AS vec_id, list_transform(e, x -> CAST(round(x*10000) AS BIGINT)) AS v
        |  FROM twin
        |), params AS (
        |  SELECT least(40, greatest(12, min(i.i) + 5)) AS r
        |  FROM (SELECT unnest(generate_series(1, 62)) AS i) i,
        |       (SELECT count(*) AS n FROM corpus) nn
        |  WHERE power(2.0, i.i) >= nn.n
        |), nrm AS (
        |  SELECT vec_id, v,
        |    sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
        |  FROM corpus
        |), planes AS (
        |  SELECT p.p // pr.r AS band, p.p % pr.r AS j, i.i,
        |    CASE WHEN CAST('0x' || substr(md5(p.p || ':' || i.i), 1, 15) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END AS s
        |  FROM (SELECT unnest(generate_series(0, 28*40 - 1)) AS p) p,
        |       (SELECT unnest(generate_series(0, 63)) AS i) i,
        |       params pr
        |  WHERE p.p < 28 * pr.r
        |), proj AS (
        |  SELECT n.vec_id, pl.band, pl.j, CAST(SUM(n.v[pl.i + 1] * pl.s) AS BIGINT) AS dot
        |  FROM nrm n JOIN planes pl ON pl.i < len(n.v)
        |  GROUP BY 1, 2, 3
        |), bkt AS (
        |  SELECT vec_id, band, CAST(SUM(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
        |  FROM proj GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM bkt a JOIN bkt b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), s AS (
        |  SELECT c.a_id, c.b_id,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(an.v)), k -> an.v[k]*bn.v[k])) AS BIGINT) AS DOUBLE)/(an.nv*bn.nv) AS cosine
        |  FROM cand c JOIN nrm an ON an.vec_id = c.a_id JOIN nrm bn ON bn.vec_id = c.b_id
        |)
        |SELECT a_id, b_id, cosine FROM s WHERE cosine >= 0.9
        |ORDER BY a_id, b_id""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty,
        |  CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q_mode_det" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1,2
        |)
        |SELECT c.user_id, c.event_type AS dominant_type, t.n_rows
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn FROM c) c
        |JOIN (SELECT user_id, count(*) AS n_rows FROM events WHERE user_id IS NOT NULL GROUP BY 1) t
        |  USING (user_id)
        |WHERE c.rn = 1""".stripMargin,

    "q_simhash_pairs" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_distinct(string_split_regex(text, ' +'))) AS t FROM documents
         |), h AS (
         |  SELECT doc_id, ${duckHash60.format("t")} AS hv FROM tok
         |), bits AS (
         |  SELECT doc_id, i, sum(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM h, (SELECT unnest(generate_series(0, 59)) AS i)
         |  GROUP BY 1,2
         |), sims AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY 1
         |), banded AS (
         |  SELECT doc_id, simhash, b, (simhash >> (b*15)) & 32767 AS bucket
         |  FROM sims, (SELECT unnest(generate_series(0, 3)) AS b)
         |)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM banded a JOIN banded b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
  )

  private val duckHash60 = "CAST(concat('0x', substr(md5(%s), 1, 15)) AS BIGINT)"

  /** Fixed-point "model weights" for q_hashed_score — deterministic
    * from the bucket index so the DuckDB oracle can rebuild the
    * identical vector with a list comprehension (Fibonacci-hash
    * spread over [-10, 10]). */
  private[graft] val hashedWeights: Seq[Long] =
    (0 until 64).map(i => (i * 2654435761L) % 21L - 10L)

  /** DuckDB mirror of TextFunctions.qualityScore — shared by every
    * oracle that filters or weights on quality. */
  private val qualitySql =
    """least(CAST(len(string_split_regex(text, ' +')) AS DOUBLE)/64.0, 1.0)*0.4
      |    + (CASE WHEN (CAST(length(text) AS DOUBLE) - (CAST(len(string_split_regex(text, ' +')) AS DOUBLE) - 1.0))
      |                 / greatest(CAST(len(string_split_regex(text, ' +')) AS DOUBLE), 1.0) BETWEEN 3.0 AND 10.0
      |            THEN 1.0 ELSE 0.5 END)*0.3
      |    + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
      |                   / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0))*0.3""".stripMargin

  private def trainingOracles: Map[String, String] = {
    // Mirrors KMeans.train(k=8, iters=2) + assign: the two update
    // steps are UNROLLED as CTE stages (c0 seed → assign a0 → integer
    // per-dim sums s1 → centroids c1 → a1 → s2 → c2 → final a2).
    // Centroids are exact-integer SUM vectors (never floating means:
    // cosine against the sum equals cosine against the mean), the
    // seed is vec_id < k, argmax ties go to the smallest cid, and an
    // empty cluster keeps its previous centroid (the LEFT JOIN +
    // coalesce) — term-for-term the Scala training loop, so the
    // assignment is an exact replication, not a statistical one.
    def kmeansAssignCte(cents: String, out: String) =
      s"""$out AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT n.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY CAST(CAST(list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i]*c.cv[i])) AS BIGINT) AS DOUBLE)/(n.nv*c.cn) DESC, c.cid ASC) AS rn
         |    FROM nrm n, $cents c)
         |  WHERE rn = 1
         |)""".stripMargin
    def kmeansUpdateCte(assign: String, prev: String, out: String) =
      s"""s_$out AS (
         |  SELECT a.cid, d.i, CAST(SUM(n.v[d.i]) AS BIGINT) AS s
         |  FROM $assign a JOIN nrm n USING (vec_id), (SELECT unnest(generate_series(1, 64)) AS i) d
         |  GROUP BY 1, 2
         |), u_$out AS (
         |  SELECT cid, list(s ORDER BY i) AS cv,
         |    sqrt(CAST(CAST(SUM(s*s) AS BIGINT) AS DOUBLE)) AS cn
         |  FROM s_$out GROUP BY cid
         |), $out AS (
         |  SELECT $prev.cid, coalesce(u_$out.cv, $prev.cv) AS cv, coalesce(u_$out.cn, $prev.cn) AS cn
         |  FROM $prev LEFT JOIN u_$out USING (cid)
         |)""".stripMargin
    val kmeansCtes =
      s"""WITH qz AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
         |  FROM embeddings
         |), nrm AS (
         |  SELECT vec_id, v,
         |    sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
         |  FROM qz
         |), c0 AS (
         |  SELECT vec_id AS cid, v AS cv, nv AS cn FROM nrm WHERE vec_id < 8
         |), ${kmeansAssignCte("c0", "a0")},
         |${kmeansUpdateCte("a0", "c0", "c1")},
         |${kmeansAssignCte("c1", "a1")},
         |${kmeansUpdateCte("a1", "c1", "c2")},
         |${kmeansAssignCte("c2", "a2")}""".stripMargin
    val kmeansSql =
      s"""$kmeansCtes
         |SELECT vec_id, CAST(cid AS INT) AS list_id FROM a2 ORDER BY vec_id""".stripMargin
    // PQ trained codebook: ProductQuantizer.trainedModel(m=4, k=16,
    // iters=2) + encode, unrolled per subspace (the m subspaces train
    // independently — loop order in the Scala code is irrelevant).
    // Each subspace: seed c{s}_0 = corpus rows vec_id < 16 sliced,
    // two Lloyd rounds of (argmin assign with ties to the smallest
    // cid, rounded-integer-mean update floorDiv(2·Σx + n, 2n) with
    // empty clusters keeping their centroid), then the final encode
    // assignment. The assignment ranks by FULL squared L2 where the
    // Scala side drops the constant ‖v_s‖² term — identical order and
    // ties within each (vec, subspace) partition. floorDiv must be
    // FLOOR division (Math.floorDiv): DuckDB's // truncates toward
    // zero, hence the explicit (a − ((a%b)+b)%b)/b form (b = 2n > 0).
    val pqTrainedSql = {
      val m = 4; val k = 16; val sd = 16
      def d2(vExpr: String, cvExpr: String) =
        s"CAST(list_sum(list_transform(generate_series(1, $sd), i -> ($vExpr[i] - $cvExpr[i]) * ($vExpr[i] - $cvExpr[i]))) AS BIGINT)"
      def assignCte(s: Int, cents: String, out: String) =
        s"""$out AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT n.vec_id, c.cid,
           |      row_number() OVER (PARTITION BY n.vec_id ORDER BY ${d2("n.sv", "c.cv")} ASC, c.cid ASC) AS rn
           |    FROM sv$s n, $cents c)
           |  WHERE rn = 1
           |)""".stripMargin
      def updateCte(s: Int, assign: String, prev: String, out: String) = {
        val fd = "((2*sx + n) - (((2*sx + n) % (2*n)) + (2*n)) % (2*n)) // (2*n)"
        s"""s_$out AS (
           |  SELECT a.cid, d.i, CAST(SUM(n.sv[d.i]) AS BIGINT) AS sx, CAST(count(*) AS BIGINT) AS n
           |  FROM $assign a JOIN sv$s n USING (vec_id), (SELECT unnest(generate_series(1, $sd)) AS i) d
           |  GROUP BY 1, 2
           |), u_$out AS (
           |  SELECT cid, list($fd ORDER BY i) AS cv FROM s_$out GROUP BY cid
           |), $out AS (
           |  SELECT p.cid, coalesce(u.cv, p.cv) AS cv FROM $prev p LEFT JOIN u_$out u USING (cid)
           |)""".stripMargin
      }
      val perS = (0 until m).map { s =>
        val lo = s * sd + 1; val hi = (s + 1) * sd
        s"""sv$s AS (
           |  SELECT vec_id, list_slice(v, $lo, $hi) AS sv FROM qz
           |), c${s}_0 AS (
           |  SELECT vec_id AS cid, list_slice(v, $lo, $hi) AS cv FROM qz WHERE vec_id < $k
           |), ${assignCte(s, s"c${s}_0", s"a${s}_1")},
           |${updateCte(s, s"a${s}_1", s"c${s}_0", s"c${s}_1")},
           |${assignCte(s, s"c${s}_1", s"a${s}_2")},
           |${updateCte(s, s"a${s}_2", s"c${s}_1", s"c${s}_2")},
           |${assignCte(s, s"c${s}_2", s"f$s")}""".stripMargin
      }.mkString(",\n")
      s"""WITH qz AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), $perS
         |SELECT q.vec_id,
         |  CAST(f0.cid AS INT) AS code0, CAST(f1.cid AS INT) AS code1,
         |  CAST(f2.cid AS INT) AS code2, CAST(f3.cid AS INT) AS code3
         |FROM qz q JOIN f0 USING (vec_id) JOIN f1 USING (vec_id)
         |     JOIN f2 USING (vec_id) JOIN f3 USING (vec_id)
         |ORDER BY q.vec_id""".stripMargin
    }
    // SemDeDup: the same trained assignment, then all within-cluster
    // pairs verified with the exact quantized cosine at threshold 0.4
    val semdedupSql =
      s"""$kmeansCtes
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  CAST(CAST(list_sum(list_transform(generate_series(1, len(x.v)), i -> x.v[i]*y.v[i])) AS BIGINT) AS DOUBLE)/(x.nv*y.nv) AS cosine
         |FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |JOIN nrm x ON x.vec_id = a.vec_id
         |JOIN nrm y ON y.vec_id = b.vec_id
         |WHERE CAST(CAST(list_sum(list_transform(generate_series(1, len(x.v)), i -> x.v[i]*y.v[i])) AS BIGINT) AS DOUBLE)/(x.nv*y.nv) >= 0.4""".stripMargin
    // cross-batch exact Jaccard (new = doc_id ≡ 0 mod 20 vs the rest):
    // the q_incr_neardup contract, same shingle/threshold conventions
    // as exactJaccardSql below
    val incrementalJaccardSql =
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
        |    i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])) AS shingles
        |  FROM tok
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh
        |)
        |SELECT a.doc_id AS new_id, b.doc_id AS old_id, CAST(count(*) AS INT) AS common,
        |  count(*)*1.0/(any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
        |FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id % 20 = 0 AND b.doc_id % 20 <> 0
        |GROUP BY 1,2
        |HAVING count(*)*1.0/(any_value(a.n) + any_value(b.n) - count(*)) >= 0.8""".stripMargin
    val exactJaccardSql =
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
        |    i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])) AS shingles
        |  FROM tok
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh
        |)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common,
        |  count(*)*1.0/(any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
        |FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |GROUP BY 1,2
        |HAVING count(*)*1.0/(any_value(a.n) + any_value(b.n) - count(*)) >= 0.8""".stripMargin
    // The ONE transitive closure over the exact-Jaccard pair set
    // (shingle -> pairs -> edges -> reach); min reachable id per node
    // = the component label Spark's min-label propagation converges
    // to. Shared verbatim by the three cluster-consuming oracles so a
    // threshold/shingling tweak can never desynchronize them.
    val closurePrefix =
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
        |    i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])) AS shingles
        |  FROM tok
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1,2
        |  HAVING count(*)*1.0/(any_value(a.n) + any_value(b.n) - count(*)) >= 0.8
        |), edges AS (
        |  SELECT d1 AS src, d2 AS dst FROM pairs
        |  UNION SELECT d2 AS src, d1 AS dst FROM pairs
        |), reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
        |)""".stripMargin
    val componentsSql =
      s"""$closurePrefix
        |SELECT id AS doc_id, min(r) AS cluster_id, (id = min(r)) AS is_canonical
        |FROM reach GROUP BY 1""".stripMargin
    // Same closure, then anti-join the non-canonical members away and
    // aggregate the survivors.
    val dedupPipelineSql =
      s"""$closurePrefix, losers AS (
        |  SELECT id FROM reach GROUP BY id HAVING id <> min(r)
        |)
        |SELECT d.lang, count(*) AS n_docs, min(d.doc_id) AS min_doc,
        |       CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
        |FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
        |WHERE l.id IS NULL
        |GROUP BY 1""".stripMargin
    // Same closure, but the component label becomes the SPLIT KEY:
    // md5 cut-points on coalesce(cluster, doc_id) — the whole cluster
    // moves as one atom.
    val leakSplitSql =
      s"""$closurePrefix, clusters AS (
        |  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1
        |), keyed AS (
        |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_key
        |  FROM documents d LEFT JOIN clusters c USING (doc_id)
        |)
        |SELECT doc_id, group_key,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id, group_key,
        |    CAST(concat('0x', substr(md5(CAST(group_key AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        |  FROM keyed
        |)""".stripMargin
    // Same closure, then the survivorship pick: quality-best member
    // (longest text, ties to smallest id) per cluster instead of the
    // id-min canonical.
    val survivorshipSql =
      s"""$closurePrefix, clusters AS (
        |  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1
        |), scored AS (
        |  SELECT c.cluster_id, c.doc_id, CAST(coalesce(len(d.text), 0) AS BIGINT) AS tlen
        |  FROM clusters c JOIN documents d USING (doc_id)
        |), ranked AS (
        |  SELECT cluster_id, doc_id, tlen,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY tlen DESC, doc_id ASC) AS rn,
        |    CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
        |  FROM scored
        |)
        |SELECT cluster_id, n_members, doc_id AS survivor_id, tlen AS survivor_len
        |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin
    // Same closure, then cluster sizes become per-doc sampling
    // weights (1e9 // size; unclustered docs weigh 1e9) — the
    // round-9 dedup-by-downweighting audit.
    val dedupWeightsSql =
      s"""$closurePrefix, clusters AS (
        |  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1
        |), sizes AS (
        |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n FROM clusters GROUP BY 1
        |)
        |SELECT d.doc_id, d.lang,
        |  CAST(coalesce(s.n, 1) AS BIGINT) AS n_members,
        |  CAST(1000000000 // coalesce(s.n, 1) AS BIGINT) AS weight_nano
        |FROM documents d
        |LEFT JOIN clusters c USING (doc_id)
        |LEFT JOIN sizes s USING (cluster_id)""".stripMargin
    Map(
      "q_dup_components" -> componentsSql,
      "q_dedup_pipeline" -> dedupPipelineSql,
      "q_leak_split" -> leakSplitSql,
      "q_survivorship" -> survivorshipSql,
      "q_dedup_weights" -> dedupWeightsSql,

      // Same md5 hash order (hash, then doc_id tie-break), ranked
      // per lang, cut at the quota.
      "q_group_cap" ->
        s"""WITH r AS (
           |  SELECT doc_id, lang,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY ${duckHash60.format("CAST(doc_id AS VARCHAR)")}, doc_id) AS sel_rank
           |  FROM documents
           |)
           |SELECT doc_id, lang, CAST(sel_rank AS INT) AS sel_rank
           |FROM r WHERE sel_rank <= 25""".stripMargin,

      // Same binding-source arithmetic in DOUBLE on both sides (the
      // DECIMAL-literal trap: DuckDB's bare 0.5 is DECIMAL, whose
      // division differs from Spark's double — cast explicitly).
      "q_mix" ->
        """WITH c AS (
          |  SELECT source, count(*) AS n FROM documents
          |  WHERE source IN ('src0','src1','src2') GROUP BY 1
          |), w(source, wt) AS (
          |  VALUES ('src0', CAST(0.5 AS DOUBLE)),
          |         ('src1', CAST(0.25 AS DOUBLE)),
          |         ('src2', CAST(0.25 AS DOUBLE))
          |), s AS (
          |  SELECT c.source, c.n, w.wt,
          |         CAST(c.n AS DOUBLE) / w.wt AS ratio,
          |         min(CAST(c.n AS DOUBLE) / w.wt) OVER () AS scale
          |  FROM c JOIN w USING (source)
          |), cut AS (
          |  SELECT source,
          |         CASE WHEN scale = ratio THEN 1048576
          |              ELSE CAST(floor(1048576.0 * scale * wt / CAST(n AS DOUBLE)) AS BIGINT)
          |         END AS cutoff
          |  FROM s
          |)
          |SELECT d.doc_id, d.source
          |FROM documents d JOIN cut USING (source)
          |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1048576 < cutoff""".stripMargin,

      // Cumulative conditional aggregation with the same stage
      // predicates; the quality expression is the q_text_stats mirror.
      "q_curation_funnel" -> {
        val quality = qualitySql
        val c1 = "(text IS NOT NULL AND length(text) > 0)"
        val c2 = s"$c1 AND len(string_split_regex(text, ' +')) >= 30"
        val c3 = s"$c2 AND ($quality) >= 0.7"
        val c4 = s"$c3 AND ${duckHash60.format("CAST(doc_id AS VARCHAR)")} % 100 < 50"
        s"""SELECT lang, count(*) AS n_raw,
           |  CAST(sum(CASE WHEN $c1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonempty,
           |  CAST(sum(CASE WHEN $c2 THEN 1 ELSE 0 END) AS BIGINT) AS n_token_min,
           |  CAST(sum(CASE WHEN $c3 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           |  CAST(sum(CASE WHEN $c4 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
           |FROM documents GROUP BY lang""".stripMargin
      },

      // Same clamp/floor cut on the salted md5 bucket; the quality
      // double is bit-identical cross-engine (proven by q_text_stats).
      "q_score_sample" ->
        s"""WITH q AS (
           |  SELECT doc_id, lang, ($qualitySql) AS qv FROM documents
           |)
           |SELECT doc_id, lang FROM q
           |WHERE ${duckHash60.format("concat('score:', CAST(doc_id AS VARCHAR))")} % 1048576
           |      < CAST(floor(least(greatest(qv, 0.0), 1.0) * 1048576) AS BIGINT)""".stripMargin,

      // floor(w) copies + one more iff the salted bucket clears the
      // fractional cut; LATERAL generate_series mirrors the explode.
      "q_repeat_weight" ->
        s"""WITH w AS (
           |  SELECT doc_id, 2.0 * ($qualitySql) AS wv FROM documents
           |), n AS (
           |  SELECT doc_id,
           |    CAST(floor(wv) AS INT) +
           |    (CASE WHEN ${duckHash60.format("concat('repeat:', CAST(doc_id AS VARCHAR))")} % 1048576
           |               < CAST(floor((wv - floor(wv)) * 1048576) AS BIGINT) THEN 1 ELSE 0 END) AS n
           |  FROM w
           |)
           |SELECT n.doc_id, CAST(g.i AS INT) AS copy_idx
           |FROM n, LATERAL (SELECT unnest(generate_series(0, n.n - 1)) AS i) g
           |WHERE n.n > 0""".stripMargin,

      // Exact-integer df threshold on both sides; order-preserving
      // reassembly via string_agg(... ORDER BY pos).
      "q_boilerplate" ->
        """WITH toks AS (
          |  SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents
          |), u AS (
          |  SELECT doc_id, i.i AS pos, ts[i.i] AS unit
          |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) i
          |  WHERE len(ts[i.i]) > 0
          |), d AS (
          |  SELECT unit, count(DISTINCT doc_id) AS df FROM u GROUP BY 1
          |), n AS (
          |  SELECT count(*) AS n_docs FROM documents
          |), kept AS (
          |  SELECT u.doc_id, string_agg(u.unit, ' ' ORDER BY u.pos) AS t
          |  FROM u JOIN d USING (unit), n
          |  WHERE d.df * 1000 <= 400 * n.n_docs
          |  GROUP BY 1
          |)
          |SELECT doc_id,
          |  CASE WHEN doc.text IS NULL THEN NULL ELSE coalesce(k.t, '') END AS text
          |FROM documents doc LEFT JOIN kept k USING (doc_id)""".stripMargin,

      // hash60('7:' || doc_id) replicated literally; the top-100 set
      // and the key values must both match.
      "q_shuffle_order" ->
        s"""SELECT doc_id,
           |  ${duckHash60.format("concat('7:', CAST(doc_id AS VARCHAR))")} AS shuffle_key
           |FROM documents
           |ORDER BY shuffle_key, doc_id
           |LIMIT 100""".stripMargin,

      // Same top-20 vocabulary derivation, then per-doc unnest + left
      // join; empty/whitespace docs report 0 tokens, rate 0.
      "q_oov_rate" ->
        """WITH tok AS (
          |  SELECT unnest(string_split_regex(text, ' +')) AS token FROM documents
          |), c AS (
          |  SELECT token, count(*) AS cnt FROM tok WHERE len(token) > 0 GROUP BY 1
          |), vocab AS (
          |  SELECT token FROM (
          |    SELECT token, row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM c
          |  ) WHERE rank <= 20
          |), u AS (
          |  SELECT d.doc_id, t.tk FROM documents d
          |  LEFT JOIN LATERAL (
          |    SELECT unnest(list_filter(string_split_regex(d.text, ' +'), x -> len(x) > 0)) AS tk
          |  ) t ON true
          |)
          |SELECT u.doc_id,
          |  CAST(count(u.tk) AS BIGINT) AS n_tokens,
          |  CAST(sum(CASE WHEN u.tk IS NOT NULL AND v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          |  CASE WHEN count(u.tk) > 0
          |       THEN CAST(sum(CASE WHEN u.tk IS NOT NULL AND v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
          |            / CAST(count(u.tk) AS DOUBLE)
          |       ELSE 0.0 END AS oov_rate
          |FROM u LEFT JOIN vocab v ON u.tk = v.token
          |GROUP BY 1""".stripMargin,

      // Mirrors Vocab.surprisal: floor-log2 via binary-string length
      // (length(bin(x)) − 1 in both engines — exact integers, no IEEE
      // log), integer bit sums, ONE double division per doc. The
      // documents spine (LEFT JOIN) keeps token-less docs at 0.
      // Mirrors CountMin.build/estimate: same md5-prefix hash60 of
      // "r:key" mod 512 cell addressing, count cells, min over the 4
      // rows with absent cells as 0. The estimates are deterministic,
      // so the approximate sketch hash-matches exactly.
      "q_countmin" ->
        """WITH rows4 AS (
          |  SELECT unnest(range(0, 4)) AS r
          |), cells AS (
          |  SELECT r,
          |    CAST(concat('0x', substr(md5(concat(CAST(r AS VARCHAR), ':', CAST(l_suppkey AS VARCHAR))), 1, 15)) AS BIGINT) % 512 AS c,
          |    CAST(count(*) AS BIGINT) AS cnt
          |  FROM lineitem, rows4
          |  WHERE l_suppkey IS NOT NULL
          |  GROUP BY 1, 2
          |), pc AS (
          |  SELECT p.s_suppkey, rows4.r,
          |    CAST(concat('0x', substr(md5(concat(CAST(rows4.r AS VARCHAR), ':', CAST(p.s_suppkey AS VARCHAR))), 1, 15)) AS BIGINT) % 512 AS c
          |  FROM (SELECT DISTINCT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL) p, rows4
          |)
          |SELECT pc.s_suppkey, CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est
          |FROM pc LEFT JOIN cells ON pc.r = cells.r AND pc.c = cells.c
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // The heavy-hitters CONTRACT, not its machinery: the count-min
      // gate is a no-false-negative superset and the re-count is
      // exact, so the result equals the plain GROUP BY + HAVING.
      "q_heavy_hitters" ->
        """WITH t AS (
          |  SELECT unnest(list_filter(string_split_regex(text, ' +'), x -> len(x) > 0)) AS token
          |  FROM documents
          |), n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM t)
          |SELECT token, CAST(count(*) AS BIGINT) AS cnt
          |FROM t, n
          |GROUP BY token, n.total
          |HAVING count(*) >= greatest(CAST(ceil(0.0337::DOUBLE * n.total) AS BIGINT), 1)
          |ORDER BY cnt DESC, token""".stripMargin,

      // Mirrors QuantileSketch at subBits=5: small values (< 32) are
      // their own bin; otherwise (b-4)*32 + (v >> (b-5)) - 32 with
      // b = length(bin(v)) - 1 (exact floor-log2, both engines).
      // Direct build at l_returnflag grain vs Spark's fine-grain
      // rollup: the hash match is the merge-invariance assertion.
      // ceil(q*N) nearest-rank targets; estimates are exact bin
      // lower bounds (pure integers). ::DOUBLE on q literals keeps
      // DuckDB out of DECIMAL arithmetic.
      "q_quantile_sketch" ->
        """WITH v AS (
          |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v
          |  FROM lineitem
          |), bb AS (
          |  SELECT l_returnflag, CASE WHEN v < 32 THEN v
          |    ELSE (length(bin(v)) - 1 - 4) * 32 + ((v >> (length(bin(v)) - 1 - 5)) - 32)
          |    END AS bin
          |  FROM v
          |), sk AS (
          |  SELECT l_returnflag, bin, CAST(count(*) AS BIGINT) AS cnt
          |  FROM bb GROUP BY 1, 2
          |), c AS (
          |  SELECT l_returnflag, bin, cnt,
          |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
          |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
          |  FROM sk
          |), qq AS (
          |  SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q
          |)
          |SELECT c.l_returnflag, qq.q,
          |  CAST(CASE WHEN bin < 32 THEN bin
          |       ELSE ((bin % 32) + 32) << (CAST(bin // 32 AS INT) - 1) END AS BIGINT) AS est
          |FROM c, qq
          |WHERE cum >= greatest(CAST(ceil(qq.q * n) AS BIGINT), 1)
          |  AND cum - cnt < greatest(CAST(ceil(qq.q * n) AS BIGINT), 1)
          |ORDER BY 1, 2""".stripMargin,

      // Mirrors PortableHll: same hash60, low-10-bit register index,
      // trailing-zero rho via bit_count((w & -w) - 1) + 1 — all exact
      // integers — then the classic HLL estimate with linear-counting
      // correction. Built DIRECTLY at event_type grain: matching the
      // Spark side's (event_type, day) -> rollup path is the cross-
      // engine merge-invariance assertion. Constants are ::DOUBLE
      // (DuckDB parses bare decimals as DECIMAL, which would divide
      // under different rounding); the estimate rounds to a whole
      // count, so a last-ulp libm ln() difference cannot surface.
      "q_hll_portable" ->
        """WITH h AS (
          |  SELECT event_type,
          |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          |  FROM events WHERE user_id IS NOT NULL
          |), b AS (
          |  SELECT event_type, CAST(hv % 1024 AS INT) AS reg, hv // 1024 AS w FROM h
          |), r AS (
          |  SELECT event_type, reg,
          |    max(CASE WHEN w = 0 THEN 51
          |             ELSE CAST(bit_count((w & (-w)) - 1) AS INT) + 1 END) AS r
          |  FROM b GROUP BY 1, 2
          |), s AS (
          |  SELECT event_type,
          |    sum(CAST((1::BIGINT << (60 - r)) AS HUGEINT)) AS sp,
          |    CAST(count(*) AS BIGINT) AS np
          |  FROM r GROUP BY 1
          |), e AS (
          |  SELECT event_type, 1024 - np AS zeros,
          |    ((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 1024.0::DOUBLE))
          |      * 1048576.0::DOUBLE * 1152921504606846976.0::DOUBLE)
          |      / CAST(sp + CAST(1024 - np AS HUGEINT) * (1::BIGINT << 60) AS DOUBLE) AS rawE
          |  FROM s
          |)
          |SELECT event_type,
          |  CAST(round(CASE WHEN zeros > 0 AND rawE <= 2560.0::DOUBLE
          |                  THEN 1024.0::DOUBLE * ln(1024.0::DOUBLE / CAST(zeros AS DOUBLE))
          |                  ELSE rawE END) AS BIGINT) AS est_users
          |FROM e ORDER BY event_type""".stripMargin,

      // Mirrors KmvSketch: bottom-k (k=256) of distinct hash60 values
      // built DIRECTLY at event_type grain via row_number — vs the
      // Spark side's fine (event_type, day) build + rollup. Hash match
      // = cross-engine merge-invariance, same contract as
      // q_hll_portable. Estimate: exact count when n < k, else the
      // KMV estimator (k−1)·2⁶⁰ / kth-min; pure integer inputs, one
      // double division, rounded to a whole count.
      "q_kmv_distinct" ->
        """WITH h AS (
          |  SELECT DISTINCT event_type,
          |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          |  FROM events WHERE user_id IS NOT NULL
          |), sk AS (
          |  SELECT event_type, hv,
          |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
          |  FROM h
          |), b AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n, max(hv) AS kth
          |  FROM sk WHERE rn <= 256 GROUP BY 1
          |)
          |SELECT event_type,
          |  CAST(round(CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
          |    ELSE 255.0::DOUBLE * 1152921504606846976.0::DOUBLE
          |         / CAST(greatest(kth, 1) AS DOUBLE) END) AS BIGINT) AS distinct_est
          |FROM b ORDER BY event_type""".stripMargin,

      // Mirrors KmvSketch.pairwiseOverlap: per event-type bottom-k
      // sketches, then for each pair g1 < g2 the bottom-k of the
      // union with membership flags — matches = |both|, J = matches/k,
      // union from the KMV estimator, intersection = J · union. All
      // deterministic (md5 bottom-k), so the approximate estimates
      // replay exactly.
      "q_kmv_jaccard" ->
        """WITH h AS (
          |  SELECT DISTINCT event_type AS g,
          |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          |  FROM events WHERE user_id IS NOT NULL
          |), sk AS (
          |  SELECT g, hv FROM (
          |    SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h
          |  ) WHERE rn <= 256
          |), gs AS (SELECT DISTINCT g FROM sk),
          |pairs AS (
          |  SELECT a.g AS g1, b.g AS g2 FROM gs a, gs b WHERE a.g < b.g
          |), m AS (
          |  SELECT p.g1, p.g2, s.hv,
          |    max(CASE WHEN s.g = p.g1 THEN 1 ELSE 0 END) AS in_a,
          |    max(CASE WHEN s.g = p.g2 THEN 1 ELSE 0 END) AS in_b
          |  FROM pairs p JOIN sk s ON s.g = p.g1 OR s.g = p.g2
          |  GROUP BY 1, 2, 3
          |), uk AS (
          |  SELECT * FROM (
          |    SELECT g1, g2, hv, in_a, in_b,
          |      row_number() OVER (PARTITION BY g1, g2 ORDER BY hv) AS rn
          |    FROM m
          |  ) WHERE rn <= 256
          |), agg AS (
          |  SELECT g1, g2, CAST(count(*) AS BIGINT) AS n_union, max(hv) AS kth,
          |    CAST(sum(in_a * in_b) AS BIGINT) AS matches
          |  FROM uk GROUP BY 1, 2
          |), est AS (
          |  SELECT g1, g2, matches,
          |    CAST(matches AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard,
          |    CAST(round(CASE WHEN n_union < 256 THEN CAST(n_union AS DOUBLE)
          |      ELSE 255.0::DOUBLE * 1152921504606846976.0::DOUBLE
          |           / CAST(greatest(kth, 1) AS DOUBLE) END) AS BIGINT) AS union_est
          |  FROM agg
          |)
          |SELECT g1, g2, matches, jaccard, union_est,
          |  CAST(round(jaccard * CAST(union_est AS DOUBLE)) AS BIGINT) AS inter_est
          |FROM est ORDER BY g1, g2""".stripMargin,

      // Mirrors HashedFeatures.linearScore: same md5-prefix hash60
      // mod 64 bucket, same Fibonacci-spread integer weight vector
      // rebuilt by a list comprehension, bias 3; empty/NULL token
      // lists coalesce to the bare bias in both engines.
      "q_hashed_score" ->
        """WITH w AS (
          |  SELECT list_transform(range(0, 64), i -> (i * 2654435761) % 21 - 10) AS wv
          |), s AS (
          |  SELECT d.doc_id,
          |    CAST(3 + coalesce(list_sum(list_transform(
          |      list_filter(string_split_regex(d.text, ' +'), x -> len(x) > 0),
          |      t -> wv[CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 64 AS INT) + 1])), 0) AS BIGINT) AS score
          |  FROM documents d, w
          |)
          |SELECT doc_id, score, score > 0 AS kept
          |FROM s ORDER BY doc_id""".stripMargin,

      "q_surprisal" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(list_filter(string_split_regex(text, ' +'), x -> len(x) > 0)) AS token
          |  FROM documents
          |), c AS (
          |  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1
          |), tot AS (
          |  SELECT CAST(count(*) AS BIGINT) AS total FROM tok
          |), per AS (
          |  SELECT t.doc_id,
          |    CAST(count(*) AS BIGINT) AS n_tokens,
          |    CAST(sum(length(bin(tot.total)) - length(bin(c.cnt))) AS BIGINT) AS surprisal_bits
          |  FROM tok t JOIN c USING (token), tot
          |  GROUP BY 1
          |)
          |SELECT d.doc_id,
          |  coalesce(p.n_tokens, 0) AS n_tokens,
          |  coalesce(p.surprisal_bits, 0) AS surprisal_bits,
          |  CASE WHEN coalesce(p.n_tokens, 0) > 0
          |       THEN CAST(p.surprisal_bits AS DOUBLE) / CAST(p.n_tokens AS DOUBLE)
          |       ELSE 0.0 END AS avg_surprisal
          |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin,

      // Mirrors Vocab.bigramPerplexity: same row-local bigram build
      // (range(1, len) is end-exclusive ⇔ Spark's guarded sequence),
      // same md5-prefix hash60 on w1||0x1F||w2, same min(w1h) context
      // pick under collisions, same stupid-backoff α=1/2 integer-bit
      // arithmetic (length(bin(x)) both engines), same spine join.
      "q_bigram_ppl" ->
        """WITH tokarr AS (
          |  SELECT doc_id, list_filter(string_split_regex(coalesce(text, ''), ' +'), x -> len(x) > 0) AS t
          |  FROM documents
          |), bg AS (
          |  SELECT doc_id,
          |    CAST(concat('0x', substr(md5(concat(t[i], chr(31), t[i+1])), 1, 15)) AS BIGINT) AS bh,
          |    CAST(concat('0x', substr(md5(t[i]), 1, 15)) AS BIGINT) AS w1h,
          |    CAST(concat('0x', substr(md5(t[i+1]), 1, 15)) AS BIGINT) AS w2h
          |  FROM tokarr, unnest(range(1, len(t))) AS u(i)
          |), uni AS (
          |  SELECT CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS wh,
          |         CAST(count(*) AS BIGINT) AS u_cnt
          |  FROM (SELECT unnest(t) AS tok FROM tokarr WHERE doc_id % 2 = 0)
          |  GROUP BY 1
          |), tot AS (
          |  SELECT greatest(CAST(coalesce(sum(u_cnt), 0) AS BIGINT), 1) AS n_total FROM uni
          |), stats AS (
          |  SELECT b.bh, b.b_cnt, u.u_cnt AS ctx_cnt
          |  FROM (SELECT bh, CAST(count(*) AS BIGINT) AS b_cnt, min(w1h) AS ctx_h
          |        FROM bg WHERE doc_id % 2 = 0 GROUP BY 1) b
          |  JOIN uni u ON u.wh = b.ctx_h
          |), scored AS (
          |  SELECT g.doc_id,
          |    CASE WHEN s.b_cnt IS NOT NULL THEN length(bin(s.ctx_cnt)) - length(bin(s.b_cnt))
          |         WHEN u2.u_cnt IS NOT NULL THEN 1 + length(bin(t.n_total)) - length(bin(u2.u_cnt))
          |         ELSE length(bin(t.n_total)) END AS bits,
          |    CASE WHEN s.b_cnt IS NULL AND u2.u_cnt IS NOT NULL THEN 1 ELSE 0 END AS is_backoff,
          |    CASE WHEN u2.u_cnt IS NULL THEN 1 ELSE 0 END AS is_oov
          |  FROM bg g
          |  LEFT JOIN stats s ON s.bh = g.bh
          |  LEFT JOIN uni u2 ON u2.wh = g.w2h, tot t
          |), per AS (
          |  SELECT doc_id,
          |    CAST(count(*) AS BIGINT) AS n_bigrams,
          |    CAST(sum(bits) AS BIGINT) AS ppl_bits,
          |    CAST(sum(is_backoff) AS BIGINT) AS n_backoff,
          |    CAST(sum(is_oov) AS BIGINT) AS n_oov
          |  FROM scored GROUP BY 1
          |)
          |SELECT d.doc_id,
          |  coalesce(p.n_bigrams, 0) AS n_bigrams,
          |  coalesce(p.ppl_bits, 0) AS ppl_bits,
          |  coalesce(p.n_backoff, 0) AS n_backoff,
          |  coalesce(p.n_oov, 0) AS n_oov,
          |  CASE WHEN coalesce(p.n_bigrams, 0) > 0
          |       THEN CAST(p.ppl_bits AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE)
          |       ELSE 0.0 END AS avg_bits
          |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin,

      // Mirrors SubstringDedup.removeRepeatedNgrams(n=3): same hash60
      // gram identity, same (doc_id, pos) first-occurrence rule
      // (row_number rn=1 ⇔ Spark's min(struct)), same mask union and
      // single-space reassembly. Token-less docs ride the tok spine.
      "q_substring_dedup" ->
        s"""WITH tok AS (
           |  SELECT doc_id,
           |    coalesce(list_filter(string_split_regex(text, ' +'), x -> len(x) > 0),
           |             CAST([] AS VARCHAR[])) AS toks
           |  FROM documents
           |), occ AS (
           |  SELECT doc_id, i - 1 AS pos,
           |    ${duckHash60.format("toks[i] || '_' || toks[i+1] || '_' || toks[i+2]")} AS h
           |  FROM tok, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)
           |), ranked AS (
           |  SELECT doc_id, pos,
           |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
           |  FROM occ
           |), cov AS (
           |  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 2)) AS idx
           |  FROM ranked WHERE rn >= 2
           |), pos AS (
           |  SELECT doc_id, i - 1 AS idx, toks[i] AS token
           |  FROM tok, unnest(generate_series(1, len(toks))) AS u(i)
           |), kept AS (
           |  SELECT p.doc_id,
           |    string_agg(p.token, ' ' ORDER BY p.idx) AS text_clean,
           |    count(*) AS n_kept
           |  FROM pos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.idx = p.idx
           |  WHERE c.idx IS NULL
           |  GROUP BY 1
           |)
           |SELECT t.doc_id,
           |  coalesce(k.text_clean, '') AS text_clean,
           |  CAST(len(t.toks) AS BIGINT) AS n_tokens,
           |  CAST(len(t.toks) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
           |FROM tok t LEFT JOIN kept k USING (doc_id)""".stripMargin,

      // cum_share divides two exactly-aggregated BIGINTs — the double
      // is bit-identical across engines.
      "q_vocab_coverage" ->
        """WITH tok AS (
          |  SELECT unnest(string_split_regex(text, ' +')) AS token FROM documents
          |), c AS (
          |  SELECT token, count(*) AS cnt FROM tok WHERE len(token) > 0 GROUP BY 1
          |), t AS (
          |  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c
          |), r AS (
          |  SELECT token, cnt,
          |    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
          |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, token) AS BIGINT) AS cum
          |  FROM c
          |)
          |SELECT token, cnt, rank,
          |  CAST(cum AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE) AS cum_share
          |FROM r WHERE rank <= 50""".stripMargin,

      "q_dedup_exact" ->
        """WITH u AS (
          |  SELECT doc_id, text, lang FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000 AS doc_id, text, lang FROM documents
          |)
          |SELECT md5(text) AS content_hash, count(*) AS dup_count,
          |  min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang
          |FROM u GROUP BY 1""".stripMargin,

      "q_ngram_jaccard" -> exactJaccardSql,
      "q_minhash_lsh" -> exactJaccardSql,
      "q_incr_neardup" -> incrementalJaccardSql,

      "q_contamination" ->
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents
          |), sh AS (
          |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
          |    i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])) AS shingles
          |  FROM tok
          |), train AS (
          |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 50 <> 0
          |), ev AS (
          |  SELECT doc_id, len(shingles) AS n_sh, shingles FROM sh WHERE doc_id % 50 = 0
          |), hits AS (
          |  SELECT e.doc_id, count(*) AS n_cont
          |  FROM (SELECT doc_id, unnest(shingles) AS s FROM ev) e
          |  JOIN train t ON e.s = t.s
          |  GROUP BY 1
          |)
          |SELECT ev.doc_id, CAST(ev.n_sh AS INT) AS n_shingles,
          |  CAST(coalesce(h.n_cont, 0) AS BIGINT) AS n_contaminated,
          |  CASE WHEN ev.n_sh > 0 THEN coalesce(h.n_cont, 0) * 1.0 / ev.n_sh ELSE 0.0 END AS containment,
          |  (CASE WHEN ev.n_sh > 0 THEN coalesce(h.n_cont, 0) * 1.0 / ev.n_sh ELSE 0.0 END) >= 0.8 AS is_contaminated
          |FROM ev LEFT JOIN hits h ON ev.doc_id = h.doc_id""".stripMargin,

      // Same shingling and 1-in-50 split; train-side df cap mirrored
      // (a no-op at this scale, but the formula must match), then
      // per-pair counts, min-common filter, top-3 window.
      "q_contam_sources" ->
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents
          |), sh AS (
          |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-2),
          |    i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])) AS shingles
          |  FROM tok
          |), tr AS (
          |  SELECT doc_id AS train_id, unnest(shingles) AS s FROM sh WHERE doc_id % 50 <> 0
          |), trc AS (
          |  SELECT train_id, s FROM (
          |    SELECT train_id, s, count(*) OVER (PARTITION BY s) AS df FROM tr
          |  ) WHERE df <= 1000000
          |), ev AS (
          |  SELECT doc_id AS eval_id, unnest(shingles) AS s FROM sh WHERE doc_id % 50 = 0
          |), pairs AS (
          |  SELECT ev.eval_id, trc.train_id, count(*) AS n_common
          |  FROM ev JOIN trc ON ev.s = trc.s
          |  GROUP BY 1, 2
          |  HAVING count(*) >= 3
          |)
          |SELECT eval_id, train_id, CAST(n_common AS BIGINT) AS n_common, CAST(rnk AS INT) AS rnk
          |FROM (
          |  SELECT eval_id, train_id, n_common,
          |    row_number() OVER (PARTITION BY eval_id ORDER BY n_common DESC, train_id) AS rnk
          |  FROM pairs
          |)
          |WHERE rnk <= 3""".stripMargin,

      "q_profile" ->
        """SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
          |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
          |  CAST(min(event_id) AS DOUBLE) AS min_val, CAST(max(event_id) AS DOUBLE) AS max_val
          |FROM events
          |UNION ALL
          |SELECT 'user_id', CAST(count(*) AS BIGINT),
          |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |  CAST(count(DISTINCT user_id) AS BIGINT),
          |  CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)
          |FROM events
          |UNION ALL
          |SELECT 'value', CAST(count(*) AS BIGINT),
          |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |  CAST(count(DISTINCT value) AS BIGINT),
          |  CAST(min(value) AS DOUBLE), CAST(max(value) AS DOUBLE)
          |FROM events""".stripMargin,

      "q_tfidf_terms" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(string_split_regex(text, ' +')) AS term FROM documents
          |), tf AS (
          |  SELECT doc_id, term, count(*) AS tf FROM tok WHERE len(term) > 0 GROUP BY 1, 2
          |), dft AS (
          |  SELECT term, count(*) AS df FROM tf GROUP BY 1
          |), n AS (
          |  SELECT count(*) AS n FROM documents
          |), s AS (
          |  SELECT t.doc_id, t.term, t.tf, d.df,
          |    t.tf * (n.n + 1.0) / (d.df + 1.0) AS tfidf
          |  FROM tf t JOIN dft d USING (term) CROSS JOIN n
          |), r AS (
          |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM s
          |)
          |SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INT) AS rnk
          |FROM r WHERE rnk <= 5""".stripMargin,

      "q_repetition" ->
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents
          |), g AS (
          |  SELECT doc_id, greatest(len(toks)-2, 0) AS n_ngrams,
          |    CASE WHEN len(toks) >= 3 THEN len(list_distinct(list_transform(
          |      generate_series(1, len(toks)-2),
          |      i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2]))) ELSE 0 END AS n_distinct
          |  FROM tok
          |)
          |SELECT doc_id, CAST(n_ngrams AS INT) AS n_ngrams,
          |  CAST(n_distinct AS INT) AS n_distinct,
          |  CASE WHEN n_ngrams > 0 THEN 1.0 - n_distinct * 1.0 / n_ngrams ELSE 0.0 END AS rep_ratio
          |FROM g""".stripMargin,

      "q_chunk_tokens" ->
        """WITH t AS (
          |  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents
          |), s AS (
          |  SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS start FROM t
          |)
          |SELECT doc_id, CAST(start // 24 AS INT) AS chunk_idx,
          |  CAST(len(toks[start+1 : start+32]) AS INT) AS n_tokens,
          |  array_to_string(toks[start+1 : start+32], ' ') AS chunk_text
          |FROM s""".stripMargin,

      "q_redact" ->
        """WITH p AS (
          |  SELECT doc_id, text || ' contact user' || doc_id || '@mail.example.com ip 10.0.'
          |    || (doc_id % 256) || '.7 tel +62 812-3456-789' AS pii
          |  FROM documents
          |)
          |SELECT doc_id,
          |  regexp_replace(regexp_replace(regexp_replace(pii,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
          |    '\+?\d{2,3}([- ]\d{3,6}){2,3}', '[PHONE]', 'g') AS redacted,
          |  CAST(len(regexp_extract_all(pii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
          |  CAST(len(regexp_extract_all(pii, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
          |  CAST(len(regexp_extract_all(pii, '\+?\d{2,3}([- ]\d{3,6}){2,3}')) AS INT) AS n_phones
          |FROM p""".stripMargin,

      "q_top_ngrams" ->
        """WITH tok AS (
          |  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents
          |), sh AS (
          |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-1),
          |    i -> toks[i] || '_' || toks[i+1])) AS grams
          |  FROM tok
          |), e AS (
          |  SELECT unnest(grams) AS ngram FROM sh
          |)
          |SELECT ngram, count(*) AS n_docs
          |FROM e GROUP BY 1
          |ORDER BY n_docs DESC, ngram
          |LIMIT 20""".stripMargin,

      // Mirrors Multimodal.decodeStub exactly: payload = utf8(text),
      // md5 digest bytes u0..u10 drive dims/rate/features.
      "q_media_features" ->
        """WITH m AS (
          |  SELECT doc_id AS media_id,
          |         (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
          |         md5(coalesce(text, '')) AS d,
          |         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes
          |  FROM documents
          |), u AS (
          |  SELECT media_id, kind, n_bytes,
          |         ('0x' || substr(d, 1, 2))::INT AS u0,
          |         ('0x' || substr(d, 3, 2))::INT AS u1,
          |         ('0x' || substr(d, 5, 2))::INT AS u2,
          |         ('0x' || substr(d, 7, 2))::INT AS u3,
          |         ('0x' || substr(d, 9, 2))::INT AS u4,
          |         ('0x' || substr(d, 11, 2))::INT AS u5,
          |         ('0x' || substr(d, 13, 2))::INT AS u6,
          |         ('0x' || substr(d, 15, 2))::INT AS u7,
          |         ('0x' || substr(d, 17, 2))::INT AS u8,
          |         ('0x' || substr(d, 19, 2))::INT AS u9,
          |         ('0x' || substr(d, 21, 2))::INT AS u10
          |  FROM m
          |)
          |SELECT media_id, kind, n_bytes,
          |       CASE WHEN kind = 'audio' THEN NULL ELSE 64 + u0 * 16 END AS width,
          |       CASE WHEN kind = 'audio' THEN NULL ELSE 64 + u1 * 16 END AS height,
          |       CASE WHEN kind = 'audio' THEN ([8000,16000,22050,44100])[CAST(u2 % 4 + 1 AS INT)] END AS sample_rate,
          |       u3 / 255.0 AS f0, u4 / 255.0 AS f1, u5 / 255.0 AS f2, u6 / 255.0 AS f3,
          |       u7 / 255.0 AS f4, u8 / 255.0 AS f5, u9 / 255.0 AS f6, u10 / 255.0 AS f7
          |FROM u""".stripMargin,

      // The REAL-decode oracle never parses the BMP: it recomputes
      // ImageCodec's integer-derived features (class doc formula)
      // straight from the same doc_id pixel arithmetic — integer
      // sums with a single IEEE double division each, bit-identical
      // in both engines. n_bytes = 54-byte header + 8-byte row.
      "q_media_decode" ->
        """WITH px AS (
          |  SELECT doc_id AS media_id,
          |    doc_id % 256 AS r1, (doc_id * 3) % 256 AS g1, (doc_id * 5) % 256 AS b1,
          |    (doc_id * 7) % 256 AS r2, (doc_id * 11) % 256 AS g2, (doc_id * 13) % 256 AS b2
          |  FROM documents
          |)
          |SELECT media_id, CAST(62 AS BIGINT) AS n_bytes,
          |  CAST(2 AS INT) AS width, CAST(1 AS INT) AS height,
          |  (r1 + r2) / 510.0 AS f0, (g1 + g2) / 510.0 AS f1, (b1 + b2) / 510.0 AS f2,
          |  (r1 + g1 + b1 + r2 + g2 + b2) / 1530.0 AS f3,
          |  least(r1 + g1 + b1, r2 + g2 + b2) / 765.0 AS f4,
          |  greatest(r1 + g1 + b1, r2 + g2 + b2) / 765.0 AS f5,
          |  (CASE WHEN r1 + g1 + b1 >= 383 THEN 1 ELSE 0 END
          |   + CASE WHEN r2 + g2 + b2 >= 383 THEN 1 ELSE 0 END) / 2.0 AS f6,
          |  CAST(2 AS DOUBLE) AS f7
          |FROM px
          |ORDER BY media_id""".stripMargin,

      // AudioCodec's integer-derived features (class doc formula)
      // from the same doc_id sample arithmetic: u = (doc_id·p) mod
      // 2^16 stored little-endian, decoded back to signed 16-bit,
      // integer sums + one IEEE division each. n_bytes = 44-byte
      // header + 8 bytes of samples.
      // dHash replica: pixel luminances from the channel formula,
      // the 10-sample/7-row floor-scaled grid, right>left bit sets
      // at position y*9+x (63 bits — the engine's signed-long-safe
      // default).
      "q_image_dhash" ->
        """WITH px AS (
          |  SELECT d.doc_id, i.ix, i.iy,
          |    (d.doc_id*(6*(i.iy*4+i.ix)+3))%256
          |    + (d.doc_id*(6*(i.iy*4+i.ix)+5))%256
          |    + (d.doc_id*(6*(i.iy*4+i.ix)+7))%256 AS l
          |  FROM documents d,
          |    (SELECT a.ix, b.iy
          |     FROM (VALUES (0),(1),(2),(3)) a(ix), (VALUES (0),(1)) b(iy)) i
          |), g AS (
          |  SELECT x.x, y.y,
          |    (x.x*4)//10 AS lgx, ((x.x+1)*4)//10 AS rgx, (y.y*2)//7 AS gy
          |  FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8)) x(x),
          |       (VALUES (0),(1),(2),(3),(4),(5),(6)) y(y)
          |), bits AS (
          |  SELECT p1.doc_id,
          |    CASE WHEN p2.l > p1.l
          |         THEN (CAST(1 AS BIGINT) << (g.y*9 + g.x)) ELSE 0 END AS bit
          |  FROM g
          |  JOIN px p1 ON p1.ix = g.lgx AND p1.iy = g.gy
          |  JOIN px p2 ON p2.doc_id = p1.doc_id AND p2.ix = g.rgx AND p2.iy = g.gy
          |)
          |SELECT doc_id AS media_id, CAST(4 AS INT) AS width, CAST(2 AS INT) AS height,
          |  CAST(SUM(bit) AS BIGINT) AS dhash
          |FROM bits GROUP BY doc_id ORDER BY media_id""".stripMargin,

      // Near-dup images: the +10 brightness shift cancels in every
      // luminance compare, so a copy's hash EQUALS its base's —
      // hash once per doc, union the two id spaces, band-join, and
      // verify with xor-popcount (natural cross-doc collisions are
      // computed identically on both engines).
      "q_image_neardup" ->
        """WITH px AS (
          |  SELECT d.doc_id, i.ix, i.iy,
          |    (d.doc_id*(6*(i.iy*8+i.ix)+3))%199
          |    + (d.doc_id*(6*(i.iy*8+i.ix)+5))%211
          |    + (d.doc_id*(6*(i.iy*8+i.ix)+7))%223 AS l
          |  FROM documents d,
          |    (SELECT a.ix, b.iy
          |     FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) a(ix),
          |          (VALUES (0),(1),(2),(3)) b(iy)) i
          |), g AS (
          |  SELECT x.x, y.y,
          |    (x.x*8)//10 AS lgx, ((x.x+1)*8)//10 AS rgx, (y.y*4)//7 AS gy
          |  FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8)) x(x),
          |       (VALUES (0),(1),(2),(3),(4),(5),(6)) y(y)
          |), h AS (
          |  SELECT p1.doc_id,
          |    CAST(SUM(CASE WHEN p2.l > p1.l
          |         THEN (CAST(1 AS BIGINT) << (g.y*9 + g.x)) ELSE 0 END) AS BIGINT) AS dh
          |  FROM g
          |  JOIN px p1 ON p1.ix = g.lgx AND p1.iy = g.gy
          |  JOIN px p2 ON p2.doc_id = p1.doc_id AND p2.ix = g.rgx AND p2.iy = g.gy
          |  GROUP BY p1.doc_id
          |), media AS (
          |  SELECT doc_id AS media_id, dh FROM h
          |  UNION ALL
          |  SELECT doc_id + 100000, dh FROM h WHERE doc_id % 5 = 0
          |), sig AS (
          |  SELECT media_id, dh, b.b,
          |    CASE b.b WHEN 0 THEN dh & 65535
          |             WHEN 1 THEN (dh >> 16) & 65535
          |             WHEN 2 THEN (dh >> 32) & 65535
          |             ELSE (dh >> 48) & 32767 END AS bval
          |  FROM media, (VALUES (0),(1),(2),(3)) b(b)
          |), cand AS (
          |  SELECT DISTINCT x.media_id AS a_id, x.dh AS ah, y.media_id AS b_id, y.dh AS bh
          |  FROM sig x JOIN sig y
          |    ON x.b = y.b AND x.bval = y.bval AND x.media_id < y.media_id
          |)
          |SELECT a_id, b_id, CAST(bit_count(xor(ah, bh)) AS INT) AS hamming
          |FROM cand WHERE bit_count(xor(ah, bh)) <= 3
          |ORDER BY a_id, b_id""".stripMargin,

      "q_audio_decode" ->
        """WITH sv AS (
          |  SELECT d.doc_id, m.k,
          |    CASE WHEN ((d.doc_id * m.p) % 65536) < 32768
          |         THEN ((d.doc_id * m.p) % 65536)
          |         ELSE ((d.doc_id * m.p) % 65536) - 65536 END AS s
          |  FROM documents d, (VALUES (0, 7), (1, 31), (2, 131), (3, 8191)) m(k, p)
          |), agg AS (
          |  SELECT doc_id,
          |    SUM(ABS(s)) AS sabs, SUM(s * s) AS ssq,
          |    MIN(s) AS smin, MAX(s) AS smax,
          |    SUM(CASE WHEN ABS(s) >= 32256 THEN 1 ELSE 0 END) AS nclip
          |  FROM sv GROUP BY doc_id
          |), zc AS (
          |  SELECT a.doc_id,
          |    SUM(CASE WHEN (a.s >= 0) <> (b.s >= 0) THEN 1 ELSE 0 END) AS z
          |  FROM sv a JOIN sv b ON b.doc_id = a.doc_id AND b.k = a.k + 1
          |  GROUP BY a.doc_id
          |)
          |SELECT g.doc_id AS media_id, CAST(52 AS BIGINT) AS n_bytes,
          |  CAST(8000 AS INT) AS sample_rate,
          |  g.sabs / (4 * 32768.0) AS f0,
          |  g.ssq / (4 * 32768.0 * 32768.0) AS f1,
          |  g.smin / 32768.0 AS f2,
          |  g.smax / 32768.0 AS f3,
          |  z.z / 3.0 AS f4,
          |  g.nclip / 4.0 AS f5,
          |  4 / 8000.0 AS f6,
          |  CAST(1 AS DOUBLE) AS f7
          |FROM agg g JOIN zc z ON z.doc_id = g.doc_id
          |ORDER BY media_id""".stripMargin,

      // Frame features: the same sample formula bucketed into
      // frames of 2; crossings join only pairs inside one frame.
      "q_audio_frames" ->
        """WITH sv AS (
          |  SELECT d.doc_id, m.k,
          |    CASE WHEN ((d.doc_id * m.p) % 65536) < 32768
          |         THEN ((d.doc_id * m.p) % 65536)
          |         ELSE ((d.doc_id * m.p) % 65536) - 65536 END AS s
          |  FROM documents d, (VALUES (0, 7), (1, 31), (2, 131), (3, 8191)) m(k, p)
          |), agg AS (
          |  SELECT doc_id, k // 2 AS frame_idx,
          |    SUM(s * s) AS energy, SUM(ABS(s)) AS sum_abs,
          |    MAX(s) AS peak, MIN(s) AS trough
          |  FROM sv GROUP BY 1, 2
          |), zc AS (
          |  SELECT a.doc_id, a.k // 2 AS frame_idx,
          |    SUM(CASE WHEN (a.s >= 0) <> (b.s >= 0) THEN 1 ELSE 0 END) AS z
          |  FROM sv a JOIN sv b
          |    ON b.doc_id = a.doc_id AND b.k = a.k + 1 AND (b.k // 2) = (a.k // 2)
          |  GROUP BY 1, 2
          |)
          |SELECT g.doc_id AS media_id, CAST(g.frame_idx AS INT) AS frame_idx,
          |  CAST(2 AS INT) AS n,
          |  CAST(g.energy AS BIGINT) AS energy,
          |  CAST(g.sum_abs AS BIGINT) AS sum_abs,
          |  CAST(g.peak AS INT) AS peak, CAST(g.trough AS INT) AS trough,
          |  CAST(z.z AS BIGINT) AS crossings
          |FROM agg g JOIN zc z ON z.doc_id = g.doc_id AND z.frame_idx = g.frame_idx
          |ORDER BY media_id, frame_idx""".stripMargin,

      // Mirrors Multimodal.resizeStub(224, 224) over the decode stub's
      // md5-derived dimensions.
      "q_media_resize" ->
        """WITH m AS (
          |  SELECT doc_id AS media_id,
          |         (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
          |         md5(coalesce(text, '')) AS d
          |  FROM documents
          |), u AS (
          |  SELECT media_id, kind,
          |         ('0x' || substr(d, 1, 2))::INT AS u0,
          |         ('0x' || substr(d, 3, 2))::INT AS u1
          |  FROM m
          |)
          |SELECT media_id, kind,
          |       CASE WHEN kind = 'audio' THEN NULL ELSE 64 + u0 * 16 END AS width,
          |       CASE WHEN kind = 'audio' THEN NULL ELSE 64 + u1 * 16 END AS height,
          |       224 AS target_width, 224 AS target_height,
          |       CASE WHEN kind = 'audio' THEN NULL
          |            ELSE least(224.0 / (64 + u0 * 16), 224.0 / (64 + u1 * 16)) END AS scale
          |FROM u""".stripMargin,

      // Mirrors Multimodal.frameSampleStub (everyK=4, maxFrames=8):
      // video kind = doc_id%3==2; hash = md5(text || ':' || frame_idx).
      "q_frame_sample" ->
        """WITH v AS (
          |  SELECT doc_id AS media_id, text AS t,
          |         octet_length(encode(text)) % 240 + 16 AS n_frames
          |  FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL
          |), e AS (
          |  SELECT media_id, t,
          |         unnest(generate_series(0, CAST(least((n_frames - 1) // 4, 7) AS BIGINT))) AS j
          |  FROM v
          |)
          |SELECT media_id,
          |       CAST(j * 4 AS INT) AS frame_idx,
          |       md5(t || ':' || CAST(j * 4 AS VARCHAR)) AS frame_hash
          |FROM e""".stripMargin,

      // Mirrors Similarity.lshTopK (nPlanes=6, k=3, queries =
      // vec_id < 50): the ±1 hyperplanes are hash60("p:i")-derived
      // constants, so DuckDB rebuilds the same 6×64 sign matrix (384
      // rows, computed once) and reproduces the exact bucketing.
      "q_lsh_topk" ->
        """WITH qz AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
          |  FROM embeddings
          |), nrm AS (
          |  SELECT vec_id, v,
          |    sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
          |  FROM qz
          |), planes AS (
          |  SELECT p.p, i.i,
          |    CASE WHEN CAST('0x' || substr(md5(p.p || ':' || i.i), 1, 15) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END AS s
          |  FROM (SELECT unnest(generate_series(0, 5)) AS p) p,
          |       (SELECT unnest(generate_series(0, 63)) AS i) i
          |), proj AS (
          |  SELECT n.vec_id, pl.p, CAST(SUM(n.v[pl.i + 1] * pl.s) AS BIGINT) AS dot
          |  FROM nrm n JOIN planes pl ON pl.i < len(n.v)
          |  GROUP BY 1, 2
          |), bkt AS (
          |  SELECT vec_id, CAST(SUM(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
          |  FROM proj GROUP BY 1
          |), scored AS (
          |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
          |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qn.v)), i -> qn.v[i]*cn.v[i])) AS BIGINT) AS DOUBLE)/(qn.nv*cn.nv) AS cosine
          |  FROM bkt q JOIN bkt c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
          |  JOIN nrm qn ON qn.vec_id = q.vec_id
          |  JOIN nrm cn ON cn.vec_id = c.vec_id
          |  WHERE q.vec_id < 50
          |)
          |SELECT query_id, corpus_id, cosine, CAST(rnk AS INT) AS rnk
          |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rnk
          |      FROM scored)
          |WHERE rnk <= 3""".stripMargin,

      // Mirrors Similarity.ivfTopK (nLists=16, nProbe=4, k=3,
      // queries = vec_id < 50): same quantization, same deterministic
      // centroid set (vec_id < 16), same tie-breaks — the oracle
      // reproduces the exact approximation, not just its intent.
      "q_ivf_topk" ->
        """WITH qz AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
          |  FROM embeddings
          |), nrm AS (
          |  SELECT vec_id, v,
          |    sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
          |  FROM qz
          |), cent AS (
          |  SELECT vec_id AS cid, v AS cv, nv AS cn FROM nrm WHERE vec_id < 16
          |), cscore AS (
          |  SELECT n.vec_id, c.cid,
          |    CAST(CAST(list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i]*c.cv[i])) AS BIGINT) AS DOUBLE)/(n.nv*c.cn) AS cos,
          |    row_number() OVER (PARTITION BY n.vec_id
          |                       ORDER BY CAST(CAST(list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i]*c.cv[i])) AS BIGINT) AS DOUBLE)/(n.nv*c.cn) DESC, c.cid ASC) AS rn
          |  FROM nrm n, cent c
          |), corpus_assign AS (
          |  SELECT vec_id AS corpus_id, cid AS list_id FROM cscore WHERE rn = 1
          |), probes AS (
          |  SELECT vec_id AS query_id, cid AS list_id FROM cscore WHERE rn <= 4 AND vec_id < 50
          |), cand AS (
          |  SELECT p.query_id, a.corpus_id
          |  FROM probes p JOIN corpus_assign a ON a.list_id = p.list_id
          |  WHERE a.corpus_id != p.query_id
          |), scored AS (
          |  SELECT c.query_id, c.corpus_id,
          |    CAST(CAST(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i]*t.v[i])) AS BIGINT) AS DOUBLE)/(q.nv*t.nv) AS cosine
          |  FROM cand c
          |  JOIN nrm q ON q.vec_id = c.query_id
          |  JOIN nrm t ON t.vec_id = c.corpus_id
          |)
          |SELECT query_id, corpus_id, cosine, CAST(rnk AS INT) AS rnk
          |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rnk
          |      FROM scored)
          |WHERE rnk <= 3""".stripMargin,

      "q_kmeans" -> kmeansSql,

      "q_semdedup" -> semdedupSql,

      "q_simhash" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(list_distinct(string_split_regex(text, ' +'))) AS t FROM documents
           |), h AS (
           |  SELECT doc_id, ${duckHash60.format("t")} AS hv FROM tok
           |), bits AS (
           |  SELECT doc_id, i,
           |    sum(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
           |  FROM h, (SELECT unnest(generate_series(0, 59)) AS i)
           |  GROUP BY 1,2
           |)
           |SELECT doc_id,
           |  CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
           |FROM bits GROUP BY 1""".stripMargin,

      "q_cosine_topk" ->
        """WITH qz AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
          |  FROM embeddings
          |), s AS (
          |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
          |    CAST(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i]*c.v[i])) AS BIGINT) AS dot,
          |    CAST(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i]*q.v[i])) AS BIGINT) AS nq,
          |    CAST(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i]*c.v[i])) AS BIGINT) AS nc
          |  FROM qz q, qz c
          |  WHERE q.vec_id < 100 AND q.vec_id != c.vec_id
          |), scored AS (
          |  SELECT query_id, corpus_id,
          |    CAST(dot AS DOUBLE)/(sqrt(CAST(nq AS DOUBLE))*sqrt(CAST(nc AS DOUBLE))) AS cosine
          |  FROM s
          |)
          |SELECT query_id, corpus_id, cosine,
          |  CAST(rnk AS INT) AS rnk
          |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rnk
          |      FROM scored)
          |WHERE rnk <= 3""".stripMargin,

      // CDC apply: arg_max (DuckDB) ≡ max_by (Spark) picks the
      // latest entry per key (sequences are unique per key by
      // construction); the full-outer + delete filter replays the
      // MERGE. Sentinel payloads on D rows avoid arg_max NULL rules.
      "q_cdc_apply" ->
        """WITH s AS (
          |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
          |), log AS (
          |  SELECT o_orderkey, 'U' AS op, 2 AS seq,
          |         o_totalprice + 1 AS o_totalprice, o_orderstatus
          |  FROM orders WHERE o_orderkey % 5 = 0
          |  UNION ALL
          |  SELECT o_orderkey, 'D', 3, CAST(0.0 AS DOUBLE), 'X'
          |  FROM orders WHERE o_orderkey % 7 = 0
          |  UNION ALL
          |  SELECT o_orderkey + 100000000, 'I', 1, CAST(1.5 AS DOUBLE), 'N'
          |  FROM orders WHERE o_orderkey % 11 = 0
          |), win AS (
          |  SELECT o_orderkey, arg_max(op, seq) AS op,
          |         arg_max(o_totalprice, seq) AS p, arg_max(o_orderstatus, seq) AS st
          |  FROM log GROUP BY 1
          |)
          |SELECT COALESCE(w.o_orderkey, s.o_orderkey) AS o_orderkey,
          |  CASE WHEN w.o_orderkey IS NOT NULL THEN w.p ELSE s.o_totalprice END AS o_totalprice,
          |  CASE WHEN w.o_orderkey IS NOT NULL THEN w.st ELSE s.o_orderstatus END AS o_orderstatus
          |FROM s FULL OUTER JOIN win w ON s.o_orderkey = w.o_orderkey
          |WHERE w.o_orderkey IS NULL OR w.op != 'D'
          |ORDER BY o_orderkey""".stripMargin,

      // A-ES: u = (hash60('aes:'||key)+1)/2^60 (both bounds exact in
      // doubles), selection key ln(u)/w; ln's potential 1-ulp
      // divergence cannot flip the top-k here because distinct u's
      // differ at random magnitudes (verified empirically both SFs).
      "q_weighted_sample" ->
        """WITH d AS (
          |  SELECT doc_id, n_chars,
          |    ln(((CAST(concat('0x', substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) >> 7) + 1)
          |       / CAST(9007199254740992 AS DOUBLE)) / CAST(n_chars AS DOUBLE) AS aes
          |  FROM documents
          |  WHERE n_chars IS NOT NULL AND n_chars > 0
          |)
          |SELECT doc_id, n_chars
          |FROM (SELECT * FROM d ORDER BY aes DESC, doc_id LIMIT 32)
          |ORDER BY doc_id""".stripMargin,

      // Jaro-Winkler: DuckDB's jaro_winkler_similarity implements
      // the same Winkler-1990 definition (0.7 boost threshold,
      // p=0.1, prefix cap 4 — verified on the textbook pairs);
      // nano-unit rounding absorbs ulp-order differences.
      "q_jaro_rank" ->
        """WITH dirty AS (
          |  SELECT p_partkey AS dirty_id, replace(p_name, 'e', '') AS dirty_name,
          |    regexp_replace(lower(trim(replace(p_name, 'e', ''))), '[aeiou ]', '', 'g') AS blk
          |  FROM part WHERE p_partkey % 11 = 0
          |), cat AS (
          |  SELECT p_partkey, p_name,
          |    regexp_replace(lower(trim(p_name)), '[aeiou ]', '', 'g') AS blk
          |  FROM part
          |)
          |SELECT d.dirty_id, c.p_partkey,
          |  CAST(round(jaro_winkler_similarity(d.dirty_name, c.p_name) * CAST(1000000000.0 AS DOUBLE)) AS BIGINT) AS jw_e9
          |FROM dirty d JOIN cat c ON d.blk = c.blk
          |WHERE CAST(round(jaro_winkler_similarity(d.dirty_name, c.p_name) * CAST(1000000000.0 AS DOUBLE)) AS BIGINT) >= 900000000
          |ORDER BY d.dirty_id, c.p_partkey""".stripMargin,

      // Inverted-index search: tokens with raw 0-based offsets
      // (empties dropped AFTER position assignment, matching the
      // Spark side); AND = HAVING count over distinct (doc, token),
      // phrase = positional self-join at offset + 1.
      "q_search_and" ->
        """WITH t AS (
          |  SELECT DISTINCT doc_id, u['token'] AS token FROM (
          |    SELECT doc_id, unnest(list_transform(generate_series(1, len(sp)), i -> {'token': sp[i], 'pos': i - 1})) AS u
          |    FROM (SELECT doc_id, string_split_regex(text, ' +') AS sp FROM documents)
          |  ) WHERE len(u['token']) > 0
          |)
          |SELECT doc_id FROM t
          |WHERE token IN ('batch', 'scan', 'merge')
          |GROUP BY doc_id HAVING count(*) = 3
          |ORDER BY doc_id""".stripMargin,

      "q_search_phrase" ->
        """WITH t AS (
          |  SELECT doc_id, u['token'] AS token, u['pos'] AS pos FROM (
          |    SELECT doc_id, unnest(list_transform(generate_series(1, len(sp)), i -> {'token': sp[i], 'pos': i - 1})) AS u
          |    FROM (SELECT doc_id, string_split_regex(text, ' +') AS sp FROM documents)
          |  ) WHERE len(u['token']) > 0
          |)
          |SELECT a.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
          |FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.token = 'join' AND b.pos = a.pos + 1
          |WHERE a.token = 'hash'
          |GROUP BY 1
          |ORDER BY a.doc_id""".stripMargin,

      // BM25: identical arithmetic shape and parenthesization as the
      // Scala side (every literal CAST to DOUBLE — DuckDB parses bare
      // decimals as DECIMAL, whose division semantics differ); the
      // per-doc score is the same fixed-order chain of single-row
      // conditional sums, so double addition order matches too.
      "q_bm25" ->
        """WITH t AS (
          |  SELECT doc_id, u['token'] AS token FROM (
          |    SELECT doc_id, unnest(list_transform(generate_series(1, len(sp)), i -> {'token': sp[i], 'pos': i - 1})) AS u
          |    FROM (SELECT doc_id, string_split_regex(text, ' +') AS sp FROM documents)
          |  ) WHERE len(u['token']) > 0
          |), post AS (
          |  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2
          |), dl AS (
          |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY 1
          |), scal AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS toktotal FROM dl
          |), dft AS (
          |  SELECT token, CAST(count(*) AS BIGINT) AS df
          |  FROM post WHERE token IN ('hash', 'join', 'data') GROUP BY 1
          |), s AS (
          |  SELECT p.doc_id, p.token,
          |    ln(CAST(1.0 AS DOUBLE) + (CAST(sc.n AS DOUBLE) - f.df + CAST(0.5 AS DOUBLE)) / (f.df + CAST(0.5 AS DOUBLE)))
          |      * (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
          |      / (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
          |         (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE)
          |          / (CAST(sc.toktotal AS DOUBLE) / CAST(sc.n AS DOUBLE)))) AS s
          |  FROM post p JOIN dft f USING (token) JOIN dl d USING (doc_id), scal sc
          |  WHERE p.token IN ('hash', 'join', 'data')
          |)
          |, sc2 AS (
          |  SELECT doc_id,
          |    COALESCE(sum(CASE WHEN token = 'hash' THEN s END), CAST(0.0 AS DOUBLE))
          |    + COALESCE(sum(CASE WHEN token = 'join' THEN s END), CAST(0.0 AS DOUBLE))
          |    + COALESCE(sum(CASE WHEN token = 'data' THEN s END), CAST(0.0 AS DOUBLE)) AS score
          |  FROM s GROUP BY 1
          |  ORDER BY score DESC, doc_id
          |  LIMIT 20
          |)
          |SELECT doc_id,
          |  CAST(round(score * CAST(1000000000.0 AS DOUBLE)) AS BIGINT) AS score_e9
          |FROM sc2""".stripMargin,

      // PageRank: 5 unrolled iterations of the same integer
      // recurrence (r' = base + (17·Σ(r // deg)) // 20); DuckDB's //
      // and Spark's `div` both floor on non-negative operands.
      "q_pagerank" ->
        """WITH ed AS (
          |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
          |), e AS (
          |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
          |), n AS (
          |  SELECT DISTINCT src AS id FROM e
          |), d AS (
          |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
          |), ewd AS (
          |  SELECT e.src, e.dst, d.deg FROM e JOIN d ON d.src = e.src
          |), i0 AS (
          |  SELECT id, CAST(1000000000 AS BIGINT) AS r FROM n
          |), i1 AS (
          |  SELECT n.id, 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i0 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |), i2 AS (
          |  SELECT n.id, 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i1 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |), i3 AS (
          |  SELECT n.id, 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i2 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |), i4 AS (
          |  SELECT n.id, 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i3 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |), i5 AS (
          |  SELECT n.id, 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i4 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |)
          |SELECT id, CAST(r AS BIGINT) AS rank FROM i5 ORDER BY id""".stripMargin,

      // Triangles: the same degree-ordered orientation as the engine
      // (orient each undirected edge from its (deg,id)-smaller
      // endpoint), wedge join on the shared source, close with an
      // oriented edge — each triangle materializes exactly once.
      "q_triangles" ->
        """WITH pe AS (
          |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  WHERE a.l_orderkey % 4 = 0
          |), deg AS (
          |  SELECT id, CAST(count(*) AS BIGINT) AS d
          |  FROM (SELECT u AS id FROM pe UNION ALL SELECT v AS id FROM pe)
          |  GROUP BY 1
          |), o AS (
          |  SELECT
          |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND pe.u < pe.v) THEN pe.u ELSE pe.v END AS src,
          |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND pe.u < pe.v) THEN pe.v ELSE pe.u END AS dst,
          |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND pe.u < pe.v) THEN dv.d ELSE du.d END AS ddeg
          |  FROM pe JOIN deg du ON du.id = pe.u JOIN deg dv ON dv.id = pe.v
          |), tri AS (
          |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
          |  FROM o e1
          |  JOIN o e2 ON e1.src = e2.src
          |    AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
          |  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
          |)
          |SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
          |FROM (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
          |GROUP BY id ORDER BY id""".stripMargin,

      // Clustering coefficients: the q_triangles pipeline + a degree
      // left join; cc = one IEEE division over exact integers.
      "q_clustering" ->
        """WITH pe AS (
          |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  WHERE a.l_orderkey % 4 = 0
          |), deg AS (
          |  SELECT id, CAST(count(*) AS BIGINT) AS d
          |  FROM (SELECT u AS id FROM pe UNION ALL SELECT v AS id FROM pe)
          |  GROUP BY 1
          |), o AS (
          |  SELECT
          |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND pe.u < pe.v) THEN pe.u ELSE pe.v END AS src,
          |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND pe.u < pe.v) THEN pe.v ELSE pe.u END AS dst,
          |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND pe.u < pe.v) THEN dv.d ELSE du.d END AS ddeg
          |  FROM pe JOIN deg du ON du.id = pe.u JOIN deg dv ON dv.id = pe.v
          |), tri AS (
          |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
          |  FROM o e1
          |  JOIN o e2 ON e1.src = e2.src
          |    AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
          |  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
          |), tc AS (
          |  SELECT id, CAST(count(*) AS BIGINT) AS n
          |  FROM (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
          |  GROUP BY id
          |)
          |SELECT d.id, d.d AS deg,
          |  CAST(COALESCE(t.n, 0) AS BIGINT) AS n_triangles,
          |  CASE WHEN d.d >= 2
          |       THEN CAST(2 * COALESCE(t.n, 0) AS DOUBLE) / (d.d * (d.d - 1)) END AS cc
          |FROM deg d LEFT JOIN tc t ON t.id = d.id
          |ORDER BY d.id""".stripMargin,

      // PQ: centroids = corpus rows vec_id < 16 subspace-sliced;
      // encode = per-subspace argmin of exact integer squared L2
      // (lexicographic list min → ties to smallest centroid id);
      // ADC = sum of per-subspace distances to the CODED centroids.
      // k-core: three unrolled peels — each round recomputes degrees
      // over the surviving edge set and keeps vertices with deg >= 8.
      "q_kcore" ->
        """WITH pe AS (
          |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  WHERE a.l_orderkey % 4 = 0
          |), e0 AS (
          |  SELECT u AS src, v AS dst FROM pe
          |), s0 AS (
          |  SELECT id FROM (SELECT src AS id FROM e0 UNION ALL SELECT dst FROM e0)
          |  GROUP BY id HAVING count(*) >= 8
          |), e1 AS (
          |  SELECT e.src, e.dst FROM e0 e
          |  JOIN s0 x ON x.id = e.src JOIN s0 y ON y.id = e.dst
          |), s1 AS (
          |  SELECT id FROM (SELECT src AS id FROM e1 UNION ALL SELECT dst FROM e1)
          |  GROUP BY id HAVING count(*) >= 8
          |), e2 AS (
          |  SELECT e.src, e.dst FROM e1 e
          |  JOIN s1 x ON x.id = e.src JOIN s1 y ON y.id = e.dst
          |), s2 AS (
          |  SELECT id FROM (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)
          |  GROUP BY id HAVING count(*) >= 8
          |), e3 AS (
          |  SELECT e.src, e.dst FROM e2 e
          |  JOIN s2 x ON x.id = e.src JOIN s2 y ON y.id = e.dst
          |)
          |SELECT id, CAST(count(*) AS BIGINT) AS deg
          |FROM (SELECT src AS id FROM e3 UNION ALL SELECT dst FROM e3)
          |GROUP BY id
          |ORDER BY id""".stripMargin,

      // BFS: DuckDB's bounded recursive CTE IS the frontier
      // expansion — UNION dedups (id, dist) pairs, dist < 4 bounds
      // the walk, min(dist) per id is the shortest hop count.
      "q_bfs_hops" ->
        """WITH RECURSIVE ps AS (
          |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
          |), e AS (
          |  SELECT src, dst FROM ps UNION ALL SELECT dst AS src, src AS dst FROM ps
          |), seeds AS (
          |  SELECT DISTINCT src AS id FROM ps WHERE src % 202 = 0
          |), walk(id, dist) AS (
          |  SELECT id, CAST(0 AS BIGINT) FROM seeds
          |  UNION
          |  SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON e.src = walk.id
          |  WHERE walk.dist < 4
          |)
          |SELECT id, CAST(min(dist) AS BIGINT) AS dist
          |FROM walk GROUP BY id ORDER BY id""".stripMargin,

      // TrustRank: the q_pagerank unroll with the teleport term
      // (init AND per-iteration base) restricted to seed nodes
      // (supplier ids ≡ 1 mod 20).
      "q_trustrank" ->
        """WITH ed AS (
          |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
          |), e AS (
          |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
          |), n AS (
          |  SELECT DISTINCT src AS id, CASE WHEN src % 20 = 1 THEN 1 ELSE 0 END AS sd FROM e
          |), d AS (
          |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
          |), ewd AS (
          |  SELECT e.src, e.dst, d.deg FROM e JOIN d ON d.src = e.src
          |), i0 AS (
          |  SELECT id, CAST(sd * 1000000000 AS BIGINT) AS r FROM n
          |), i1 AS (
          |  SELECT n.id, n.sd * 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i0 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |), i2 AS (
          |  SELECT n.id, n.sd * 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i1 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |), i3 AS (
          |  SELECT n.id, n.sd * 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i2 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |), i4 AS (
          |  SELECT n.id, n.sd * 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i3 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |), i5 AS (
          |  SELECT n.id, n.sd * 150000000 + (17 * COALESCE(s.s, 0)) // 20 AS r
          |  FROM n LEFT JOIN (SELECT ed.dst AS id, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
          |                    FROM ewd ed JOIN i4 p ON p.id = ed.src GROUP BY 1) s ON s.id = n.id
          |)
          |SELECT id, CAST(r AS BIGINT) AS rank FROM i5 ORDER BY id""".stripMargin,

      // HyperBall: seed registers from each node's own hash, two
      // absorb-from-successors max-merge rounds, then the portable
      // HLL estimator at m=128 (linear-counting branch included) —
      // byte-for-byte the q_hll_portable estimation pipeline.
      "q_hyperball" ->
        """WITH ed AS (
          |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
          |  WHERE l_orderkey % 4 = 0
          |), e AS (
          |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
          |), n AS (
          |  SELECT DISTINCT src AS id FROM e
          |), h AS (
          |  SELECT id,
          |    CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          |  FROM n
          |), c0 AS (
          |  SELECT id, CAST(hv % 128 AS INT) AS reg,
          |    CASE WHEN hv // 128 = 0 THEN 54
          |         ELSE CAST(bit_count(((hv // 128) & (-(hv // 128))) - 1) AS INT) + 1
          |    END AS r
          |  FROM h
          |), c1 AS (
          |  SELECT id, reg, max(r) AS r FROM (
          |    SELECT id, reg, r FROM c0
          |    UNION ALL
          |    SELECT e.src AS id, c.reg, c.r FROM c0 c JOIN e ON e.dst = c.id
          |  ) GROUP BY 1, 2
          |), c2 AS (
          |  SELECT id, reg, max(r) AS r FROM (
          |    SELECT id, reg, r FROM c1
          |    UNION ALL
          |    SELECT e.src AS id, c.reg, c.r FROM c1 c JOIN e ON e.dst = c.id
          |  ) GROUP BY 1, 2
          |), s AS (
          |  SELECT id,
          |    sum(CAST((1::BIGINT << (60 - r)) AS HUGEINT)) AS sp,
          |    CAST(count(*) AS BIGINT) AS np
          |  FROM c2 GROUP BY 1
          |), est AS (
          |  SELECT id, 128 - np AS zeros,
          |    ((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 128.0::DOUBLE))
          |      * 16384.0::DOUBLE * 1152921504606846976.0::DOUBLE)
          |      / CAST(sp + CAST(128 - np AS HUGEINT) * (1::BIGINT << 60) AS DOUBLE) AS rawE
          |  FROM s
          |)
          |SELECT id,
          |  CAST(round(CASE WHEN zeros > 0 AND rawE <= 320.0::DOUBLE
          |                  THEN 128.0::DOUBLE * ln(128.0::DOUBLE / CAST(zeros AS DOUBLE))
          |                  ELSE rawE END) AS BIGINT) AS ball_est
          |FROM est ORDER BY id""".stripMargin,

      // Harmonic centrality: the q_hyperball unroll with the
      // portable estimator applied at EVERY round (r0, r1, r2);
      // shells clamp at 0 and contribute (shell·1e9)//r. The graph
      // is symmetric, so the transpose is the same edge set.
      "q_harmonic" ->
        """WITH ed AS (
          |  SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem
          |  WHERE l_orderkey % 4 = 0
          |), e AS (
          |  SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed
          |), n AS (
          |  SELECT DISTINCT src AS id FROM e
          |), h AS (
          |  SELECT id,
          |    CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          |  FROM n
          |), c0 AS (
          |  SELECT id, CAST(hv % 128 AS INT) AS reg,
          |    CASE WHEN hv // 128 = 0 THEN 54
          |         ELSE CAST(bit_count(((hv // 128) & (-(hv // 128))) - 1) AS INT) + 1
          |    END AS r
          |  FROM h
          |), c1 AS (
          |  SELECT id, reg, max(r) AS r FROM (
          |    SELECT id, reg, r FROM c0
          |    UNION ALL
          |    SELECT e.src AS id, c.reg, c.r FROM c0 c JOIN e ON e.dst = c.id
          |  ) GROUP BY 1, 2
          |), c2 AS (
          |  SELECT id, reg, max(r) AS r FROM (
          |    SELECT id, reg, r FROM c1
          |    UNION ALL
          |    SELECT e.src AS id, c.reg, c.r FROM c1 c JOIN e ON e.dst = c.id
          |  ) GROUP BY 1, 2
          |), e0 AS (
          |  SELECT id, CAST(round(CASE WHEN (128 - np) > 0 AND rawE <= 320.0::DOUBLE
          |    THEN 128.0::DOUBLE * ln(128.0::DOUBLE / CAST(128 - np AS DOUBLE))
          |    ELSE rawE END) AS BIGINT) AS est
          |  FROM (SELECT id, np,
          |          ((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 128.0::DOUBLE))
          |            * 16384.0::DOUBLE * 1152921504606846976.0::DOUBLE)
          |          / CAST(sp + CAST(128 - np AS HUGEINT) * (1::BIGINT << 60) AS DOUBLE) AS rawE
          |        FROM (SELECT id, sum(CAST((1::BIGINT << (60 - r)) AS HUGEINT)) AS sp,
          |                     CAST(count(*) AS BIGINT) AS np
          |              FROM c0 GROUP BY 1))
          |), e1 AS (
          |  SELECT id, CAST(round(CASE WHEN (128 - np) > 0 AND rawE <= 320.0::DOUBLE
          |    THEN 128.0::DOUBLE * ln(128.0::DOUBLE / CAST(128 - np AS DOUBLE))
          |    ELSE rawE END) AS BIGINT) AS est
          |  FROM (SELECT id, np,
          |          ((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 128.0::DOUBLE))
          |            * 16384.0::DOUBLE * 1152921504606846976.0::DOUBLE)
          |          / CAST(sp + CAST(128 - np AS HUGEINT) * (1::BIGINT << 60) AS DOUBLE) AS rawE
          |        FROM (SELECT id, sum(CAST((1::BIGINT << (60 - r)) AS HUGEINT)) AS sp,
          |                     CAST(count(*) AS BIGINT) AS np
          |              FROM c1 GROUP BY 1))
          |), e2 AS (
          |  SELECT id, CAST(round(CASE WHEN (128 - np) > 0 AND rawE <= 320.0::DOUBLE
          |    THEN 128.0::DOUBLE * ln(128.0::DOUBLE / CAST(128 - np AS DOUBLE))
          |    ELSE rawE END) AS BIGINT) AS est
          |  FROM (SELECT id, np,
          |          ((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 128.0::DOUBLE))
          |            * 16384.0::DOUBLE * 1152921504606846976.0::DOUBLE)
          |          / CAST(sp + CAST(128 - np AS HUGEINT) * (1::BIGINT << 60) AS DOUBLE) AS rawE
          |        FROM (SELECT id, sum(CAST((1::BIGINT << (60 - r)) AS HUGEINT)) AS sp,
          |                     CAST(count(*) AS BIGINT) AS np
          |              FROM c2 GROUP BY 1))
          |)
          |SELECT e0.id,
          |  CAST((greatest(e1.est - e0.est, 0) * 1000000000) // 1
          |     + (greatest(e2.est - e1.est, 0) * 1000000000) // 2 AS BIGINT) AS harmonic_e9
          |FROM e0 JOIN e1 ON e1.id = e0.id JOIN e2 ON e2.id = e0.id
          |ORDER BY e0.id""".stripMargin,

      "q_pq_codes" ->
        """WITH qz AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
          |  FROM embeddings
          |), cent AS (
          |  SELECT vec_id AS cid, v FROM qz WHERE vec_id < 16
          |), sub AS (
          |  SELECT q.vec_id, s.s, c.cid,
          |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
          |      (q.v[s.s*16 + i] - c.v[s.s*16 + i]) * (q.v[s.s*16 + i] - c.v[s.s*16 + i]))) AS BIGINT) AS d
          |  FROM qz q, (SELECT unnest(generate_series(0, 3)) AS s) s, cent c
          |), best AS (
          |  SELECT vec_id, s, min([d, cid])[2] AS code FROM sub GROUP BY 1, 2
          |)
          |SELECT vec_id,
          |  CAST(max(CASE WHEN s = 0 THEN code END) AS INT) AS code0,
          |  CAST(max(CASE WHEN s = 1 THEN code END) AS INT) AS code1,
          |  CAST(max(CASE WHEN s = 2 THEN code END) AS INT) AS code2,
          |  CAST(max(CASE WHEN s = 3 THEN code END) AS INT) AS code3
          |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin,

      "q_pq_trained" -> pqTrainedSql,

      "q_pq_adc" ->
        """WITH qz AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
          |  FROM embeddings
          |), cent AS (
          |  SELECT vec_id AS cid, v FROM qz WHERE vec_id < 16
          |), sub AS (
          |  SELECT q.vec_id, s.s, c.cid,
          |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
          |      (q.v[s.s*16 + i] - c.v[s.s*16 + i]) * (q.v[s.s*16 + i] - c.v[s.s*16 + i]))) AS BIGINT) AS d
          |  FROM qz q, (SELECT unnest(generate_series(0, 3)) AS s) s, cent c
          |), best AS (
          |  SELECT vec_id, s, min([d, cid])[2] AS code FROM sub GROUP BY 1, 2
          |), adcsub AS (
          |  SELECT qq.vec_id AS query_id, b.vec_id AS corpus_id, b.s,
          |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
          |      (qq.v[b.s*16 + i] - c.v[b.s*16 + i]) * (qq.v[b.s*16 + i] - c.v[b.s*16 + i]))) AS BIGINT) AS d
          |  FROM best b JOIN cent c ON c.cid = b.code
          |       JOIN qz qq ON qq.vec_id < 50
          |  WHERE qq.vec_id != b.vec_id
          |), adc AS (
          |  SELECT query_id, corpus_id, CAST(SUM(d) AS BIGINT) AS adc_dist
          |  FROM adcsub GROUP BY 1, 2
          |)
          |SELECT query_id, corpus_id, adc_dist, CAST(rnk AS INT) AS rnk
          |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, corpus_id) AS rnk
          |      FROM adc)
          |WHERE rnk <= 3
          |ORDER BY query_id, rnk""".stripMargin,

      // IVF-PQ: q_ivf_topk's coarse assign/probe CTEs (nLists=8,
      // nProbe=2) composed with q_pq_adc's code/ADC CTEs — candidate
      // pairs restricted to probed lists, ADC rank inside them.
      "q_ivfpq_topk" ->
        """WITH qz AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
          |  FROM embeddings
          |), nrm AS (
          |  SELECT vec_id, v,
          |    sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
          |  FROM qz
          |), coarse AS (
          |  SELECT vec_id AS cid, v AS cv, nv AS cn FROM nrm WHERE vec_id < 8
          |), cscore AS (
          |  SELECT n.vec_id, c.cid,
          |    row_number() OVER (PARTITION BY n.vec_id
          |                       ORDER BY CAST(CAST(list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i]*c.cv[i])) AS BIGINT) AS DOUBLE)/(n.nv*c.cn) DESC, c.cid ASC) AS rn
          |  FROM nrm n, coarse c
          |), corpus_assign AS (
          |  SELECT vec_id AS corpus_id, cid AS list_id FROM cscore WHERE rn = 1
          |), probes AS (
          |  SELECT vec_id AS query_id, cid AS list_id FROM cscore WHERE rn <= 2 AND vec_id < 50
          |), cent AS (
          |  SELECT vec_id AS cid, v FROM qz WHERE vec_id < 16
          |), sub AS (
          |  SELECT q.vec_id, s.s, c.cid,
          |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
          |      (q.v[s.s*16 + i] - c.v[s.s*16 + i]) * (q.v[s.s*16 + i] - c.v[s.s*16 + i]))) AS BIGINT) AS d
          |  FROM qz q, (SELECT unnest(generate_series(0, 3)) AS s) s, cent c
          |), best AS (
          |  SELECT vec_id, s, min([d, cid])[2] AS code FROM sub GROUP BY 1, 2
          |), adcsub AS (
          |  SELECT p.query_id, b.vec_id AS corpus_id, b.s,
          |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
          |      (qq.v[b.s*16 + i] - c.v[b.s*16 + i]) * (qq.v[b.s*16 + i] - c.v[b.s*16 + i]))) AS BIGINT) AS d
          |  FROM best b
          |  JOIN corpus_assign a ON a.corpus_id = b.vec_id
          |  JOIN probes p ON p.list_id = a.list_id
          |  JOIN qz qq ON qq.vec_id = p.query_id
          |  JOIN cent c ON c.cid = b.code
          |  WHERE qq.vec_id != b.vec_id
          |), adc AS (
          |  SELECT query_id, corpus_id, CAST(SUM(d) AS BIGINT) AS adc_dist
          |  FROM adcsub GROUP BY 1, 2
          |)
          |SELECT query_id, corpus_id, adc_dist, CAST(rnk AS INT) AS rnk
          |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, corpus_id) AS rnk
          |      FROM adc)
          |WHERE rnk <= 3
          |ORDER BY query_id, rnk""".stripMargin,

      "q_text_stats" ->
        """SELECT doc_id,
          |  CAST(len(string_split_regex(text, ' +')) AS INT) AS n_tokens,
          |  CAST(length(text) AS INT) AS n_chars_actual,
          |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS bpeish_tokens,
          |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS INT) AS n_punct,
          |  least(CAST(len(string_split_regex(text, ' +')) AS DOUBLE)/64.0, 1.0)*0.4
          |    + (CASE WHEN (CAST(length(text) AS DOUBLE) - (CAST(len(string_split_regex(text, ' +')) AS DOUBLE) - 1.0))
          |                 / greatest(CAST(len(string_split_regex(text, ' +')) AS DOUBLE), 1.0) BETWEEN 3.0 AND 10.0
          |            THEN 1.0 ELSE 0.5 END)*0.3
          |    + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
          |                   / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0))*0.3 AS quality
          |FROM documents""".stripMargin,

      "q_langid" ->
        """WITH t AS (
          |  SELECT doc_id, lang, string_split_regex(text, ' +') AS toks FROM documents
          |), s AS (
          |  SELECT doc_id, lang, 'de' AS cand, len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','ein'], x))) AS score FROM t
          |  UNION ALL
          |  SELECT doc_id, lang, 'en', len(list_filter(toks, x -> list_contains(['the','a','and','of','to','is','in'], x))) FROM t
          |  UNION ALL
          |  SELECT doc_id, lang, 'es', len(list_filter(toks, x -> list_contains(['el','la','los','las','de','que','es'], x))) FROM t
          |  UNION ALL
          |  SELECT doc_id, lang, 'fr', len(list_filter(toks, x -> list_contains(['le','la','les','des','et','est','une'], x))) FROM t
          |  UNION ALL
          |  SELECT doc_id, lang, 'zh', len(list_filter(toks, x -> list_contains(['的','是','了','在','和'], x))) FROM t
          |)
          |SELECT doc_id, lang, cand AS lang_pred
          |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn FROM s)
          |WHERE rn = 1""".stripMargin,

      "q_fingerprint" ->
        s"""SELECT doc_id,
           |  list_reduce(
           |    list_prepend(CAST(0 AS BIGINT),
           |      list_transform(string_split_regex(text, ' +'),
           |        t -> ${duckHash60.format("t")} % 1000000007)),
           |    (a, b) -> (a*31 + b) % 1000000007) AS fp
           |FROM documents""".stripMargin
    )
  }

  private def coreOracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
        |  round(sum(CAST(round(l_extendedprice*100) AS BIGINT))*1.0/count(l_extendedprice))/100.0 AS avg_price,
        |  min(l_discount) AS min_disc,
        |  max(l_discount) AS max_disc,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1,2""".stripMargin,

    "q_recap_hourly" ->
      """WITH obs AS (
        |  SELECT event_id AS obs_id, user_id AS location_id,
        |         CAST(ts AS DATE) AS obs_date,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS obs_hour,
        |         (CAST(extract(minute FROM ts) AS INT) // 10) * 10 AS obs_slot,
        |         value AS temp_c, event_type AS condition,
        |         CASE WHEN event_type = 'purchase' THEN value END AS precip_mm
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), slot_first AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY location_id, obs_date, obs_hour, obs_slot ORDER BY obs_id) AS rn
        |    FROM obs) WHERE rn = 1
        |), cond_counts AS (
        |  SELECT location_id, obs_date, obs_hour, condition, count(*) AS c
        |  FROM slot_first GROUP BY 1,2,3,4
        |), dominant AS (
        |  SELECT location_id, obs_date, obs_hour, condition AS dominant_condition
        |  FROM (SELECT *, row_number() OVER (PARTITION BY location_id, obs_date, obs_hour ORDER BY c DESC, condition ASC) AS rn
        |        FROM cond_counts) WHERE rn = 1
        |)
        |SELECT f.location_id, f.obs_date, f.obs_hour,
        |  round(sum(CAST(round(f.temp_c*100) AS BIGINT))*1.0/count(f.temp_c))/100.0 AS avg_temp_c,
        |  min(f.temp_c) AS min_temp_c,
        |  max(f.temp_c) AS max_temp_c,
        |  any_value(d.dominant_condition) AS dominant_condition,
        |  coalesce(sum(CAST(round(f.precip_mm*100) AS BIGINT)), 0)/100.0 AS total_precip_mm,
        |  count(f.temp_c) AS n_obs
        |FROM slot_first f JOIN dominant d
        |  ON f.location_id = d.location_id AND f.obs_date = d.obs_date AND f.obs_hour = d.obs_hour
        |GROUP BY 1,2,3""".stripMargin,

    "q_recap_daily" ->
      """WITH obs AS (
        |  SELECT event_id AS obs_id, user_id AS location_id,
        |         CAST(ts AS DATE) AS obs_date,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS obs_hour
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), hours AS (
        |  SELECT DISTINCT location_id, obs_date, obs_hour FROM obs
        |)
        |SELECT location_id, obs_date, count(*) AS hours_present,
        |       max(CASE WHEN obs_hour = 23 THEN true ELSE false END) AS is_full_recap
        |FROM hours GROUP BY 1,2""".stripMargin,

    "q_dup_groups" ->
      """WITH obs AS (
        |  SELECT event_id AS obs_id, user_id AS location_id,
        |         CAST(ts AS DATE) AS obs_date,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS obs_hour,
        |         CAST((CAST(extract(minute FROM ts) AS INT) // 10) * 10 AS BIGINT) AS obs_slot
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |)
        |SELECT location_id, obs_date, obs_hour, obs_slot, count(*) AS dup_count
        |FROM obs GROUP BY 1,2,3,4 HAVING count(*) > 1""".stripMargin,

    "q_semi_join" ->
      """SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY 1""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL)""".stripMargin
  )

  private def batch2Oracles: Map[String, String] = Map(
    "q_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.08""".stripMargin,

    // the connector round-trip must reproduce the parquet truth the
    // pages were derived from — integer-only aggregates, so the JSON
    // land/parse loop has nowhere to hide a lossy conversion
    "q_rest_pages" ->
      """SELECT event_type, count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users,
        |       min(event_id) AS min_event, max(event_id) AS max_event
        |FROM events
        |WHERE user_id BETWEEN 3 AND 9
        |GROUP BY event_type""".stripMargin,

    // Morton spread as four shift-or-mask steps per key, identical
    // bitwise semantics in both engines (BIGINT <<, &, |).
    "q_zorder" ->
      """WITH t0 AS (
        |  SELECT l_orderkey, l_linenumber,
        |         l_partkey % 65536 AS xa, l_suppkey % 65536 AS xb FROM lineitem
        |), t1 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    (xa | (xa << 8)) & 16711935 AS xa, (xb | (xb << 8)) & 16711935 AS xb FROM t0
        |), t2 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    (xa | (xa << 4)) & 252645135 AS xa, (xb | (xb << 4)) & 252645135 AS xb FROM t1
        |), t3 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    (xa | (xa << 2)) & 858993459 AS xa, (xb | (xb << 2)) & 858993459 AS xb FROM t2
        |), t4 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    (xa | (xa << 1)) & 1431655765 AS xa, (xb | (xb << 1)) & 1431655765 AS xb FROM t3
        |)
        |SELECT l_orderkey, l_linenumber, xa | (xb << 1) AS zkey
        |FROM t4
        |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin,

    // 3-dim Morton: bit j of key d at position 3j+d, as one explicit
    // 48-term scalar sum — ROW-PRESERVING on purpose: (l_orderkey,
    // l_linenumber) is not unique in the synthetic lineitem, so a
    // GROUP BY bit-table formulation would collapse duplicate rows
    // the Spark side keeps (measured: 5999 vs 6000 at sf0.001)
    "q_zorder3" -> {
      val terms = (0 until 16).flatMap(j => Seq(
        s"(((xa >> $j) & 1) << ${3 * j})",
        s"(((xb >> $j) & 1) << ${3 * j + 1})",
        s"(((xc >> $j) & 1) << ${3 * j + 2})")).mkString(" + ")
      s"""WITH t0 AS (
         |  SELECT l_orderkey, l_linenumber,
         |         l_partkey % 65536 AS xa, l_suppkey % 65536 AS xb,
         |         l_orderkey % 65536 AS xc
         |  FROM lineitem
         |)
         |SELECT l_orderkey, l_linenumber, CAST($terms AS BIGINT) AS zkey
         |FROM t0
         |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin
    },

    // Hilbert key: the identical xy->d recurrence as the engine,
    // one CTE per scale step (s = 2^15 .. 2^0). Within each step the
    // SELECT reads the PREVIOUS step's (x, y, d) row, so d uses the
    // pre-rotation coordinates exactly like the JVM loop; (3rx)^ry
    // is spelled as a CASE to avoid engine-specific XOR operators.
    "q_hilbert" -> {
      val steps = (0 until 16).map { k =>
        val b = 15 - k
        val s2 = (1L << b) * (1L << b)
        s"""h${k + 1} AS (
           |  SELECT l_orderkey, l_linenumber,
           |    CASE WHEN ((y >> $b) & 1) = 0
           |         THEN CASE WHEN ((x >> $b) & 1) = 1 THEN 65535 - y ELSE y END
           |         ELSE x END AS x,
           |    CASE WHEN ((y >> $b) & 1) = 0
           |         THEN CASE WHEN ((x >> $b) & 1) = 1 THEN 65535 - x ELSE x END
           |         ELSE y END AS y,
           |    d + CAST($s2 AS BIGINT) *
           |      (CASE WHEN ((x >> $b) & 1) = 0 THEN ((y >> $b) & 1)
           |            ELSE 3 - ((y >> $b) & 1) END) AS d
           |  FROM h$k
           |)""".stripMargin
      }.mkString(", ")
      s"""WITH h0 AS (
         |  SELECT l_orderkey, l_linenumber,
         |    l_partkey % 65536 AS x, l_suppkey % 65536 AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM lineitem
         |), $steps
         |SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS hkey
         |FROM h16
         |ORDER BY hkey, l_orderkey, l_linenumber""".stripMargin
    },

    // Compaction plan: same window recurrence — preceding cumsum of
    // small-file sizes within the partition, floored to the target.
    "q_compaction_plan" ->
      """SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  CASE WHEN n_chars < 500 THEN 'compact' ELSE 'keep' END AS action,
        |  CASE WHEN n_chars < 500 THEN CAST(FLOOR(COALESCE(
        |    SUM(CASE WHEN n_chars < 500 THEN n_chars ELSE 0 END) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 500.0) AS BIGINT)
        |  END AS bin_id
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // Domain stats: the oracle does NOT replicate the regexp chain —
    // it constructs the ground-truth normalized host from the same
    // doc fields, so the whole Urls.host normalization (case, www.,
    // port, trailing dot, fragment) is verified end to end.
    "q_domain_stats" ->
      """WITH h AS (
        |  SELECT
        |    CASE WHEN doc_id % 3 = 2 THEN 'cdn.' || source ELSE source END
        |      || '.example.' || CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END AS host,
        |    'example.' || CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END AS domain,
        |    n_chars, lang
        |  FROM documents
        |)
        |SELECT host, domain,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM h GROUP BY host, domain
        |ORDER BY host""".stripMargin,

    // Domain split: ground-truth host (as in q_domain_stats) pushed
    // through the md5 hash-bucket convention on the HOST string.
    "q_domain_split" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 2 THEN 'cdn.' || source ELSE source END
        |      || '.example.' || CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END AS host
        |  FROM documents
        |), b AS (
        |  SELECT host,
        |    CAST(concat('0x', substr(md5(host), 1, 15)) AS BIGINT) % 100 AS bucket
        |  FROM h
        |)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'valid'
        |            ELSE 'test' END AS split,
        |       host, CAST(count(*) AS BIGINT) AS n_docs
        |FROM b GROUP BY 1, 2
        |ORDER BY host""".stripMargin,

    // Snapshot read: HEAD of the 4-version demo history equals the
    // raw corpus — commit/overwrite/rollback must be lossless.
    "q_snapshot_read" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // Pruned snapshot read: zone-map skipping must equal the plain
    // filtered aggregate — pruning reads less, never answers less.
    "q_snapshot_prune" ->
      """SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |WHERE doc_id BETWEEN 100 AND 260
        |GROUP BY source ORDER BY source""".stripMargin,

    // URL dedup: ground-truth canonical key built arithmetically —
    // host (lowered, www/port/fragment-stripped) + path + query.
    "q_url_dedup" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    'site' || CAST((doc_id // 2) % 10 AS VARCHAR) || '.example.'
        |      || CASE WHEN (doc_id // 2) % 2 = 0 THEN 'com' ELSE 'org' END
        |      || '/p/' || CAST(doc_id // 2 AS VARCHAR) || '?v=1' AS url_key
        |  FROM documents
        |)
        |SELECT url_key, min(doc_id) AS keep_doc,
        |  CAST(count(*) AS BIGINT) AS n_variants
        |FROM k GROUP BY url_key
        |ORDER BY url_key""".stripMargin,

    // OPTIMIZE ZORDER: the pruned second-dimension range read must
    // equal the plain filter over the raw corpus.
    "q_optimize_zorder" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc
        |FROM documents
        |WHERE n_chars BETWEEN 200 AND 400
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // Box read: conjunctive ranges through per-dimension envelope
    // skipping must equal the plain AND filter.
    "q_zorder_box" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc
        |FROM documents
        |WHERE doc_id BETWEEN 100 AND 400 AND n_chars BETWEEN 200 AND 400
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // Incremental MV: delta-folded view == full aggregate.
    "q_mv_refresh" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        |FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // Bloom-pruned point lookup: equality read through per-file
    // manifest blooms must equal the plain filter.
    "q_snapshot_bloom" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |WHERE source = 'src7'
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // retypeRewrite: the post-retype table is the corpus with doc_id
    // as INT plus the int-keyed appended slice — min/max stay typed
    // INT on both engines, proving the rewrite (not just the values)
    "q_retype_rewrite" ->
      """WITH un AS (
        |  SELECT source, CAST(doc_id AS INT) AS doc_id FROM documents
        |  UNION ALL
        |  SELECT 'post-retype' AS source, CAST(doc_id + 10000000 AS INT) AS doc_id
        |  FROM documents WHERE doc_id % 10 = 4
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS INT) AS min_id, CAST(max(doc_id) AS INT) AS max_id
        |FROM un GROUP BY source ORDER BY source""".stripMargin,

    // Copy-on-write DELETE: reading HEAD after the delete must equal
    // the NOT-filtered corpus — NULL-free predicate here; the
    // NULL-survivor rule is pinned in SnapshotMutationsSpec.
    "q_delete_where" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |WHERE NOT (lang = 'en' AND doc_id % 7 = 3)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // replaceWhere: delete-scope ∪ recomputed-scope, relationally.
    "q_replace_where" ->
      """WITH merged AS (
        |  SELECT source, n_chars FROM documents
        |  WHERE doc_id NOT BETWEEN 100 AND 299
        |  UNION ALL
        |  SELECT 'reloaded', n_chars*2 FROM documents
        |  WHERE doc_id BETWEEN 100 AND 299
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM merged GROUP BY source ORDER BY source""".stripMargin,

    // Copy-on-write MERGE: the relational replica of WHEN MATCHED
    // UPDATE / WHEN NOT MATCHED INSERT over the raw corpus.
    "q_merge_cow" ->
      """WITH src AS (
        |  SELECT doc_id, text, lang, 'merged' AS source,
        |         n_chars + 100000 AS n_chars
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text, lang, 'inserted', n_chars
        |  FROM documents WHERE doc_id % 10 = 1
        |), merged AS (
        |  SELECT * FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM src)
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars FROM src
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  max(doc_id) AS max_doc
        |FROM merged GROUP BY source ORDER BY source""".stripMargin,

    // BPE encode: tokens per word = (codepoints + 1 for </w>)
    // − one per greedy merge. With disjoint single-char pair (t,h)
    // and terminal pair (e,</w>), merge counts have closed forms:
    // non-overlapping 'th' occurrences + ends-with-'e'.
    "q_bpe_encode" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split_regex(text, ' +')) AS word FROM documents
        |), t AS (
        |  SELECT doc_id,
        |    CAST(len(word) + 1
        |      - (len(word) - len(replace(word, 'th', ''))) // 2
        |      - CASE WHEN word LIKE '%e' THEN 1 ELSE 0 END AS BIGINT) AS n
        |  FROM w WHERE len(word) > 0
        |)
        |SELECT d.doc_id, CAST(COALESCE(sum(t.n), 0) AS BIGINT) AS n_tokens
        |FROM documents d LEFT JOIN t ON t.doc_id = d.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    "q_filter_kit" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE user_id IS NOT NULL
        |  AND event_type IN ('click','view')
        |  AND strftime(ts, '%Y-%m-%d %H:%M:%S') LIKE '2024-01-1%'
        |  AND ts <= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,

    "q_explode_tokens" ->
      """SELECT doc_id,
        |  CAST(unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS INT) AS pos,
        |  unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id < 50""".stripMargin,

    "q_envelope_json" ->
      """SELECT event_id,
        |  to_json(struct_pack(event_id := event_id, event_type := event_type,
        |                      who := struct_pack(user_id := user_id))) AS envelope
        |FROM events WHERE user_id IS NOT NULL AND event_id < 500""".stripMargin,

    "q_union_disc" ->
      """WITH u AS (
        |  SELECT event_id, user_id, 'current' AS fetch_method FROM events
        |    WHERE user_id IS NOT NULL AND event_type = 'click'
        |  UNION ALL
        |  SELECT event_id, user_id, 'history' AS fetch_method FROM events
        |    WHERE user_id IS NOT NULL AND event_type = 'view'
        |)
        |SELECT fetch_method, user_id, count(*) AS n_rows, min(event_id) AS first_id
        |FROM u GROUP BY 1,2""".stripMargin,

    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  sum(CAST(round(c_acctbal*100) AS BIGINT))/100.0 AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2""".stripMargin,

    "q_late_dedup" ->
      """WITH obs AS (
        |  SELECT event_id AS obs_id, user_id AS location_id, event_type AS condition,
        |         CAST(ts AS DATE) AS obs_date,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS obs_hour
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |)
        |SELECT obs_id, location_id, obs_date, obs_hour
        |FROM obs i WHERE condition = 'error' AND NOT EXISTS (
        |  SELECT 1 FROM obs e WHERE e.condition = 'click'
        |    AND e.location_id = i.location_id AND e.obs_date = i.obs_date
        |    AND e.obs_hour = i.obs_hour)""".stripMargin,

    "q_tumbling_10min" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
        |  time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS w_end,
        |  user_id, count(*) AS n_rows,
        |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
        |FROM events WHERE user_id IS NOT NULL AND user_id < 20
        |GROUP BY 1,2,3""".stripMargin,

    // Hopping windows: the event→3-window fan-out made explicit —
    // a window starting at bucket10(ts) − {0,10,20} min contains ts.
    "q_hopping_30x10" ->
      """WITH e AS (
        |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS tb, user_id,
        |         CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND user_id < 20
        |)
        |SELECT e.tb - m.off AS w_start,
        |  e.tb - m.off + INTERVAL '30 minutes' AS w_end,
        |  user_id, count(*) AS n_rows,
        |  sum(cents)/100.0 AS sum_value
        |FROM e, (VALUES (INTERVAL '0 minutes'), (INTERVAL '10 minutes'),
        |                (INTERVAL '20 minutes')) m(off)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q_rank_topk" ->
      """SELECT user_id, rnk, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS INT) AS rnk
        |  FROM events WHERE user_id IS NOT NULL AND user_id < 50
        |) WHERE rnk <= 3""".stripMargin,

    "q_lag_delta" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  value - lag(value, 1) OVER w AS delta
        |FROM events WHERE user_id IS NOT NULL AND user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin,

    "q_collect_sorted" ->
      """SELECT user_id AS location_id, CAST(ts AS DATE) AS obs_date,
        |  string_agg(CAST(value AS VARCHAR), ',' ORDER BY event_id) AS temps_csv,
        |  count(*) AS n_rows
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL AND user_id < 30
        |GROUP BY 1,2""".stripMargin,

    "q_heat_index" ->
      """SELECT event_id, value/10.0 AS temp_c,
        |  CAST(event_id % 101 AS DOUBLE) AS humidity,
        |  value/10.0*9.0/5.0 + 32.0 AS temp_f,
        |  ((-42.379 + 2.04901523*(value/10.0*9.0/5.0 + 32.0)
        |    + 10.14333127*CAST(event_id % 101 AS DOUBLE)
        |    - 0.22475541*(value/10.0*9.0/5.0 + 32.0)*CAST(event_id % 101 AS DOUBLE)
        |    - 6.83783e-3*(value/10.0*9.0/5.0 + 32.0)*(value/10.0*9.0/5.0 + 32.0)
        |    - 5.481717e-2*CAST(event_id % 101 AS DOUBLE)*CAST(event_id % 101 AS DOUBLE)
        |    + 1.22874e-3*(value/10.0*9.0/5.0 + 32.0)*(value/10.0*9.0/5.0 + 32.0)*CAST(event_id % 101 AS DOUBLE)
        |    + 8.5282e-4*(value/10.0*9.0/5.0 + 32.0)*CAST(event_id % 101 AS DOUBLE)*CAST(event_id % 101 AS DOUBLE)
        |    - 1.99e-6*(value/10.0*9.0/5.0 + 32.0)*(value/10.0*9.0/5.0 + 32.0)*CAST(event_id % 101 AS DOUBLE)*CAST(event_id % 101 AS DOUBLE)
        |   ) - 32.0)*5.0/9.0 AS heat_index_c
        |FROM events WHERE user_id IS NOT NULL""".stripMargin,

    "q_time_kit" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  strftime(ts, '%Y-%m-%d %H') AS ts_hour_str,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |  strftime(ts + INTERVAL 7 HOUR, '%Y-%m-%d %H:%M:%S') AS jakarta_str,
        |  CAST(ts AS DATE) + 1 AS next_day,
        |  lpad(CAST(extract(hour FROM ts) AS VARCHAR), 2, '0') AS hh
        |FROM events WHERE user_id IS NOT NULL AND event_id < 2000""".stripMargin
  )
}
