package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions — the "is this the plan you'd want at
  * 100 TB" checks: filter/projection pushdown into the parquet scan,
  * broadcast joins for dims, whole-stage codegen on the hot paths. */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q_scan_pushdown: predicates reach the parquet scan, schema is pruned") {
    val plan = planOf("q_scan_pushdown")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(l_discount"), plan)
    // only the 5 needed columns are read, not all 11
    assert(plan.contains("l_orderkey") && !plan.contains("l_extendedprice"), plan)
  }

  test("q_star_join: dims are broadcast, not shuffled") {
    val plan = planOf("q_star_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q1_agg: partial aggregation is map-side (two HashAggregate levels)") {
    val plan = planOf("q1_agg")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_sum"), plan)
  }

  test("q_recap_hourly: projection pruning reaches the events scan") {
    val plan = planOf("q_recap_hourly")
    // props (unused JSON payload column) must not be read
    assert(!plan.contains("props"), plan)
  }

  test("date-partitioned layout: where(date) prunes partitions at the scan") {
    val path = java.nio.file.Files.createTempDirectory("graft-prune").toString
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0), (3L, "2024-01-03", 3.0)
    ).toDF("id", "obs_date", "v")
    graft.sources.Sinks.upsertPartitions(df, path, Seq("obs_date"))
    val q = spark.read.parquet(path).where($"obs_date" === "2024-01-02")
    assert(q.collect().length == 1) // collect() runs q's own plan (count() builds a different one)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(obs_date"), plan)
    // only 1 of 3 partition files is actually read (scan metrics)
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    assert(scan.metrics("numFiles").value == 1, scan.metrics.mkString(","))
  }

  test("q_asof_join: union + window plan, never a range/nested-loop join") {
    val plan = planOf("q_asof_join")
    assert(plan.contains("Window"), plan)
    assert(plan.contains("Union"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // at most two exchanges: hash on the key for the window, range for
    // the query's deterministic output order (upper bound, not exact —
    // AQE/version plan drift must not fail this spuriously; the real
    // regression guard is "no third per-window exchange")
    assert("\\(\\d+\\) Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("q_range_join: bucketed equi-join, never a nested loop") {
    val plan = planOf("q_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // the range predicate survives as a post-join filter on an equi-join
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("q_top_ngrams: global top-k plans as TakeOrderedAndProject, not a full sort") {
    // orderBy + limit must fuse into per-partition top-k + driver merge;
    // a global Sort before the limit would shuffle the whole ngram table
    val plan = planOf("q_top_ngrams")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q_chunk_tokens: chunking is narrow — only the output-order exchange") {
    val plan = planOf("q_chunk_tokens")
    // tokenize → starts → posexplode → slice is all map-side; the one
    // exchange is the deterministic output order's range partition
    assert("\\(\\d+\\) Exchange".r.findAllIn(plan).size <= 1, plan)
    assert(plan.contains("Generate"), plan)
  }

  test("q_contamination: ONE equi-join probe end to end, never a nested loop") {
    val plan = planOf("q_contamination")
    // the hit probe is a single left outer hash/merge equi-join on the
    // shingle key — one eval pass, no second spine branch
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // one-pass claim: exactly one join in the tree (formatted plans
    // repeat each operator in the details section — count the tree
    // line, which carries the join type)
    assert("Join LeftOuter".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Join Inner") && !plan.contains("Join LeftSemi"),
      s"unexpected extra join:\n$plan")
  }

  test("plan sweep: no accidental cartesian products or RDD scans in any query") {
    // intentional cross joins: the cosine and PQ-ADC scorers
    // (corpus × broadcast query set — a BroadcastNestedLoopJoin over
    // a model-sized side, never a shuffled cartesian) and the 1-row
    // broadcast scalars carrying tf-idf's corpus size N and vocab
    // coverage's total token mass
    // (q_boilerplate's scalar is the corpus doc count; q_oov_rate
    // inherits vocab coverage's 1-row total through its vocab input)
    // (q_surprisal and q_bigram_ppl carry their 1-row total-token-count
    // scalar the same way vocab coverage does; q_ks_drift broadcasts
    // its 1-row sample-totals frame over the value histogram, and
    // q_psi_bins its totals+bucket-count row over the bucket frame;
    // q_water_fill broadcasts the 1-row water level back over the
    // per-group frame)
    // (q_cm_joinsize pairs its two 1-row scalars — the sketch
    // estimate and the exact join size — with a broadcast cross)
    // (q_mutual_info broadcasts its 1-row total-count scalar over
    // the |X|·|Y|-bounded cell frame, the q_psi_bins shape)
    // (q_modularity broadcasts its 1-row edge-count scalar over the
    // per-community frame)
    // (q_acf broadcasts its 1-row (n, S, Q) moment scalars over the
    // 10-row per-lag frame; q_js_drift its totals row over the bucket
    // frame, the q_psi_bins shape; q_assoc_rules its 1-row basket
    // count N over the frequent-pair frame; q_theil_sen its 1-row
    // point count and then its 1-row median slope; q_bootstrap_ci its
    // 1-row (n, Σx) totals twice — sample fan-out and the final line;
    // q_conductance its 1-row edge-count scalar over the per-community
    // frame, the q_modularity shape)
    val allowCross = Set("q_cosine_topk", "q_pq_adc", "q_tfidf_terms", "q_vocab_coverage",
      "q_boilerplate", "q_oov_rate", "q_surprisal", "q_bigram_ppl", "q_bm25", "q_ks_drift",
      "q_psi_bins", "q_water_fill", "q_cm_joinsize", "q_mutual_info", "q_modularity",
      "q_calibration", "q_kn_bigrams", "q_benford", "q_acf", "q_js_drift", "q_assoc_rules",
      "q_theil_sen", "q_bootstrap_ci", "q_conductance", "q_degree_dist",
      "q_knn_label", // knn inherits bruteForceTopK's corpus x broadcast-query cross, the q_cosine_topk shape
      "q_knn_noise", // same inherited scorer cross (leave-one-out audit over the labeled pool)
      "q_lift_curve", // 1-row (n, pos) totals broadcast over the ranked frame, the q_ks_drift shape
      "q_bootstrap_blb") // the q_bootstrap_ci shape: 1-row (n, Σx) totals broadcast twice (subset fan-out + final line)
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.optimizedPlan.toString
      if (!allowCross(name)) {
        assert(!plan.contains("Join Cross"), s"$name has a cross join:\n$plan")
      }
      assert(!plan.contains("ExistingRDD"), s"$name scans an RDD (breaks pushdown):\n$plan")
    }
  }

  test("flagship entry: broadcast dim join, no cartesian") {
    val df = SparkEntry.entry(spark)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("runtime bloom-filter pruning injects on a selective fact-dim join") {
    // at 100 TB the bloom filter built from the selective dim side is
    // pushed into the fact scan, skipping row groups server-side; the
    // thresholds are lowered here because the test tables are tiny
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val hi = spark.read.parquet(s"$sfDir/orders.parquet")
        .where(col("o_totalprice") > 400000).select(col("o_orderkey"))
      val j = li.join(hi, li("l_orderkey") === hi("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter_agg"), plan.take(4000))
      assert(plan.contains("might_contain"), plan.take(4000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
