import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode
val sfDir = "/root/testdata/sf0.01"
val picks = Seq(
  "q_scan_pushdown" -> "Filter + projection pushdown: both predicates and the 4-column ReadSchema reach the parquet scan.",
  "q_star_join" -> "Star join: both dims broadcast (no shuffle of the fact side); partial aggregation before the final exchange.",
  "q1_agg" -> "Classic grouped aggregate: two HashAggregate levels (map-side partial combine) around one exchange.",
  "q_minhash_lsh" -> "Near-dup LSH: shingle/signature/banding are narrow native projections (graft_* expressions inside WholeStageCodegen); the only exchanges are the clustered-set build, the band-bucket candidate join, and verification.",
  "q_ivf_topk" -> "IVF ANN: centroid assignment and probing are narrow projections over literal centroid arrays (native graft_qdot); the per-list candidate join broadcasts the probed query side.",
  "q_recap_daily" -> "Flagship recap: slot dedup -> hourly -> daily is three hash aggregates; all metric math is integer-cents; no joins until the broadcast dim.",
  "q_asof_join" -> "As-of join as union + window: ONE exchange on the key, one sort, a running last-non-null -- no range join, no BroadcastNestedLoop; cost is linear in |L|+|R|.",
  "q_range_join" -> "Point-in-interval join as a bucketed equi-join: intervals explode onto covered buckets, points hash to one bucket, exact range predicate post-filters -- shuffle-partitionable (SortMergeJoin on the bucket id), never a nested loop.",
  "q_pack_budget" -> "Sequence packing: one window sort per lang shard computing the running token total; bin and offset are pure projections on top -- a single exchange end to end.",
  "q_dedup_pipeline" -> "End-to-end dedup: shingle/minhash projections (graft_* native expressions) -> banded candidate join -> exact verify -> rep-space components -> anti-join survivors. The connected-components loop runs over localCheckpoint'd rep pairs, so its per-round plans are constant-size (not shown: the loop's internal jobs).",
  "q_embed_neardup" -> "Embedding near-dup: ONE fused native graft_sign_bands projection emits all 16 band buckets; narrow (16-byte) candidate rows through the band self-join + distinct; exact quantized-cosine verify joins. No cartesian anywhere.",
  "q_contamination" -> "Train/eval contamination: training side collapses to DISTINCT shingle hashes; eval shingles LEFT-join them ONCE (longs only, text never shuffles; empty docs ride a NULL sentinel) with per-doc re-aggregation on top -- a single join end to end.",
  "q_chunk_tokens" -> "Token chunking: tokenize -> start sequence -> posexplode -> slice is all map-side (Generate inside the scan stage); the only exchange is the deterministic output order.",
  "q_group_cap" -> "Per-group quota cap: ONE exchange on the group column feeding the rank window; the md5 selection order is a narrow native graft_hash60 projection (see capPerGroupPruned for the bounded-sort variant at cluster-scale groups).",
  "q_vocab_coverage" -> "Vocabulary coverage: one token hash aggregate (map-side partials), global top-k as TakeOrderedAndProject (no total sort), 1-row broadcast total; the cumulative window runs over the k survivors only.",
  "q_mix" -> "Weighted corpus mixture: per-source counts collapse to a broadcast cutoff table (one row per source); membership is a narrow graft_hash60 threshold filter -- the corpus is never repartitioned.",
  "q_boilerplate" -> "Boilerplate removal: posexplode units map-side, distinct-doc df via two hash aggregates, unit->df equi-join (AQE broadcasts the distinct-unit side), one order-preserving reassembly aggregate keyed by doc.",
  "q_curation_funnel" -> "Curation funnel: ONE conditional-aggregation scan -- every stage is a sum(CASE) over the cumulative predicate prefix; two HashAggregate levels around a single exchange, no per-stage passes.",
  "q_leak_split" -> "Leakage-safe split: the near-dup cluster machinery (native graft_* projections, banded candidates, rep-space components) feeds one narrow md5-cut-point projection on coalesce(cluster, doc_id) -- the split itself adds no shuffle beyond the cluster join.",
  "q_kmeans" -> "Trained k-means assignment: argmax cosine over LITERAL centroid-sum arrays (native graft_qdot inside WholeStageCodegen) -- a pure no-shuffle projection; the training loop's per-iteration jobs (assign + posexplode partial-agg sums) are driver-looped constant-size plans, not part of this final plan.",
  "q_semdedup" -> "SemDeDup: the trained-centroid assignment twice (narrow literal projections), a list_id self-equi-join scoped to each cluster, exact quantized-cosine verify -- the only exchanges are the two assignment sides of the cluster join; no cartesian.",
  "q_surprisal" -> "Unigram surprisal: one token-count hash aggregate (map-side partials), a token equi-join that reuses the count side's partitioning, the 1-row total as broadcast cross join, one doc_id aggregate; floor-log2 is integer bin()-length arithmetic, no IEEE log.",
  "q_substring_dedup" -> "Repeated-substring removal: gram HASHES only (graft_hash60) through posexplode -> groupBy(h) stats with partial aggregation (no hot-gram window sort) -> equi-join back -> bounded mask explode -> anti-join -> one ordered reassembly aggregate.",
  "q_bloom_anti" -> "Bloom-pre-filtered anti join: the definite-miss branch is a pure scan-side graft_bloom_might_contain filter (no exchange at all); only the maybe fraction reaches the exact anti join -- the big side's shuffle shrinks to join selectivity + fpp.",
  "q_bpe_pairs" -> "BPE pair counts: corpus collapses to the word-frequency dict in ONE hash aggregate; symbol explode and pair projection run over the VOCAB-sized dict, not the corpus; top-100 is TakeOrderedAndProject, no total sort.",
  "q_gopher_dupgram" -> "Duplicate-ngram char fraction: gram list built row-locally (map-side Generate), dup detection one (doc,gram) hash aggregate, covered positions exploded and DISTINCT-unioned, char sums re-keyed by doc -- every exchange is keyed by doc or (doc,gram), corpus-linear.",
  "q_bigram_ppl" -> "Bigram perplexity (stupid backoff): bigrams generate map-side from the token array (no window, no self-join); the two scoring joins and both stats aggregates key on graft_hash60 longs -- token text never shuffles; the 1-row total rides a broadcast scalar like q_surprisal.",
  "q_histogram_eqdepth" -> "Equi-depth histogram: globalNtile's quantile cuts pre-bucket the rows, so the tile window is PARTITIONED by bucket (no empty-partitionSpec single-task sort anywhere); broadcast per-bucket offsets turn local ranks into global tiles, then one tile aggregate.",
  "q_negatives" -> "Contrastive negatives: dense ids from the bucketed two-pass (no global window), then k partner ids are pure hash60-mod-N projections joined back to the id table on the DENSE id -- an equi-join the optimizer can shuffle-partition; no rand(), so the plan is deterministic and oracle-replicable.",
  "q_gopher_rules" -> "Gopher rule battery: a single row-local projection -- every metric and rule flag is higher-order-function arithmetic inside one WholeStageCodegen span over the scan; no exchange before the output order.",
  "q_global_ids" -> "Global row ids with NO global window: literal quantile cuts make the bucket a narrow projection, counts collapse to a broadcast offset map, and the only window is PARTITIONED by bucket -- each bucket sorts independently (contrast: row_number() OVER (ORDER BY ...) is one task).",
  "q_fuzzy_match" -> "Blocked fuzzy match: ONE equi-join on (block key, length band) generates candidates -- the length constraint lives IN the join key, with the small probe side exploded to adjacent bands; the packed-long bag-distance bound and the banded levenshtein verify run as codegen'd filters on joined rows. Candidate volume is sum of per-(block,band) products, never the full cross product.",
  "q_hashed_score" -> "Hashing-trick classifier inference: ZERO exchanges before the output sort -- the fixed-point weight vector is a literal array in the task binary and the whole score is one row-local aggregate over the token array inside WholeStageCodegen (model inference as a map).",
  "q_countmin" -> "Count-min sketch: the build shuffle carries at most depth*width counter rows per map partition (two HashAggregate levels -- the grid, not the data); probe cells are a narrow projection and the estimate is a LEFT join + min aggregate, all keyed on (r, c) ints.",
  "q_intervals" -> "Interval islands: one exchange keyed by user feeds the running-max window; island ids and the merged extents are a projection + one hash aggregate on top -- per-key sorts, nothing global.",
  "q_temp_mix" -> "Temperature mixture: group counts collapse to a broadcast cutoff row per group; membership is a narrow graft_hash60 threshold filter against the broadcast -- the corpus is never repartitioned.",
  "q_snapshot_diff" -> "Snapshot CDC: ONE full-outer sort-merge join on the key; status and old/new payloads are projections over the joined row; the unchanged majority is filtered before anything else sees it.",
  "q_heavy_hitters" -> "Sketch-gated heavy hitters: the count-min grid rides the task binary as a LITERAL map, so the gate is a narrow least-of-lookups filter inside WholeStageCodegen -- the exact groupBy's exchange carries only gated rows, never the full distinct-key set.",
  "q_quantile_sketch" -> "Mergeable quantile sketch: binning is one narrow projection (native graft_floor_log2 -- no string bin(), no IEEE log); the (group, bin) aggregate partial-combines map-side so the exchange carries bounded sketch rows; quantile read-off windows over the BOUNDED bin set.",
  "q_hll_portable" -> "Portable HLL: hash60/reg/rho are one narrow codegen'd projection; two hash aggregates (fine grain, then max-merge rollup) with map-side partials -- every exchange carries register rows, not data; the estimate is per-group arithmetic over <= 1024 registers.",
  "q_zorder" -> "Z-order key: the Morton interleave is 8 shift-or-mask steps per key inside ONE WholeStageCodegen projection over the scan -- no UDF, no shuffle before the output order; at write time this key feeds repartitionByRange so each file covers a tight (a,b) rectangle.",
  "q_embed_neardup_hi" -> "Tuned high-threshold near-dup: the twin-seeded corpus is a union of two narrow projections; ONE fused graft_sign_bands projection emits all 28 band buckets (336 planes); candidates stay 16-byte rows through the band self-join + distinct; exact quantized verify joins. ~0.7% of all-pairs reach the verify.",
  "q_pq_adc" -> "PQ ADC search: encode is a no-shuffle projection (argmin over LITERAL codebook arrays, native graft_qdot per subspace); scoring is corpus x broadcast-query rows with per-subspace literal table lookups; top-k finishes as a windowed rank over the bounded scored set.",
  "q_search_phrase" -> "Phrase search: per-term posting filters reuse ONE (token,doc) aggregate; the positional merge is an equi-join on doc_id with the offset predicate as a join filter -- only the two query terms' postings ever shuffle, never the corpus text.",
  "q_bm25" -> "BM25: doc lengths and corpus scalars derive from the SAME posting aggregate (text scanned once); the query-term slice joins df and dl on bounded sides; the 1-row scalar rides a broadcast; top-20 is TakeOrderedAndProject over per-doc fixed-order conditional sums.",
  "q_pagerank" -> "PageRank (final iteration shown): each round is one edges-join-ranks equi-join + one dst hash aggregate over localCheckpoint'd constant-size inputs (LogicalRDD scans) -- lineage never grows; ranks are exact scaled BIGINTs so the plan is free of IEEE accumulation order.",
  "q_cdc_apply" -> "CDC apply: the changelog collapses to one latest-per-key aggregate (window + max_by share ONE exchange on the key), then a single full-outer join against the snapshot -- cost |log|+|snapshot| regardless of history; bucketing the snapshot by key removes its exchange too.",
  "q_weighted_sample" -> "A-ES weighted sampling: the selection key ln(u)/w is a narrow hash-arithmetic projection; exactly-k selection plans as TakeOrderedAndProject -- no total sort, no shuffle of losers, the driver sees k rows at any corpus size.",
  "q_jaro_rank" -> "Jaro-Winkler ranking: skeleton-block equi-join generates candidates; the native graft_jaro_winkler scorer runs as a codegen'd projection on joined rows -- the same blocked-candidates-then-verify shape as q_fuzzy_match with a similarity scorer in place of edit distance.",
  "q_triangles" -> "Triangle counting: the oriented-edge frame is a localCheckpoint'd LogicalRDD feeding all THREE join inputs (both wedge sides + the closer) -- built once, scanned thrice; wedges form on one src equi-join with the orientation predicate as a join filter, close on a (b,c) equi-join, and the per-node count is one hash aggregate. Degree orientation caps out-degree at O(sqrt(m)), so no hot-key wedge explosion.",
  "q_hilbert" -> "Hilbert layout key: the 16-step reflect/rotate walk is ONE native graft_hilbert_key2 call inside WholeStageCodegen over the scan -- a pure-Column unroll would double the expression tree per step; like q_zorder, the key exists to feed repartitionByRange at write time.",
  "q_compaction_plan" -> "Compaction planning: one window over the FILE LISTING partitioned by table-partition (single exchange on source) -- the preceding-cumsum bin assignment is window arithmetic, keep/compact a projection; planning cost is metadata-sized however big the table is.",
  "q_domain_stats" -> "Domain stats: the whole URL normalization chain (fragment/scheme/port/www regexps) is a narrow codegen'd projection feeding one hash aggregate on (host, domain) -- normalization never shuffles, only the low-cardinality domain keys do.",
  "q_audio_decode" -> "Audio decode: WAV assembly (hex projection) and the mapPartitions decode are both narrow -- payloads never leave the executor; the only exchange is the output order. Same shape as q_media_decode with the PCM parser in place of the BMP parser.",
  "q_clustering" -> "Clustering coefficients: the truncated canonical frame (LogicalRDD) feeds both the degree aggregate and the orientation, the triangle pipeline reuses the truncated oriented frame thrice, and the coefficient is one |V|-sized left join + a single IEEE division in the projection.",
  "q_snapshot_prune" -> "Pruned snapshot read: file selection happens at PLANNING time from manifest zone maps (the scan's file list is already pruned -- fewer input files, not a runtime filter); the exact range predicate then pushes into the parquet scan of the surviving files."
)
val sb = new StringBuilder
sb.append("# EXPLAINS -- formatted plans of headline queries (sf0.01)\n\n")
sb.append("Generated by tools/gen_explains (spark-shell); re-generate after plan-shape changes.\n")
sb.append("What to look for: `PushedFilters`/`ReadSchema` on scans, `BroadcastHashJoin` on dims,\n")
sb.append("`WholeStageCodegen` spans over the graft_* native expressions, partial aggregation before exchanges.\n\n")
picks.foreach { case (name, note) =>
  val df = graft.SparkEntry.queries(name)(spark, sfDir)
  val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  sb.append(s"## $name\n\n$note\n\n```\n$plan```\n\n")
}
Files.writeString(Paths.get("/root/repo/EXPLAINS.md"), sb.toString)
println("WROTE " + sb.length)
sys.exit(0)
// Usage:
//   sbt package && /opt/spark/bin/spark-shell --master 'local[8]' \
//     --conf spark.sql.shuffle.partitions=8 --conf spark.ui.enabled=false \
//     --jars target/scala-2.13/etlweatherjabarspark_2.13-0.1.0.jar \
//     -i tools/gen_explains.scala
