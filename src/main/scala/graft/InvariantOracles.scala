package graft

/** Invariant oracles for the five queries whose FULL-REPLAY SQL
  * oracles are the wrong tool at sf1 (r10 verdict item #1): the
  * replays are correct but DuckDB re-inlines multiply-referenced
  * CTEs, so an unrolled round-chain re-executes the expensive base
  * CTE (the lineitem self-join, the quantized-corpus projection)
  * exponentially often — q_hits/q_kcore/q_modularity/q_ivfpq_topk
  * exhausted a 40 GiB spill budget at 6M rows, and q_dbscan's
  * recursive reachability CTE (O(component²) rows on a percolated
  * cloud) timed out from sf0.1 up. The engine side passes all 233 at
  * sf1; the hole was purely oracle-shaped.
  *
  * Each entry here is a STAGED check: a list of DuckDB statements
  * where every intermediate is `CREATE TEMP TABLE` (materialized
  * once, read cheaply — each statement is one or two linear passes,
  * never a recursion and never a re-inlined chain), and the LAST
  * statement SELECTs VIOLATION rows (chk, detail). Zero rows = the
  * engine's dumped output is verified. The runner
  * (`tools/oracle_compare_scale.py --invariant`) exposes the raw
  * tables, `result` (this query's own engine dump) and `r_<name>`
  * (every sibling query's dump) as views.
  *
  * Check shapes, per the r10 verdict's prescriptions:
  *  - q_kcore / q_hits: per-round TRANSITION checks — the same
  *    fixed-round recurrence, but each round starts from a
  *    materialized table, so round r is one join+aggregate over
  *    state r−1 (linear), and the final state must equal `result`
  *    exactly. This is strictly stronger than an invariant on the
  *    final state alone: every intermediate is re-derived and pinned.
  *  - q_modularity: recompute the one-pass formula from the ENGINE's
  *    own q_labelprop dump (`r_q_labelprop`) — valid because
  *    q_labelprop itself replay-passes at sf1 and the engine's
  *    modularity consumes the identical shared labels frame
  *    (Graphs.labelsBipartite is memoized; bit-identical by spec).
  *    The 3-round LPA unroll — the part that detonated — never runs.
  *  - q_dbscan: exact core/density recount (grid-bucketed pair
  *    join, the engine's own candidate structure), exact border/
  *    noise recompute, and a FULL INDEPENDENT RECOMPUTE of the core
  *    clustering by statically-unrolled large-star/small-star
  *    contraction (12 rounds, each a fixed set of linear joins over
  *    materialized temp tables — never a recursion) whose labels
  *    must equal the engine's exactly. Size-blind: over-merge and
  *    under-merge of ANY cluster size are both fully verified (r11
  *    verdict item #3 — this retires the old <=256-core-bounded
  *    reachability recursion and the 1-step large-cluster witness);
  *    a still-changing edge set after the last unrolled round emits
  *    its own `cc_unconverged` violation, so an exhausted unroll
  *    fails honestly-inconclusive instead of passing.
  *  - q_ivfpq_topk: full exact recompute with the ADC LOOKUP-TABLE
  *    factored out (50 queries × 4 subspaces × 16 codes = 3,200
  *    rows), so the candidate join carries three BIGINTs per row
  *    instead of 64-element lists — the carry weight, not the
  *    algorithm, was what spilled.
  *
  * The replay oracles in [[SparkEntry.oracleSql]] stay: they remain
  * the primary gate at sf0.001/0.01 (and pass at sf0.1 where
  * feasible); the invariants close the sf0.1+/sf1 hole.
  *
  * r14 adds an sf10 TIER — q_geo_radius / q_jaro_rank /
  * q_fuzzy_match, whose replays are green through sf1 but whose
  * candidate volumes grow superlinearly past it (the O(n²) pair
  * scan; the saturating consonant-skeleton blocking key: 6.0M
  * blocked pairs at sf1 → 397M at sf10, measured). Their staged
  * checks keep membership + completeness EXACT at any SF (expensive
  * string/distance kernels run only on the anti-set) and recompute
  * values exactly on a pinned 1-in-37 stratum — each entry's
  * Scaladoc states precisely what is exact and what is sampled.
  */
object InvariantOracles {

  /** One peel-round pair: survivors of edge table `prev` at k=8, and
    * the induced edge set. */
  private def kcoreRound(prev: String, s: String, next: String): Seq[String] = Seq(
    s"""CREATE TEMP TABLE $s AS
       |SELECT id FROM (SELECT src AS id FROM $prev UNION ALL SELECT dst FROM $prev)
       |GROUP BY id HAVING count(*) >= 8""".stripMargin,
    s"""CREATE TEMP TABLE $next AS
       |SELECT e.src, e.dst FROM $prev e
       |JOIN $s x ON x.id = e.src JOIN $s y ON y.id = e.dst""".stripMargin)

  private val kcore: Seq[String] = Seq(
    // the expensive base — the quarter-orders co-occurrence self-join
    // — materialized exactly ONCE (the replay re-executed it ~3^rounds
    // times through CTE inlining)
    """CREATE TEMP TABLE kc_e0 AS
      |SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |WHERE a.l_orderkey % 4 = 0""".stripMargin) ++
    kcoreRound("kc_e0", "kc_s1", "kc_e1") ++
    kcoreRound("kc_e1", "kc_s2", "kc_e2") ++
    kcoreRound("kc_e2", "kc_s3", "kc_e3") ++ Seq(
    """CREATE TEMP TABLE kc_deg AS
      |SELECT id, CAST(count(*) AS BIGINT) AS deg
      |FROM (SELECT src AS id FROM kc_e3 UNION ALL SELECT dst FROM kc_e3)
      |GROUP BY id""".stripMargin,
    """SELECT * FROM (
      |  SELECT 'kcore_round3_mismatch' AS chk,
      |    CAST(COALESCE(r.id, g.id) AS VARCHAR) AS detail
      |  FROM result r FULL OUTER JOIN kc_deg g ON g.id = r.id
      |  WHERE r.id IS NULL OR g.id IS NULL OR r.deg != g.deg
      |) LIMIT 20""".stripMargin)

  /** One HITS half-step: gather `srcCol -> dstCol` sums of `valCol`
    * from state table `prev` into raw table `raw`, then rescale by
    * ceil(max/1e9) into `next`. Two statements, each one pass. */
  private def hitsHalf(raw: String, next: String, prev: String,
                       gatherBy: String, joinOn: String, c: String): Seq[String] = Seq(
    s"""CREATE TEMP TABLE $raw AS
       |SELECT n.id, COALESCE(s.s, 0) AS $c FROM ht_n n LEFT JOIN (
       |  SELECT e.$gatherBy AS id, CAST(sum(p.v) AS BIGINT) AS s
       |  FROM ht_e e JOIN $prev p ON p.id = e.$joinOn GROUP BY 1) s ON s.id = n.id""".stripMargin,
    s"""CREATE TEMP TABLE $next AS
       |SELECT id, $c // GREATEST(1, ((SELECT max($c) FROM $raw) + 999999999) // 1000000000) AS v
       |FROM $raw""".stripMargin)

  private val hits: Seq[String] = Seq(
    """CREATE TEMP TABLE ht_e AS
      |SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem""".stripMargin,
    """CREATE TEMP TABLE ht_n AS
      |SELECT src AS id FROM ht_e UNION SELECT dst FROM ht_e""".stripMargin,
    """CREATE TEMP TABLE ht_h0 AS SELECT id, CAST(1 AS BIGINT) AS v FROM ht_n""".stripMargin) ++
    // iteration 1: auth gathers hub over in-edges (by dst), hub
    // gathers auth over out-edges (by src)
    hitsHalf("ht_a1r", "ht_a1", "ht_h0", "dst", "src", "auth") ++
    hitsHalf("ht_h1r", "ht_h1", "ht_a1", "src", "dst", "hub") ++
    hitsHalf("ht_a2r", "ht_a2", "ht_h1", "dst", "src", "auth") ++
    hitsHalf("ht_h2r", "ht_h2", "ht_a2", "src", "dst", "hub") ++ Seq(
    """SELECT * FROM (
      |  SELECT 'hits_iter2_mismatch' AS chk,
      |    CAST(COALESCE(r.id, h.id) AS VARCHAR) AS detail
      |  FROM result r FULL OUTER JOIN (
      |    SELECT h2.id, h2.v AS hub, a2.v AS auth
      |    FROM ht_h2 h2 JOIN ht_a2 a2 ON a2.id = h2.id) h ON h.id = r.id
      |  WHERE r.id IS NULL OR h.id IS NULL OR r.hub != h.hub OR r.auth != h.auth
      |) LIMIT 20""".stripMargin)

  private val modularity: Seq[String] = Seq(
    """CREATE TEMP TABLE md_ed AS
      |SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem""".stripMargin,
    """CREATE TEMP TABLE md_e AS
      |SELECT src, dst FROM md_ed UNION ALL SELECT dst AS src, src AS dst FROM md_ed""".stripMargin,
    // the engine's OWN labelprop dump — replay-verified at every SF
    // including sf1, and bit-identical to the labels frame the
    // engine's modularity consumed (shared memoized build)
    """CREATE TEMP TABLE md_lab AS SELECT id, lab FROM r_q_labelprop""".stripMargin,
    """CREATE TEMP TABLE md_deg AS
      |SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM md_e GROUP BY 1""".stripMargin,
    """CREATE TEMP TABLE md_chk AS
      |WITH m2t AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM md_e),
      |intra AS (
      |  SELECT ls.lab AS lab, CAST(count(*) AS BIGINT) AS intra_edges
      |  FROM md_e e JOIN md_lab ls ON ls.id = e.src JOIN md_lab ld ON ld.id = e.dst
      |  WHERE ls.lab = ld.lab GROUP BY 1),
      |mass AS (
      |  SELECT l.lab, CAST(sum(d.deg) AS BIGINT) AS degree_mass
      |  FROM md_deg d JOIN md_lab l ON l.id = d.id GROUP BY 1)
      |SELECT CAST(mass.lab AS BIGINT) AS lab,
      |  CAST(COALESCE(intra.intra_edges, 0) AS BIGINT) AS intra_edges,
      |  mass.degree_mass,
      |  CAST(round(1e9 * (
      |    CAST(COALESCE(intra.intra_edges, 0) AS DOUBLE) / CAST(m2 AS DOUBLE) -
      |    (CAST(degree_mass AS DOUBLE) / CAST(m2 AS DOUBLE)) *
      |    (CAST(degree_mass AS DOUBLE) / CAST(m2 AS DOUBLE)))) AS BIGINT) AS q_nano
      |FROM mass LEFT JOIN intra USING (lab), m2t""".stripMargin,
    """SELECT * FROM (
      |  SELECT 'modularity_mismatch' AS chk,
      |    CAST(COALESCE(r.lab, c.lab) AS VARCHAR) AS detail
      |  FROM result r FULL OUTER JOIN md_chk c ON c.lab = r.lab
      |  WHERE r.lab IS NULL OR c.lab IS NULL OR r.intra_edges != c.intra_edges
      |     OR r.degree_mass != c.degree_mass OR r.q_nano != c.q_nano
      |  UNION ALL
      |  SELECT 'unlabeled_endpoint', CAST(e.src AS VARCHAR)
      |  FROM md_e e LEFT JOIN md_lab l ON l.id = e.src WHERE l.id IS NULL
      |) LIMIT 20""".stripMargin)

  private val dbscan: Seq[String] = Seq(
    """CREATE TEMP TABLE db_p AS
      |SELECT c_custkey AS id,
      |  CAST(concat('0x', substr(md5(concat('gx', CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 AS x,
      |  CAST(concat('0x', substr(md5(concat('gy', CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 AS y
      |FROM customer""".stripMargin,
    """CREATE TEMP TABLE db_g AS
      |SELECT id, x, y, x // 20000 AS cx, y // 20000 AS cy FROM db_p""".stripMargin,
    // grid-bucketed candidate join (complete: |dx|<=eps puts two
    // points at most one 20000-wide cell apart) — the replay used the
    // full O(n^2) inequality pair scan
    """CREATE TEMP TABLE db_pairs AS
      |SELECT a.id AS id_a, b.id AS id_b
      |FROM db_g a
      |JOIN (SELECT g.id, g.x, g.y, g.cx + d.dx AS cx, g.cy + d.dy AS cy
      |      FROM db_g g CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)) d(dx, dy)) b
      |  ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
      |WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 400000000""".stripMargin,
    """CREATE TEMP TABLE db_deg AS
      |SELECT id, CAST(count(*) AS BIGINT) AS n_nb
      |FROM (SELECT id_a AS id FROM db_pairs UNION ALL SELECT id_b FROM db_pairs)
      |GROUP BY id""".stripMargin,
    """CREATE TEMP TABLE db_res AS SELECT id, role, cluster_id FROM result""".stripMargin,
    // exact border recompute from the engine's core labels: non-core
    // with a core neighbor -> min core-neighbor cluster
    """CREATE TEMP TABLE db_border AS
      |SELECT s.id, min(cr.cluster_id) AS cluster_id
      |FROM (SELECT id_a AS id, id_b AS nb FROM db_pairs
      |      UNION ALL SELECT id_b, id_a FROM db_pairs) s
      |JOIN db_res cr ON cr.id = s.nb AND cr.role = 'core'
      |JOIN db_res me ON me.id = s.id AND me.role != 'core'
      |GROUP BY 1""".stripMargin,
    // ---- FULL independent recompute of the core clustering (r11
    // verdict item #3 — retires the <=256-bounded reachability
    // recursion AND the 1-step large-cluster witness): statically
    // unrolled LARGE-STAR / SMALL-STAR contraction (Kiveris et al.
    // SoCC 2014, the engine's own algorithm — provably O(log² n)
    // rounds on ANY topology), each round a fixed set of LINEAR
    // joins/aggregates over materialized temp tables, never a
    // recursion. The final label comparison is size-blind, so
    // over-merge AND under-merge of clusters of ANY size are both
    // fully verified; an unconverged unroll (edge set still changing
    // after the last round) emits its own violation row — the gate
    // then fails HONESTLY-INCONCLUSIVE instead of passing wrongly.
    // Unroll depth 12: the engine's measured convergence on the
    // percolated sf0.1 cloud is ~5 rounds and the bound grows as
    // log², so 12 carries orders-of-magnitude headroom; rounds after
    // the fixpoint are idempotent no-ops over the tiny star set. ----
    """CREATE TEMP TABLE db_cc_core AS
      |SELECT id FROM db_deg WHERE n_nb >= 2""".stripMargin,
    """CREATE TEMP TABLE db_cc_e1 AS
      |SELECT DISTINCT least(p.id_a, p.id_b) AS a, greatest(p.id_a, p.id_b) AS b
      |FROM db_pairs p
      |JOIN db_cc_core x ON x.id = p.id_a JOIN db_cc_core y ON y.id = p.id_b
      |WHERE p.id_a != p.id_b""".stripMargin) ++
    (1 to 12).flatMap(starRound) ++ Seq(
    """CREATE TEMP TABLE db_cc_lab AS
      |SELECT c.id, COALESCE(mc.comp, c.id) AS comp
      |FROM db_cc_core c LEFT JOIN (
      |  SELECT b AS id, min(a) AS comp FROM db_cc_e13 GROUP BY 1) mc USING (id)""".stripMargin,
    """SELECT * FROM (
      |  SELECT 'point_set_mismatch' AS chk, CAST(COALESCE(p.id, r.id) AS VARCHAR) AS detail
      |  FROM db_p p FULL OUTER JOIN db_res r ON r.id = p.id
      |  WHERE p.id IS NULL OR r.id IS NULL
      |  UNION ALL
      |  SELECT 'core_role_mismatch', CAST(r.id AS VARCHAR)
      |  FROM db_res r LEFT JOIN db_deg d ON d.id = r.id
      |  WHERE (COALESCE(d.n_nb, 0) >= 2) != (r.role = 'core')
      |  UNION ALL
      |  SELECT 'cc_unconverged', CAST(COALESCE(x.a, y.a) AS VARCHAR)
      |  FROM db_cc_e13 x FULL OUTER JOIN db_cc_e12 y ON y.a = x.a AND y.b = x.b
      |  WHERE x.a IS NULL OR y.a IS NULL
      |  UNION ALL
      |  SELECT 'core_label_mismatch', CAST(COALESCE(r.id, l.id) AS VARCHAR)
      |  FROM (SELECT id, cluster_id FROM db_res WHERE role = 'core') r
      |  FULL OUTER JOIN db_cc_lab l ON l.id = r.id
      |  WHERE r.id IS NULL OR l.id IS NULL OR r.cluster_id != l.comp
      |  UNION ALL
      |  SELECT 'border_mismatch', CAST(COALESCE(r.id, b.id) AS VARCHAR)
      |  FROM (SELECT id, cluster_id FROM db_res WHERE role = 'border') r
      |  FULL OUTER JOIN db_border b ON b.id = r.id
      |  WHERE r.id IS NULL OR b.id IS NULL OR r.cluster_id != b.cluster_id
      |  UNION ALL
      |  SELECT 'noise_has_cluster', CAST(id AS VARCHAR)
      |  FROM db_res WHERE role = 'noise' AND cluster_id IS NOT NULL
      |) LIMIT 20""".stripMargin)

  /** One large-star + small-star round over canonical edge table
    * `cc_e<r>` → `cc_e<r+1>` — the exact DuckDB mirror of
    * [[graft.operators.Components.connectedComponentsStars]]'s loop
    * body: large-star hooks every LARGER neighbor to the local min,
    * small-star flattens the rest (and the node itself) into stars.
    * Six statements, each one linear pass — no recursion, no CTE
    * re-inlining. */
  private def starRound(r: Int): Seq[String] = {
    val (prev, s1, m1, ls, s2, m2, next) =
      (s"db_cc_e$r", s"db_cc_s1_$r", s"db_cc_m1_$r", s"db_cc_ls_$r",
        s"db_cc_s2_$r", s"db_cc_m2_$r", s"db_cc_e${r + 1}")
    Seq(
      s"CREATE TEMP TABLE $s1 AS SELECT a AS u, b AS v FROM $prev UNION ALL SELECT b, a FROM $prev",
      s"CREATE TEMP TABLE $m1 AS SELECT u, least(u, min(v)) AS m FROM $s1 GROUP BY 1",
      s"""CREATE TEMP TABLE $ls AS
         |SELECT DISTINCT least(s.v, m.m) AS a, greatest(s.v, m.m) AS b
         |FROM $s1 s JOIN $m1 m USING (u) WHERE s.v > s.u AND s.v != m.m""".stripMargin,
      s"CREATE TEMP TABLE $s2 AS SELECT a AS u, b AS v FROM $ls UNION ALL SELECT b, a FROM $ls",
      s"CREATE TEMP TABLE $m2 AS SELECT u, least(u, min(v)) AS m FROM $s2 GROUP BY 1",
      s"""CREATE TEMP TABLE $next AS
         |SELECT DISTINCT least(q.x, q.y) AS a, greatest(q.x, q.y) AS b FROM (
         |  SELECT s.v AS x, m.m AS y FROM $s2 s JOIN $m2 m USING (u) WHERE s.v < s.u
         |  UNION ALL
         |  SELECT u AS x, m AS y FROM $m2) q
         |WHERE q.x != q.y""".stripMargin)
  }

  private val ivfpq: Seq[String] = Seq(
    """CREATE TEMP TABLE iv_qz AS
      |SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
      |FROM embeddings""".stripMargin,
    """CREATE TEMP TABLE iv_nrm AS
      |SELECT vec_id, v,
      |  sqrt(CAST(CAST(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i])) AS BIGINT) AS DOUBLE)) AS nv
      |FROM iv_qz""".stripMargin,
    """CREATE TEMP TABLE iv_coarse AS
      |SELECT vec_id AS cid, v AS cv, nv AS cn FROM iv_nrm WHERE vec_id < 8""".stripMargin,
    """CREATE TEMP TABLE iv_cent AS
      |SELECT vec_id AS cid, v AS cv FROM iv_qz WHERE vec_id < 16""".stripMargin,
    // coarse scores materialized NARROW (vec_id, cid, rn) — the
    // replay carried the 64-element lists through this window twice
    """CREATE TEMP TABLE iv_cscore AS
      |SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
      |FROM (
      |  SELECT n.vec_id, c.cid,
      |    CAST(CAST(list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i]*c.cv[i])) AS BIGINT) AS DOUBLE)/(n.nv*c.cn) AS cos
      |  FROM iv_nrm n CROSS JOIN iv_coarse c)""".stripMargin,
    """CREATE TEMP TABLE iv_assign AS
      |SELECT vec_id AS corpus_id, cid AS list_id FROM iv_cscore WHERE rn = 1""".stripMargin,
    """CREATE TEMP TABLE iv_probes AS
      |SELECT vec_id AS query_id, cid AS list_id FROM iv_cscore WHERE rn <= 2 AND vec_id < 50""".stripMargin,
    """CREATE TEMP TABLE iv_codes AS
      |SELECT vec_id AS corpus_id, s, min([d, cid])[2] AS code FROM (
      |  SELECT q.vec_id, s.s, c.cid,
      |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
      |      (q.v[s.s*16 + i] - c.cv[s.s*16 + i]) * (q.v[s.s*16 + i] - c.cv[s.s*16 + i]))) AS BIGINT) AS d
      |  FROM iv_qz q, (SELECT unnest(generate_series(0, 3)) AS s) s, iv_cent c)
      |GROUP BY 1, 2""".stripMargin,
    // the ADC lookup table: 50 queries x 4 subspaces x 16 codes —
    // after this, no statement touches a vector again
    """CREATE TEMP TABLE iv_lut AS
      |SELECT q.vec_id AS query_id, s.s, c.cid AS code,
      |  CAST(list_sum(list_transform(generate_series(1, 16), i ->
      |    (q.v[s.s*16 + i] - c.cv[s.s*16 + i]) * (q.v[s.s*16 + i] - c.cv[s.s*16 + i]))) AS BIGINT) AS d
      |FROM iv_qz q, (SELECT unnest(generate_series(0, 3)) AS s) s, iv_cent c
      |WHERE q.vec_id < 50""".stripMargin,
    """CREATE TEMP TABLE iv_adc AS
      |SELECT p.query_id, a.corpus_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
      |FROM iv_assign a
      |JOIN iv_probes p ON p.list_id = a.list_id AND p.query_id != a.corpus_id
      |JOIN iv_codes c ON c.corpus_id = a.corpus_id
      |JOIN iv_lut l ON l.query_id = p.query_id AND l.s = c.s AND l.code = c.code
      |GROUP BY 1, 2""".stripMargin,
    """CREATE TEMP TABLE iv_top AS
      |SELECT query_id, corpus_id, adc_dist, CAST(rnk AS INT) AS rnk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, corpus_id) AS rnk
      |  FROM iv_adc)
      |WHERE rnk <= 3""".stripMargin,
    """SELECT * FROM (
      |  SELECT 'ivfpq_topk_mismatch' AS chk,
      |    CAST(COALESCE(r.query_id, t.query_id) AS VARCHAR) || ':' ||
      |    CAST(COALESCE(r.rnk, t.rnk) AS VARCHAR) AS detail
      |  FROM result r FULL OUTER JOIN iv_top t
      |    ON t.query_id = r.query_id AND t.rnk = r.rnk
      |  WHERE r.query_id IS NULL OR t.query_id IS NULL
      |     OR r.corpus_id != t.corpus_id OR r.adc_dist != t.adc_dist
      |) LIMIT 20""".stripMargin)

  /** q_ivfpq_indexed's staged list (r13 verdict item #4/what's-wrong
    * #4): the SAME exact top-k recompute as the fused form — the
    * probe returns the identical approximation — PLUS a LAYOUT
    * certificate: the engine's q_ivfpq_layout dump (one row per
    * centroid-sidecar entry with the row count of its persisted
    * list_id partition, read from the index bytes the probe scans)
    * must reconcile per-list against the coarse assignment recomputed
    * here from the raw embeddings. A stale, truncated, or
    * mis-partitioned persisted index that still returns plausible
    * top-k rows — the case the fused invariant is structurally blind
    * to, since it never reads the index — fails THIS check: wrong
    * per-list counts, a missing list directory, or a sidecar id set
    * that doesn't match. The full-outer join also pins the corpus
    * total (equal id sets + equal per-list counts ⇒ equal sums). */
  private val ivfpqIndexed: Seq[String] = ivfpq.dropRight(1) ++ Seq(
    """CREATE TEMP TABLE iv_layout_expect AS
      |SELECT c.cid AS list_id, CAST(COALESCE(x.n, 0) AS BIGINT) AS n_rows
      |FROM (SELECT vec_id AS cid FROM embeddings WHERE vec_id < 8) c
      |LEFT JOIN (SELECT list_id, count(*) AS n FROM iv_assign GROUP BY 1) x
      |  ON x.list_id = c.cid""".stripMargin,
    """SELECT * FROM (
      |  SELECT 'ivfpq_topk_mismatch' AS chk,
      |    CAST(COALESCE(r.query_id, t.query_id) AS VARCHAR) || ':' ||
      |    CAST(COALESCE(r.rnk, t.rnk) AS VARCHAR) AS detail
      |  FROM result r FULL OUTER JOIN iv_top t
      |    ON t.query_id = r.query_id AND t.rnk = r.rnk
      |  WHERE r.query_id IS NULL OR t.query_id IS NULL
      |     OR r.corpus_id != t.corpus_id OR r.adc_dist != t.adc_dist
      |  UNION ALL
      |  SELECT 'ivfpq_layout_count_mismatch',
      |    CAST(COALESCE(l.list_id, g.list_id) AS VARCHAR)
      |  FROM r_q_ivfpq_layout l FULL OUTER JOIN iv_layout_expect g
      |    ON g.list_id = l.list_id
      |  WHERE l.list_id IS NULL OR g.list_id IS NULL OR l.n_rows != g.n_rows
      |) LIMIT 20""".stripMargin)

  /** q_geo_radius at sf10 (r14): the REPLAY oracle is the O(n²)
    * inequality pair scan (`JOIN p b ON a.id < b.id`) — 2.25e12
    * candidate pairs at 1.5M customers, measured-infeasible an order
    * of magnitude past the gate budget (290 s at sf1 scales with the
    * SQUARE of point count at fixed 1e6×1e6 extent). This staged
    * check recomputes the FULL pair set through the engine's own
    * grid-bucket structure (cell width = eps ⇒ any pair within eps
    * is at most one cell apart — complete, same argument as the
    * dbscan invariant's db_pairs) and compares the two pair multisets
    * EXACTLY via per-bucket (count, hash-sum) reconciliation — the
    * recomputed join streams straight into a 64-bucket aggregate, so
    * the ~1.4e9-row pair set at sf10 is never materialized on either
    * side. Equal unique-keyed sets ⇒ equal bucket digests; a single
    * changed/missing/extra (id_a, id_b, dist2) row flips its
    * bucket's count or hash-sum. Soundness AND completeness are both
    * fully covered (dist2 participates in the hash). */
  private val geoRadius: Seq[String] = Seq(
    """CREATE TEMP TABLE gr_g AS
      |SELECT id, x, y, x // 20000 AS cx, y // 20000 AS cy FROM (
      |  SELECT c_custkey AS id,
      |    CAST(concat('0x', substr(md5(concat('gx', CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 AS x,
      |    CAST(concat('0x', substr(md5(concat('gy', CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 AS y
      |  FROM customer)""".stripMargin,
    // the full grid-join pair recompute, streamed into 64 bucket
    // digests in ONE statement (no pair materialization)
    """CREATE TEMP TABLE gr_sum_g AS
      |SELECT id_a % 64 AS bkt, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(hash(CAST(id_a AS VARCHAR) || ',' || CAST(id_b AS VARCHAR) || ',' || CAST(dist2 AS VARCHAR)) AS HUGEINT)) AS HUGEINT) AS h
      |FROM (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |    (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist2
      |  FROM gr_g a
      |  JOIN (SELECT g.id, g.x, g.y, g.cx + d.dx AS cx, g.cy + d.dy AS cy
      |        FROM gr_g g CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)) d(dx, dy)) b
      |    ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
      |  WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 400000000)
      |GROUP BY 1""".stripMargin,
    """CREATE TEMP TABLE gr_sum_r AS
      |SELECT id_a % 64 AS bkt, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(hash(CAST(id_a AS VARCHAR) || ',' || CAST(id_b AS VARCHAR) || ',' || CAST(dist2 AS VARCHAR)) AS HUGEINT)) AS HUGEINT) AS h
      |FROM result GROUP BY 1""".stripMargin,
    """SELECT * FROM (
      |  SELECT 'geo_pairs_bucket_mismatch' AS chk,
      |    CAST(COALESCE(r.bkt, g.bkt) AS VARCHAR) AS detail
      |  FROM gr_sum_r r FULL OUTER JOIN gr_sum_g g ON g.bkt = r.bkt
      |  WHERE r.bkt IS NULL OR g.bkt IS NULL OR r.n != g.n OR r.h != g.h
      |) LIMIT 20""".stripMargin)

  /** q_jaro_rank at sf10 (r14): the blocking key (consonant skeleton
    * of a 5-word name from a fixed vocabulary) saturates, so blocked
    * candidate pairs grow SUPERLINEARLY — measured 6.0M at sf1 →
    * 397M at sf10 (66×), putting the full per-pair Jaro–Winkler
    * replay (~30 µs/pair in DuckDB) hours past the budget. The
    * staged check splits the guarantee:
    *  - MEMBERSHIP (exact, all rows): every result pair exists in
    *    the recomputed blocked candidate set — no fabricated pairs.
    *  - COMPLETENESS (exact, all rows): every candidate pair absent
    *    from the result is recomputed and must score BELOW the 0.9
    *    threshold — JW runs only on the anti-set, which is small
    *    because near-identical skeletons almost always pass.
    *  - VALUE SOUNDNESS (deterministic 1-in-37 stratum): jw_e9 is
    *    recomputed exactly for every result row whose pair hash lands
    *    in the stratum. A wrong score OUTSIDE the stratum on a pair
    *    that legitimately belongs in the result is the one class this
    *    stages does not fully cover at sf10 — stated here openly; the
    *    full replay covers it at sf0.001–sf1. */
  private val jaroRank: Seq[String] = Seq(
    """CREATE TEMP TABLE jr_dirty AS
      |SELECT p_partkey AS dirty_id, replace(p_name, 'e', '') AS dirty_name,
      |  regexp_replace(lower(trim(replace(p_name, 'e', ''))), '[aeiou ]', '', 'g') AS blk
      |FROM part WHERE p_partkey % 11 = 0""".stripMargin,
    """CREATE TEMP TABLE jr_cat AS
      |SELECT p_partkey, p_name,
      |  regexp_replace(lower(trim(p_name)), '[aeiou ]', '', 'g') AS blk
      |FROM part""".stripMargin,
    """CREATE TEMP TABLE jr_cand AS
      |SELECT d.dirty_id, c.p_partkey FROM jr_dirty d JOIN jr_cat c ON d.blk = c.blk""".stripMargin,
    """CREATE TEMP TABLE jr_res AS
      |SELECT dirty_id, p_partkey, jw_e9 FROM result""".stripMargin,
    // membership: result ⊆ candidates (exact, ids only)
    """CREATE TEMP TABLE jr_v_member AS
      |SELECT 'jaro_pair_not_candidate' AS chk,
      |  CAST(r.dirty_id AS VARCHAR) || ':' || CAST(r.p_partkey AS VARCHAR) AS detail
      |FROM jr_res r LEFT JOIN jr_cand c
      |  ON c.dirty_id = r.dirty_id AND c.p_partkey = r.p_partkey
      |WHERE c.dirty_id IS NULL""".stripMargin,
    // completeness: JW only on candidates MISSING from the result
    """CREATE TEMP TABLE jr_v_missing AS
      |SELECT 'jaro_missing_pair' AS chk,
      |  CAST(m.dirty_id AS VARCHAR) || ':' || CAST(m.p_partkey AS VARCHAR) AS detail
      |FROM (SELECT c.dirty_id, c.p_partkey FROM jr_cand c
      |      LEFT JOIN jr_res r ON r.dirty_id = c.dirty_id AND r.p_partkey = c.p_partkey
      |      WHERE r.dirty_id IS NULL) m
      |JOIN jr_dirty d ON d.dirty_id = m.dirty_id
      |JOIN jr_cat c2 ON c2.p_partkey = m.p_partkey
      |WHERE CAST(round(jaro_winkler_similarity(d.dirty_name, c2.p_name) * CAST(1000000000.0 AS DOUBLE)) AS BIGINT) >= 900000000""".stripMargin,
    // value soundness on the pinned 1-in-37 stratum
    """CREATE TEMP TABLE jr_v_stratum AS
      |SELECT 'jaro_stratum_jw_mismatch' AS chk,
      |  CAST(r.dirty_id AS VARCHAR) || ':' || CAST(r.p_partkey AS VARCHAR) AS detail
      |FROM jr_res r
      |JOIN jr_dirty d ON d.dirty_id = r.dirty_id
      |JOIN jr_cat c ON c.p_partkey = r.p_partkey
      |WHERE hash(CAST(r.dirty_id AS VARCHAR) || ':' || CAST(r.p_partkey AS VARCHAR)) % 37 = 0
      |  AND (CAST(round(jaro_winkler_similarity(d.dirty_name, c.p_name) * CAST(1000000000.0 AS DOUBLE)) AS BIGINT) != r.jw_e9
      |       OR r.jw_e9 < 900000000)""".stripMargin,
    """SELECT * FROM (
      |  SELECT chk AS chk, detail FROM jr_v_member
      |  UNION ALL SELECT chk AS chk, detail FROM jr_v_missing
      |  UNION ALL SELECT chk AS chk, detail FROM jr_v_stratum
      |) LIMIT 20""".stripMargin)

  /** q_fuzzy_match at sf10 (r14): same superlinear blocked-candidate
    * growth as q_jaro_rank (same consonant-skeleton key, mod-7 dirty
    * slice), so the full per-pair Levenshtein replay is
    * measured-infeasible. Split guarantee, mirroring jaroRank:
    * membership + carried-string exactness + completeness are EXACT
    * over all rows (Levenshtein runs only on the anti-set);
    * the dist VALUE is recomputed on the pinned 1-in-37 stratum. */
  private val fuzzyMatch: Seq[String] = Seq(
    """CREATE TEMP TABLE fz_dirty AS
      |SELECT p_partkey AS dirty_id, replace(p_name, 'e', '') AS dirty_name,
      |  regexp_replace(lower(trim(replace(p_name, 'e', ''))), '[aeiou ]', '', 'g') AS blk
      |FROM part WHERE p_partkey % 7 = 0""".stripMargin,
    """CREATE TEMP TABLE fz_cat AS
      |SELECT p_partkey, p_name,
      |  regexp_replace(lower(trim(p_name)), '[aeiou ]', '', 'g') AS blk
      |FROM part""".stripMargin,
    """CREATE TEMP TABLE fz_cand AS
      |SELECT d.dirty_id, c.p_partkey FROM fz_dirty d JOIN fz_cat c ON d.blk = c.blk
      |WHERE abs(len(d.dirty_name) - len(c.p_name)) <= 2""".stripMargin,
    """CREATE TEMP TABLE fz_res AS
      |SELECT dirty_id, p_partkey, dirty_name, p_name, dist FROM result""".stripMargin,
    // carried strings must be THE strings for those ids (exact)
    """CREATE TEMP TABLE fz_v_strings AS
      |SELECT 'fuzzy_carried_string_mismatch' AS chk,
      |  CAST(r.dirty_id AS VARCHAR) || ':' || CAST(r.p_partkey AS VARCHAR) AS detail
      |FROM fz_res r
      |LEFT JOIN fz_dirty d ON d.dirty_id = r.dirty_id
      |LEFT JOIN fz_cat c ON c.p_partkey = r.p_partkey
      |WHERE d.dirty_id IS NULL OR c.p_partkey IS NULL
      |   OR r.dirty_name != d.dirty_name OR r.p_name != c.p_name""".stripMargin,
    """CREATE TEMP TABLE fz_v_member AS
      |SELECT 'fuzzy_pair_not_candidate' AS chk,
      |  CAST(r.dirty_id AS VARCHAR) || ':' || CAST(r.p_partkey AS VARCHAR) AS detail
      |FROM fz_res r LEFT JOIN fz_cand c
      |  ON c.dirty_id = r.dirty_id AND c.p_partkey = r.p_partkey
      |WHERE c.dirty_id IS NULL""".stripMargin,
    // completeness: Levenshtein only on candidates missing from result
    """CREATE TEMP TABLE fz_v_missing AS
      |SELECT 'fuzzy_missing_pair' AS chk,
      |  CAST(m.dirty_id AS VARCHAR) || ':' || CAST(m.p_partkey AS VARCHAR) AS detail
      |FROM (SELECT c.dirty_id, c.p_partkey FROM fz_cand c
      |      LEFT JOIN fz_res r ON r.dirty_id = c.dirty_id AND r.p_partkey = c.p_partkey
      |      WHERE r.dirty_id IS NULL) m
      |JOIN fz_dirty d ON d.dirty_id = m.dirty_id
      |JOIN fz_cat c2 ON c2.p_partkey = m.p_partkey
      |WHERE levenshtein(d.dirty_name, c2.p_name) <= 2""".stripMargin,
    """CREATE TEMP TABLE fz_v_stratum AS
      |SELECT 'fuzzy_stratum_dist_mismatch' AS chk,
      |  CAST(dirty_id AS VARCHAR) || ':' || CAST(p_partkey AS VARCHAR) AS detail
      |FROM fz_res
      |WHERE hash(CAST(dirty_id AS VARCHAR) || ':' || CAST(p_partkey AS VARCHAR)) % 37 = 0
      |  AND (CAST(levenshtein(dirty_name, p_name) AS INT) != dist OR dist > 2)""".stripMargin,
    """SELECT * FROM (
      |  SELECT chk AS chk, detail FROM fz_v_strings
      |  UNION ALL SELECT chk AS chk, detail FROM fz_v_member
      |  UNION ALL SELECT chk AS chk, detail FROM fz_v_missing
      |  UNION ALL SELECT chk AS chk, detail FROM fz_v_stratum
      |) LIMIT 20""".stripMargin)

  /** One LPA vote round: votes = neighbor labels gathered over the
    * materialized edge table + each node's own label; next state =
    * per-node argmax by (count DESC, label ASC) — the replay's exact
    * vote rule, but each round reads a TEMP TABLE, so round r is one
    * join + one aggregate + one window over ~|E| rows (the unrolled
    * replay re-inlined the whole chain and spilled past 40 GiB at
    * sf10). */
  private def lpaRound(prev: String, votes: String, next: String): Seq[String] = Seq(
    s"""CREATE TEMP TABLE $votes AS
       |SELECT id, lab, count(*) AS c FROM (
       |  SELECT e.dst AS id, l.lab FROM lp_e e JOIN $prev l ON l.id = e.src
       |  UNION ALL SELECT id, lab FROM $prev
       |) GROUP BY 1, 2""".stripMargin,
    s"""CREATE TEMP TABLE $next AS
       |SELECT id, lab FROM (
       |  SELECT id, lab, row_number() OVER (
       |    PARTITION BY id ORDER BY c DESC, lab) AS rn FROM $votes
       |) WHERE rn = 1""".stripMargin)

  /** q_labelprop at sf10 (r14): the replay is correct and green
    * through sf1, but DuckDB re-inlines the 3-round CTE chain
    * (each round references the previous twice: gather + self-vote),
    * so the sf10 replay re-executes the 60M-row edge base
    * exponentially often and exhausts the spill budget. Staged, each
    * round is linear over materialized tables and the final state
    * must equal `result` EXACTLY — the kcore/hits transition-check
    * pattern, full-strength (every node's label re-derived
    * independently of the engine). */
  private val labelProp: Seq[String] = Seq(
    """CREATE TEMP TABLE lp_ed AS
      |SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem""".stripMargin,
    """CREATE TEMP TABLE lp_e AS
      |SELECT src, dst FROM lp_ed UNION ALL SELECT dst AS src, src AS dst FROM lp_ed""".stripMargin,
    """CREATE TEMP TABLE lp_l0 AS
      |SELECT DISTINCT src AS id, src AS lab FROM lp_e""".stripMargin) ++
    lpaRound("lp_l0", "lp_v1", "lp_l1") ++
    lpaRound("lp_l1", "lp_v2", "lp_l2") ++
    lpaRound("lp_l2", "lp_v3", "lp_l3") ++ Seq(
    """SELECT * FROM (
      |  SELECT 'labelprop_round3_mismatch' AS chk,
      |    CAST(COALESCE(r.id, g.id) AS VARCHAR) AS detail
      |  FROM result r FULL OUTER JOIN lp_l3 g ON g.id = r.id
      |  WHERE r.id IS NULL OR g.id IS NULL OR r.lab != g.lab
      |) LIMIT 20""".stripMargin)

  /** q_conductance at sf10 (r14): same CTE-re-inlining spill as
    * q_labelprop (its replay embeds the full LPA unroll before the
    * cut/volume pass). Staged: recompute cut, volume, and φ from the
    * ENGINE's own q_labelprop dump — valid for the same reason as
    * the modularity invariant (q_labelprop is itself independently
    * re-derived by its transition check at this SF, and the engine's
    * conductance consumes the identical shared labels frame), plus
    * the unlabeled-endpoint guard so a labels dump missing nodes
    * cannot silently shrink the edge pass. */
  private val conductance: Seq[String] = Seq(
    """CREATE TEMP TABLE cd_ed AS
      |SELECT DISTINCT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM lineitem""".stripMargin,
    """CREATE TEMP TABLE cd_e AS
      |SELECT src, dst FROM cd_ed UNION ALL SELECT dst AS src, src AS dst FROM cd_ed""".stripMargin,
    """CREATE TEMP TABLE cd_lab AS SELECT id, lab FROM r_q_labelprop""".stripMargin,
    """CREATE TEMP TABLE cd_chk AS
      |WITH parts AS (
      |  SELECT ls.lab AS lab, CAST(count(*) AS BIGINT) AS vol,
      |    CAST(sum(CASE WHEN ls.lab <> ld.lab THEN 1 ELSE 0 END) AS BIGINT) AS cut
      |  FROM cd_e e JOIN cd_lab ls ON ls.id = e.src JOIN cd_lab ld ON ld.id = e.dst
      |  GROUP BY 1
      |), m2t AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM cd_e)
      |SELECT CAST(lab AS BIGINT) AS lab, vol, cut,
      |  CASE WHEN least(vol, m2 - vol) = 0 THEN NULL
      |    ELSE CAST(round(1e9 * CAST(cut AS DOUBLE)
      |      / CAST(least(vol, m2 - vol) AS DOUBLE)) AS BIGINT)
      |  END AS phi_nano
      |FROM parts, m2t""".stripMargin,
    """SELECT * FROM (
      |  SELECT 'conductance_mismatch' AS chk,
      |    CAST(COALESCE(r.lab, c.lab) AS VARCHAR) AS detail
      |  FROM result r FULL OUTER JOIN cd_chk c ON c.lab = r.lab
      |  WHERE r.lab IS NULL OR c.lab IS NULL OR r.vol != c.vol
      |     OR r.cut != c.cut OR r.phi_nano IS DISTINCT FROM c.phi_nano
      |  UNION ALL
      |  SELECT 'unlabeled_endpoint', CAST(e.src AS VARCHAR)
      |  FROM cd_e e LEFT JOIN cd_lab l ON l.id = e.src WHERE l.id IS NULL
      |) LIMIT 20""".stripMargin)

  /** Query name → ordered DuckDB statements; the last SELECTs
    * violation rows (zero rows = pass_invariant). */
  val sql: Map[String, Seq[String]] = Map(
    "q_kcore" -> kcore,
    "q_hits" -> hits,
    "q_modularity" -> modularity,
    "q_dbscan" -> dbscan,
    "q_ivfpq_topk" -> ivfpq,
    // the persisted-index probe (r13) returns the SAME approximation
    // as the fused instance on the same params — the identical exact
    // recompute certifies its dump, and its replay oracle (the
    // q_ivfpq_topk replica) hits the same ~500 s DuckDB OOM wall at
    // sf1 that put q_ivfpq_topk on this list in r11. Since r14 its
    // staged list ALSO reconciles the persisted index's per-list
    // layout via the engine's q_ivfpq_layout dump (see ivfpqIndexed).
    "q_ivfpq_indexed" -> ivfpqIndexed,
    // the sf10 tier (r14 — these three replays are fine through sf1
    // and stay the primary gate there; only the sf10 gate maps them
    // here, where their candidate volumes grow superlinearly):
    "q_geo_radius" -> geoRadius,
    "q_jaro_rank" -> jaroRank,
    "q_fuzzy_match" -> fuzzyMatch,
    // sf10 tier, second wave (r14): CTE-re-inlining spill victims —
    // replays green through sf1, >40 GiB DuckDB spill at sf10
    "q_labelprop" -> labelProp,
    "q_conductance" -> conductance)
}
