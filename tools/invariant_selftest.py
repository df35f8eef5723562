#!/usr/bin/env python3
"""Non-vacuity selftest for the staged invariant oracles (r10 verdict
item #1): an invariant that cannot fail is not a gate. For each of
the five invariant-carrying queries this script

  1. runs the invariant against the CORRECT engine dumps (must pass),
  2. plants a class-specific corruption into a COPY of the dump,
  3. runs the invariant again (must fail, naming an expected check),
  4. leaves the original dumps untouched.

The dbscan case plants TWO corruptions: a perturbed core row (caught
by several checks) and the subtle one — an ENTIRE small cluster
relabeled to another cluster's id, internally consistent under every
local check and caught only by the reachability certificate
(`small_cluster_unreachable`).

A corruption entry may carry a third element naming a SIBLING dump to
corrupt instead of the query's own (the invariant reads sibling dumps
as r_<name> views): the q_ivfpq_indexed case plants a truncated
per-list count into the q_ivfpq_layout dump — exactly what a
truncated persisted index would faithfully report — and the layout
certificate must trip even though the top-k rows are untouched.

Usage: python3 tools/invariant_selftest.py <outDir> <sfDir>
  (outDir = a Verify dump containing invariant_sql.json)
Exit 0 = all pass+trip as expected; 1 otherwise.
"""
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))

CORRUPTIONS = {
    "q_kcore": [("UPDATE t SET deg = deg + 1 WHERE id = (SELECT min(id) FROM t)",
                 "kcore_round3_mismatch")],
    "q_hits": [("UPDATE t SET hub = hub + 1 WHERE id = (SELECT min(id) FROM t)",
                "hits_iter2_mismatch")],
    "q_modularity": [("UPDATE t SET q_nano = q_nano + 1 WHERE lab = (SELECT min(lab) FROM t)",
                      "modularity_mismatch")],
    "q_ivfpq_topk": [("UPDATE t SET adc_dist = adc_dist + 1 "
                      "WHERE query_id = (SELECT min(query_id) FROM t) AND rnk = 1",
                      "ivfpq_topk_mismatch")],
    "q_ivfpq_indexed": [
        # truncated persisted index: a list partition lost rows; the
        # engine's layout dump reports the truncated count and the
        # r14 layout certificate must reconcile-fail, even though the
        # dumped top-k rows are untouched (the blind spot the r13
        # verdict named)
        ("UPDATE t SET n_rows = n_rows - 7 "
         "WHERE list_id = (SELECT min(list_id) FROM t)",
         "ivfpq_layout_count_mismatch", "q_ivfpq_layout"),
    ],
    # ---- sf10 tier (r14): membership/completeness exact, value
    # soundness on a pinned 1-in-37 stratum — the UPDATE-all cases
    # prove the stratum is non-empty and actually checks values ----
    "q_geo_radius": [
        ("UPDATE t SET dist2 = dist2 + 1 WHERE id_a = (SELECT min(id_a) FROM t)",
         "geo_pairs_bucket_mismatch"),
        ("DELETE FROM t WHERE id_a = (SELECT min(id_a) FROM t)",
         "geo_pairs_bucket_mismatch"),
    ],
    "q_jaro_rank": [
        ("DELETE FROM t WHERE CAST(dirty_id AS VARCHAR) || ':' || CAST(p_partkey AS VARCHAR) = "
         "(SELECT CAST(dirty_id AS VARCHAR) || ':' || CAST(p_partkey AS VARCHAR) "
         "FROM t ORDER BY dirty_id, p_partkey LIMIT 1)",
         "jaro_missing_pair"),
        ("UPDATE t SET jw_e9 = jw_e9 + 1", "jaro_stratum_jw_mismatch"),
    ],
    "q_fuzzy_match": [
        ("DELETE FROM t WHERE CAST(dirty_id AS VARCHAR) || ':' || CAST(p_partkey AS VARCHAR) = "
         "(SELECT CAST(dirty_id AS VARCHAR) || ':' || CAST(p_partkey AS VARCHAR) "
         "FROM t ORDER BY dirty_id, p_partkey LIMIT 1)",
         "fuzzy_missing_pair"),
        ("UPDATE t SET dist = dist + 1", "fuzzy_stratum_dist_mismatch"),
        ("UPDATE t SET p_name = p_name || 'x' "
         "WHERE dirty_id = (SELECT min(dirty_id) FROM t)",
         "fuzzy_carried_string_mismatch"),
    ],
    # sf10 tier, second wave (r14): CTE-re-inlining spill victims
    "q_labelprop": [
        ("UPDATE t SET lab = lab + 2 WHERE id = (SELECT min(id) FROM t)",
         "labelprop_round3_mismatch"),
    ],
    "q_conductance": [
        ("UPDATE t SET cut = cut + 1 WHERE lab = (SELECT min(lab) FROM t)",
         "conductance_mismatch"),
        # a labels dump missing a node must trip the endpoint guard,
        # not silently shrink the edge pass (sibling corruption)
        ("DELETE FROM t WHERE id = (SELECT min(id) FROM t)",
         "unlabeled_endpoint", "q_labelprop"),
    ],
    "q_dbscan": [
        ("UPDATE t SET cluster_id = (SELECT max(cluster_id) FROM t WHERE cluster_id IS NOT NULL) "
         "WHERE id = (SELECT min(id) FROM t WHERE role='core' AND cluster_id = "
         "(SELECT min(cluster_id) FROM t WHERE cluster_id IS NOT NULL))",
         None),  # trips several checks; any is fine
        # the pure over-merge, planted on the TWO LARGEST clusters
        # (r11 verdict item #3's DoD — the old reachability
        # certificate only fully verified clusters with <=256 cores;
        # the star-contraction recompute is size-blind): relabel ALL
        # rows of the second-largest cluster to the largest one's id —
        # internally consistent under every local check, caught only
        # by the full independent label recompute
        ("UPDATE t SET cluster_id = (SELECT cluster_id FROM t WHERE role='core' "
         "GROUP BY 1 ORDER BY count(*) DESC, cluster_id LIMIT 1) "
         "WHERE cluster_id = (SELECT cluster_id FROM t WHERE role='core' "
         "GROUP BY 1 ORDER BY count(*) DESC, cluster_id LIMIT 1 OFFSET 1)",
         "core_label_mismatch"),
    ],
}


def run_gate(out_dir, sf_dir, name, artifact):
    if os.path.exists(artifact):
        os.remove(artifact)
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "oracle_compare_scale.py"),
         out_dir, sf_dir, artifact, "--only", name, "--invariant", name,
         "--timeout", "900"],
        capture_output=True, text=True)
    # surface the gate's own stderr on a crash instead of dying on a
    # FileNotFoundError for the artifact it never wrote
    if not os.path.exists(artifact):
        raise SystemExit(
            f"gate crashed for {name} (rc={p.returncode}) before writing "
            f"{artifact}\nstdout: {p.stdout[-500:]}\nstderr: {p.stderr[-500:]}")
    q = json.load(open(artifact))["queries"][name]
    return q, p.stdout


def corrupt(out_dir, name, sql):
    import duckdb
    f = glob.glob(f"{out_dir}/{name}/*.parquet")[0]
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT * FROM '{f}'")
    con.execute(sql)
    os.remove(f)
    con.execute(f"COPY t TO '{f}' (FORMAT PARQUET)")
    con.close()


def main(out_dir, sf_dir):
    names = sorted(json.load(open(f"{out_dir}/invariant_sql.json")))
    bad = 0
    with tempfile.TemporaryDirectory(prefix="invself") as tmp:
        for name in names:
            art = os.path.join(tmp, f"{name}.json")
            q, _ = run_gate(out_dir, sf_dir, name, art)
            if q["status"] != "pass_invariant":
                print(f"NOT-GREEN {name}: correct dump did not pass: {q}")
                bad += 1
                continue
            print(f"GREEN     {name} (correct dump passes, {q['sec']}s)")
            for i, entry in enumerate(CORRUPTIONS.get(name, [])):
                sql, want_chk = entry[0], entry[1]
                # optional third element: corrupt a SIBLING dump (the
                # invariant reads siblings as r_<name> views)
                target = entry[2] if len(entry) > 2 else name
                # corrupted COPY of the whole dump dir tree: the
                # invariant may read sibling dumps (r_*), keep those
                case = os.path.join(tmp, f"{name}-case{i}")
                shutil.copytree(out_dir, case)
                corrupt(case, target, sql)
                qc, _ = run_gate(case, sf_dir, name, art + f".case{i}")
                reason = qc.get("reason", "")
                if qc["status"] != "fail_invariant":
                    print(f"VACUOUS   {name} case{i}: corruption NOT caught: {qc}")
                    bad += 1
                elif want_chk and want_chk not in reason:
                    print(f"MISLABEL  {name} case{i}: tripped but not via "
                          f"{want_chk}: {reason[:120]}")
                    bad += 1
                else:
                    print(f"TRIPPED   {name} case{i}"
                          + (f" via {want_chk}" if want_chk else "")
                          + f": {reason[:90]}")
                shutil.rmtree(case)
    print(("== SELFTEST PASS" if not bad else f"== SELFTEST FAIL ({bad})"))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
