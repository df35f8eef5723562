#!/usr/bin/env python3
"""Fresh-JVM re-run column for the variance stats artifacts (r13
verdict item #2): the in-suite "aged-heap tax" is real — after ~240
queries of cached frames + codegen classes the same query runs up to
~7x slower in-suite than standalone (q_vad: 5.96 s suite vs 0.84 s
fresh at sf1) — and the per-query rows in the stats artifacts carry
that suite-position-dependent tax invisibly, producing phantom 2x
"regressions" in cross-round comparisons.

This tool quantifies the tax per outlier row instead of leaving it to
prose: after a variance run it

  1. ranks non-receipt rows by (suite median / historical min) using
     every prior committed stats artifact for the same SF tier,
  2. re-runs the K worst in ONE fresh JVM (graft.Bench with
     SPARK_GRAFT_BENCH_ONLY + 2 passes; min-of-2 drops the fresh
     JVM's own codegen cost),
  3. rewrites the stats artifact adding "fresh_sec" (and
     "fresh_ratio" = median / fresh_sec) to those rows.

Cross-round comparisons should use fresh_sec where present; the
median column remains the honest in-suite number.

Usage: python3 tools/fresh_rerun.py <stats.jsonl> <sfDir>
         [--k 8] [--classes DIR] [--history glob ...] [--only q1,q2]

--classes defaults to a snapshot dir if GRAFT_CLASSES is set, else
target/scala-2.13/classes (NEVER recompile while this runs — see the
repo's background-run hygiene notes). --history defaults to
BENCH_*<tier>*_r*.jsonl in the repo root for the sfDir's tier name.
"""
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tier_name(sf_dir):
    base = os.path.basename(sf_dir.rstrip("/"))
    # /root/testdata/sf0.1 -> sf01 ; testdata/sf1 -> sf1 ; sf0.1-skew -> sf01skew
    return base.replace(".", "").replace("-", "")


def load_stats(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main(argv):
    stats_path, sf_dir = argv[0], argv[1]
    k = 8
    classes = os.environ.get(
        "GRAFT_CLASSES", os.path.join(REPO, "target/scala-2.13/classes"))
    history = None
    only = None
    args = argv[2:]
    while args:
        if args[0] == "--k":
            k = int(args[1]); args = args[2:]
        elif args[0] == "--classes":
            classes = args[1]; args = args[2:]
        elif args[0] == "--history":
            history = args[1:]; args = []
        elif args[0] == "--only":
            only = args[1].split(","); args = args[2:]
        else:
            raise SystemExit(f"unknown arg {args[0]}")

    rows = load_stats(stats_path)
    by_name = {r["query"]: r for r in rows}

    if only:
        targets = [q for q in only if q in by_name]
        missing = set(only) - set(targets)
        if missing:
            raise SystemExit(f"--only names not in stats artifact: {missing}")
    else:
        # historical min per query across prior committed artifacts of
        # the same tier (the artifact under edit is excluded)
        tier = tier_name(sf_dir)
        pats = history or [os.path.join(REPO, f"BENCH_{tier}_r*.jsonl")]
        hist = {}
        for pat in pats:
            for p in glob.glob(pat):
                if os.path.abspath(p) == os.path.abspath(stats_path):
                    continue
                for r in load_stats(p):
                    q = r.get("query")
                    mn = r.get("min", -1)
                    if q and mn and mn > 0:
                        hist[q] = min(hist.get(q, float("inf")), mn)
        scored = []
        for r in rows:
            if r.get("receipt"):
                continue  # receipts run once; no suite-tax story
            med = r.get("median", -1)
            if med is None or med < 0.3:
                continue  # sub-0.3s rows are noise-dominated
            base = hist.get(r["query"], med)
            scored.append((med / max(base, 0.05), r["query"], med, base))
        scored.sort(reverse=True)
        targets = [q for _, q, _, _ in scored[:k]]
        for ratio, q, med, base in scored[:k]:
            print(f"outlier {q}: suite median {med:.2f}s vs historical min "
                  f"{base:.2f}s = {ratio:.2f}x")
    if not targets:
        print("no outlier rows above thresholds; nothing to re-run")
        return 0

    fresh_out = stats_path + ".fresh.jsonl"
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ONLY": ",".join(targets),
        "SPARK_GRAFT_BENCH_PASSES": "2",
        "SPARK_GRAFT_BENCH_STATS_OUT": fresh_out,
    })
    cmd = ["java", "-Xmx64g", "-cp", f"{classes}:/opt/spark/jars/*",
           "graft.Bench"]
    print(f"fresh JVM: {' '.join(targets)}")
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       cwd=REPO, timeout=7200)
    if not os.path.exists(fresh_out):
        raise SystemExit(f"fresh bench produced no stats (rc={p.returncode})\n"
                         f"stderr: {p.stderr[-800:]}")
    fresh = {r["query"]: r for r in load_stats(fresh_out)}

    n_added = 0
    with open(stats_path, "w") as f:
        for r in rows:
            q = r["query"]
            if q in fresh and fresh[q].get("min", -1) > 0:
                r["fresh_sec"] = round(fresh[q]["min"], 3)
                med = r.get("median", -1)
                if med and med > 0:
                    r["fresh_ratio"] = round(med / r["fresh_sec"], 2)
                n_added += 1
            f.write(json.dumps(r) + "\n")
    os.remove(fresh_out)
    for q in targets:
        r = by_name[q]
        if "fresh_sec" in r:
            print(f"  {q}: suite median {r.get('median'):.2f}s, "
                  f"fresh {r['fresh_sec']:.2f}s "
                  f"(tax {r.get('fresh_ratio', '?')}x)")
        else:
            print(f"  {q}: FRESH RUN FAILED (no row)")
    print(f"== fresh_sec added to {n_added}/{len(targets)} rows in {stats_path}")
    return 0 if n_added == len(targets) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
