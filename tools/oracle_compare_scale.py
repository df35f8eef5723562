#!/usr/bin/env python3
"""Scale-SF oracle gate (r9 verdict item #1): the same compare
semantics as oracle_compare.py, but built for big SFs where a few
oracles' DuckDB-side SQL is itself expensive:

  - each query's DuckDB oracle runs in a SUBPROCESS with a wall-clock
    timeout (default 900 s) — a too-slow-in-DuckDB oracle becomes a
    DOCUMENTED `oracle_timeout` row instead of silently wedging the
    whole gate (the verdict's sanctioned outcome class);
  - results stream into a resumable JSON artifact: re-running skips
    queries already decided, so a killed gate continues instead of
    restarting from 'a';
  - (r10 verdict item #1) queries with a STAGED INVARIANT oracle in
    <outDir>/invariant_sql.json (dumped by Verify from
    SparkEntry.invariantSql) can be gated by it instead of the full
    replay: `--invariant q1,q2` runs the invariant directly for the
    named queries (for replays MEASURED infeasible at this SF — the
    r10 sf1 artifact's timeout/resource rows), and any replay that
    ends oracle_timeout/oracle_resource automatically falls back to
    its invariant when one exists. An invariant run executes the
    statement list in order (temp-table stages), with views for the
    raw tables, `result` (this query's engine dump), and `r_<name>`
    (every sibling dump); the LAST statement selects violation rows —
    zero rows = `pass_invariant`.

Usage: python3 tools/oracle_compare_scale.py <outDir> <sfDir> <artifact.json>
         [--timeout SECS] [--only q1,q2] [--invariant q1,q2]
"""
import sys, json, glob, os, subprocess, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WORKER = r'''
import sys, json, glob
import duckdb
import numpy as np

out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
tables = %r
con = duckdb.connect()
# cap DuckDB spill so a monster oracle exhausts ITS budget with a
# clean error instead of filling the shared disk for every other
# process (the q_hits sf1 oracle spilled >79G); override the budget
# via GRAFT_DUCK_TMP_CAP for a solo retry on a quiet disk
try:
    con.execute("SET max_temp_directory_size='%%s'"
                %% __import__("os").environ.get("GRAFT_DUCK_TMP_CAP", "40GiB"))
except Exception:
    pass
# DuckDB's default memory_limit is 80%% of RAM — concurrent workers at
# big SFs balloon past physical memory and the KERNEL kills them
# (rc=-9, measured at 70 GB RSS during the r14 sf10 gate). A bounded
# limit makes DuckDB spill to the capped temp dir instead.
try:
    con.execute("SET memory_limit='%%s'"
                %% __import__("os").environ.get("GRAFT_DUCK_MEM", "24GiB"))
except Exception:
    pass
import os as _os
for t in tables:
    # driver SFs ship single-file tables; GenScale SFs ship
    # multi-file `name.parquet/` directories - glob those
    pth = f"{sf_dir}/{t}.parquet"
    src = f"{pth}/*.parquet" if _os.path.isdir(pth) else pth
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
files = glob.glob(f"{out_dir}/{name}/*.parquet")
if not files:
    print(json.dumps({"status": "fail", "reason": "no spark output"})); sys.exit(0)
try:
    spark_df = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    duck_df = con.execute(sql).fetchdf()
except Exception as e:
    print(json.dumps({"status": "fail", "reason": f"exec error {e}"})); sys.exit(0)
s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
if s_cols != d_cols:
    print(json.dumps({"status": "fail",
        "reason": f"columns spark={s_cols} duck={d_cols}"})); sys.exit(0)
def _cell(v):
    if v is None or (isinstance(v, (float, np.floating)) and v != v):
        return "\x00NULL"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)
def norm(df):
    out = df[s_cols].copy()
    for c in s_cols:
        out[c] = out[c].map(_cell)
    return out.sort_values(s_cols, ignore_index=True)
s, d = norm(spark_df), norm(duck_df)
if len(s) != len(d):
    print(json.dumps({"status": "fail",
        "reason": f"rows spark={len(s)} duck={len(d)}"})); sys.exit(0)
mm = [(c, int((s[c] != d[c]).sum())) for c in s_cols if (s[c] != d[c]).any()]
if mm:
    print(json.dumps({"status": "fail", "reason": f"value mismatches {mm}"}))
else:
    print(json.dumps({"status": "pass", "rows": len(s)}))
''' % (TABLES,)

INV_WORKER = r'''
import sys, json, glob, os
import duckdb

out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
tables = %r
con = duckdb.connect()
try:
    con.execute("SET max_temp_directory_size='%%s'"
                %% os.environ.get("GRAFT_DUCK_TMP_CAP", "40GiB"))
except Exception:
    pass
try:
    con.execute("SET memory_limit='%%s'"
                %% os.environ.get("GRAFT_DUCK_MEM", "24GiB"))
except Exception:
    pass
for t in tables:
    pth = f"{sf_dir}/{t}.parquet"
    src = f"{pth}/*.parquet" if os.path.isdir(pth) else pth
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
files = glob.glob(f"{out_dir}/{name}/*.parquet")
if not files:
    print(json.dumps({"status": "fail_invariant",
                      "reason": "no spark output"})); sys.exit(0)
con.execute(f"CREATE VIEW result AS SELECT * FROM read_parquet({files!r})")
# sibling engine dumps as r_<name> views (lazy — a view costs a glob)
for d in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, d)
    if d != name and os.path.isdir(p) and glob.glob(f"{p}/*.parquet"):
        con.execute(
            f"CREATE VIEW r_{d} AS SELECT * FROM '{p}/*.parquet'")
stmts = json.load(open(f"{out_dir}/invariant_sql.json"))[name]
try:
    for s in stmts[:-1]:
        con.execute(s)
    rows = con.execute(stmts[-1]).fetchall()
except Exception as e:
    # a statement that fails to EXECUTE is infra breakage (DuckDB
    # version drift, malformed staged SQL), not an engine mismatch —
    # emit a distinct status so gate consumers never count it in
    # n_fail (r11 advice). OOM/disk strings still remap to
    # oracle_resource in run_worker.
    print(json.dumps({"status": "invariant_error",
                      "reason": f"exec error {e}"})); sys.exit(0)
if rows:
    print(json.dumps({"status": "fail_invariant",
        "reason": f"{len(rows)} violation rows (capped), e.g. {rows[:5]!r}"}))
else:
    n = con.execute("SELECT count(*) FROM result").fetchone()[0]
    print(json.dumps({"status": "pass_invariant", "rows": int(n)}))
''' % (TABLES,)


def run_worker(worker_path, out_dir, sf_dir, name, timeout, invariant):
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, worker_path, out_dir, sf_dir, name],
                           capture_output=True, text=True, timeout=timeout)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        try:
            r = json.loads(line)
        except Exception:
            fk = "fail_invariant" if invariant else "fail"
            r = {"status": fk,
                 "reason": f"worker crash rc={p.returncode}: {p.stderr[-300:]}"}
    except subprocess.TimeoutExpired:
        r = {"status": "oracle_timeout",
             "reason": f"DuckDB {'invariant' if invariant else 'oracle'} "
                       f"exceeded {timeout}s at this SF"}
    # a worker the KERNEL killed (OOM reaper, SIGKILL) is a host
    # resource event, not an engine mismatch — classify it retryable
    # (oracle_resource is outside DECIDED) instead of a decided fail
    if r.get("status") in ("fail", "fail_invariant") \
            and "rc=-9" in r.get("reason", ""):
        r["status"] = "oracle_resource"
    # resource-exhausted oracles are the oracle_timeout class, not a
    # mismatch: the DUCKDB side ran out of disk/temp budget before
    # producing an answer (the engine side already dumped fine)
    if r.get("status") in ("fail", "fail_invariant", "invariant_error") and any(
            s in r.get("reason", "") for s in
            ("No space left", "temp_directory size", "Out of Memory")):
        r["status"] = "oracle_resource"
    r["sec"] = round(time.time() - t0, 1)
    return r


DECIDED = ("pass", "fail", "pass_invariant", "fail_invariant")


def main(argv):
    out_dir, sf_dir, artifact = argv[0], argv[1], argv[2]
    timeout = 900
    only = None
    inv_first = set()
    args = argv[3:]
    while args:
        if args[0] == "--timeout":
            timeout = int(args[1]); args = args[2:]
        elif args[0] == "--only":
            only = set(args[1].split(",")); args = args[2:]
        elif args[0] == "--invariant":
            inv_first = set(args[1].split(",")); args = args[2:]
        else:
            raise SystemExit(f"unknown arg {args[0]}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    inv_path = f"{out_dir}/invariant_sql.json"
    inv_sql = json.load(open(inv_path)) if os.path.exists(inv_path) else {}
    missing_inv = inv_first - set(inv_sql)
    if missing_inv:
        raise SystemExit(f"--invariant names without invariant SQL: {missing_inv}")
    results = {}
    if os.path.exists(artifact):
        results = json.load(open(artifact)).get("queries", {})
    names = [n for n in sorted(oracle) if (only is None or n in only)]
    worker_path = f"{artifact}.worker.py"
    with open(worker_path, "w") as f:
        f.write(WORKER)
    inv_worker_path = f"{artifact}.invworker.py"
    with open(inv_worker_path, "w") as f:
        f.write(INV_WORKER)
    for name in names:
        if name in results and results[name].get("status") in DECIDED:
            continue  # resumable: keep decided rows, retry timeouts only if asked
        if name in inv_first:
            # replay measured infeasible at this SF — gate by invariant
            r = run_worker(inv_worker_path, out_dir, sf_dir, name, timeout, True)
            r["replay"] = "skipped: measured infeasible at this SF (--invariant)"
        else:
            r = run_worker(worker_path, out_dir, sf_dir, name, timeout, False)
            if (r["status"] in ("oracle_timeout", "oracle_resource")
                    and name in inv_sql):
                replay_note = f"{r['status']}: {r.get('reason', '')} ({r['sec']}s)"
                r = run_worker(inv_worker_path, out_dir, sf_dir, name,
                               timeout, True)
                r["replay"] = replay_note
        results[name] = r
        # merge-before-write: a concurrent --only run on the same
        # artifact must not be clobbered by our whole-file rewrite
        # (bitten once: a parallel merge lost a decided row). Our own
        # rows win; foreign decided rows are preserved.
        if os.path.exists(artifact):
            try:
                on_disk = json.load(open(artifact)).get("queries", {})
                for k, v in on_disk.items():
                    results.setdefault(k, v)
            except Exception:
                pass
        print(f"{r['status'].upper()} {name} ({r['sec']}s)"
              + ("" if r["status"] == "pass" else f": {r.get('reason','')}"),
              flush=True)
        n_undecided = sum(1 for v in results.values()
                          if v["status"] not in DECIDED)
        summary = {
            # n counts ROWS PRESENT in the artifact (never this
            # invocation's --only slice — a filtered top-up must not
            # shrink the headline count); rows a resume would retry
            # (timeout/resource with no invariant) are broken out as
            # n_undecided so n alone can never read as "all decided"
            "sf": sf_dir, "n": len(results), "n_undecided": n_undecided,
            "n_pass": sum(1 for v in results.values() if v["status"] == "pass"),
            "n_pass_invariant": sum(1 for v in results.values()
                                    if v["status"] == "pass_invariant"),
            "n_fail": sum(1 for v in results.values()
                          if v["status"] in ("fail", "fail_invariant")),
            "n_oracle_timeout": sum(1 for v in results.values()
                                    if v["status"] == "oracle_timeout"),
            "n_oracle_resource": sum(1 for v in results.values()
                                     if v["status"] == "oracle_resource"),
            # infra breakage in an invariant's own SQL (exec error) —
            # never conflated with engine mismatches; retried on
            # resume like timeouts (not in DECIDED)
            "n_invariant_error": sum(1 for v in results.values()
                                     if v["status"] == "invariant_error"),
            "timeout_sec": timeout, "queries": results,
        }
        with open(artifact, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
    n_pass = sum(1 for v in results.values() if v["status"] == "pass")
    n_pinv = sum(1 for v in results.values() if v["status"] == "pass_invariant")
    n_fail = sum(1 for v in results.values()
                 if v["status"] in ("fail", "fail_invariant"))
    n_to = sum(1 for v in results.values() if v["status"] == "oracle_timeout")
    print(f"== {n_pass} pass, {n_pinv} pass_invariant, {n_fail} fail, "
          f"{n_to} oracle_timeout")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
