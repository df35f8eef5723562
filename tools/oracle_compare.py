#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev loop only — the
real gate is driver-side). Reads the Verify.scala dump (parquet per
query + oracle_sql.json), runs each oracle SQL in DuckDB over the same
sf parquet tables, and compares: row count, sorted-column schema, and
exact values (rows sorted, columns sorted by name).

Usage: python3 tools/oracle_compare.py <outDir> <sfDir>
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        # normalize every cell to an exact string (float repr is
        # round-trip exact) so nulls sort deterministically and
        # comparison is bitwise on values
        import numpy as np
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
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        mismatches = [(c, int((s[c] != d[c]).sum())) for c in s_cols if (s[c] != d[c]).any()]
        if mismatches:
            print(f"FAIL {name}: value mismatches {mismatches}")
            for c, _ in mismatches[:2]:
                neq = s[c] != d[c]
                for i in neq[neq].index[:3]:
                    print(f"   row {i} col {c}: spark={s[c][i]!r} duck={d[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
