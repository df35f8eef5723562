#!/usr/bin/env python3
"""Compare two Verify dumps query-by-query (r9 verdict item #4's
"identical answers under memory pressure" check): for each query dir
present in BOTH dumps, load the parquet results, sort rows and
columns, and compare exactly. Usage:

  python3 tools/diff_dumps.py <dumpA> <dumpB> [q1,q2,...]
"""
import sys, glob, os
import duckdb


def load(con, d, name):
    files = glob.glob(f"{d}/{name}/*.parquet")
    if not files:
        return None
    return con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()


def main(a, b, only=None):
    con = duckdb.connect()
    names = sorted(set(os.listdir(a)) & set(os.listdir(b)))
    names = [n for n in names if os.path.isdir(os.path.join(a, n))
             and (only is None or n in only)]
    n_same = n_diff = 0
    import numpy as np
    def _cell(v):
        if v is None or (isinstance(v, (float, np.floating)) and v != v):
            return "\x00NULL"
        if isinstance(v, (float, np.floating)):
            return repr(float(v))
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(_cell(x) for x in v) + "]"
        return str(v)
    for name in names:
        da, db = load(con, a, name), load(con, b, name)
        if da is None or db is None:
            print(f"SKIP {name}: missing output"); continue
        ca, cb = sorted(da.columns), sorted(db.columns)
        if ca != cb:
            print(f"DIFF {name}: columns {ca} vs {cb}"); n_diff += 1; continue
        def norm(df):
            out = df[ca].copy()
            for c in ca:
                out[c] = out[c].map(_cell)
            return out.sort_values(ca, ignore_index=True)
        sa, sb = norm(da), norm(db)
        if len(sa) != len(sb):
            print(f"DIFF {name}: rows {len(sa)} vs {len(sb)}"); n_diff += 1
        elif any((sa[c] != sb[c]).any() for c in ca):
            print(f"DIFF {name}: values differ"); n_diff += 1
        else:
            print(f"SAME {name} ({len(sa)} rows)"); n_same += 1
    print(f"== {n_same} identical, {n_diff} different")
    return 1 if n_diff else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
