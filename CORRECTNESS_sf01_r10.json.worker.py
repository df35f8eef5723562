
import sys, json, glob
import duckdb
import numpy as np

out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
tables = ['region', 'nation', 'customer', 'supplier', 'part', 'orders', 'lineitem', 'events', 'documents', 'embeddings']
con = duckdb.connect()
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
