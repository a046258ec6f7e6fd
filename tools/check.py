#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOut]
Reads each <verifyOut>/<name>/ parquet (written by graft.Verify), runs the
matching oracle_sql.json statement in DuckDB over the sfDir parquet tables,
and compares: columns sorted by name, rows sorted, exact match (floats to
1e-9 reported separately so near-misses are visible).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/verify"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes: ints that pandas widened, timestamps to ns
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

passed, failed = [], []
for name in sorted(oracle):
    spark_dir = f"{out}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        failed.append((name, "no spark output")); continue
    try:
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        exp = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        failed.append((name, f"error: {e}")); continue
    if list(got.columns) != list(exp.columns):
        failed.append((name, f"cols {list(got.columns)} != {list(exp.columns)}")); continue
    if len(got) != len(exp):
        failed.append((name, f"rows {len(got)} != {len(exp)}")); continue
    ok, detail = True, ""
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            diff = (g.astype(float) - e.astype(float)).abs().max()
            if diff > 0:
                if diff < 1e-9:
                    detail += f" [float col {c} max|Δ|={diff:.2e}]"
                else:
                    ok, detail = False, detail + f" col {c} max|Δ|={diff}"
        else:
            neq = (g.astype(str) != e.astype(str))
            if neq.any():
                i = neq.idxmax()
                ok, detail = False, detail + f" col {c} row{i}: {g[i]!r} != {e[i]!r}"
    (passed if ok else failed).append((name, detail))

for n, d in passed:
    print(f"PASS {n}{d}")
for n, d in failed:
    print(f"FAIL {n}: {d}")
print(f"\n{len(passed)} passed, {len(failed)} failed")
sys.exit(1 if failed else 0)
