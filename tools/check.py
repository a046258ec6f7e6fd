#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate — driver-STRICT.

Usage: python3 tools/check.py [sfDir] [verifyOut]

Reads each <verifyOut>/<name>/ parquet (written by graft.Verify), runs the
matching oracle_sql.json statement in DuckDB over the sfDir parquet tables,
and compares at ARROW level:
  - column names (sorted) must match
  - arrow types must match EXACTLY (int64 vs decimal128 vs float64 all differ,
    mirroring the driver's typed-value hashing — DuckDB sum(int)->HUGEINT and
    floor()->DOUBLE artifacts fail here, as they do in the driver)
  - values must match EXACTLY: floats compared by IEEE bit pattern (so -0.0 !=
    0.0 and no epsilon), ints/strings/bools exact, lists recursively.
No pandas dtype laundering, no float tolerance.
"""
import json, sys, glob, struct
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/verify"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))


def type_name(t: pa.DataType) -> str:
    """Canonical type class, mirroring the driver's pandas-value hashing:
    integer widths collapse (int32 == int64 — python ints hash by value),
    but int vs float vs decimal STAY distinct (DuckDB HUGEINT -> pandas
    float/decimal vs Spark BIGINT is exactly the class the driver fails)."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + type_name(t.value_type) + ">"
    return str(t)


def canon_py(x, t: pa.DataType):
    """Exact, hashable, sortable token for a value. Floats by bit pattern;
    decimals losslessly via str (int(x) would truncate the fraction and make
    1.25 == 1.75 — decimal.Decimal str round-trips exactly)."""
    if x is None:
        return "\x00null"
    if pa.types.is_floating(t):
        return "f" + struct.pack(">d", float(x)).hex()
    if pa.types.is_decimal(t):
        # normalize() then 'f' format: scale-insensitive ("1.50" == "1.5",
        # no E-notation) but fraction-exact ("1.25" != "1.75").
        return "d" + format(x.normalize(), "f")
    if pa.types.is_integer(t):
        return "i%032d" % int(x) if int(x) >= 0 else "i-%031d" % (-int(x))
    if pa.types.is_boolean(t):
        return "b1" if x else "b0"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "[" + ",".join(canon_py(y, t.value_type) for y in x) + "]"
    return "s" + str(x)


def canon_table(tbl: pa.Table):
    """-> (sorted col names, [type names], sorted row-token tuples)."""
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    types = [type_name(tbl.schema.field(c).type) for c in cols]
    n = tbl.num_rows
    col_tokens = []
    for i, c in enumerate(cols):
        t = tbl.schema.field(c).type
        arr = tbl.column(c).to_pylist()
        col_tokens.append([canon_py(x, t) for x in arr])
    rows = sorted(tuple(col_tokens[j][i] for j in range(len(cols))) for i in range(n))
    return cols, types, rows


passed, failed = [], []
for name in sorted(oracle):
    spark_dir = f"{out}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        failed.append((name, "no spark output")); continue
    try:
        got_tbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        exp_tbl = con.execute(oracle[name]).fetch_arrow_table()
        gc, gt, gr = canon_table(got_tbl)
        ec, et, er = canon_table(exp_tbl)
    except Exception as e:
        failed.append((name, f"error: {e}")); continue
    if gc != ec:
        failed.append((name, f"cols {gc} != {ec}")); continue
    if gt != et:
        diff = [f"{c}: spark={a} oracle={b}" for c, a, b in zip(gc, gt, et) if a != b]
        failed.append((name, "TYPE " + "; ".join(diff))); continue
    if len(gr) != len(er):
        failed.append((name, f"rows {len(gr)} != {len(er)}")); continue
    bad = None
    for i, (a, b) in enumerate(zip(gr, er)):
        if a != b:
            cols_bad = [gc[j] for j in range(len(gc)) if a[j] != b[j]]
            bad = f"row {i} differs in {cols_bad}: {[(a[j], b[j]) for j in range(len(gc)) if a[j] != b[j]][:3]}"
            break
    if bad:
        failed.append((name, bad))
    else:
        passed.append((name, ""))

for n, d in passed:
    print(f"PASS {n}")
for n, d in failed:
    print(f"FAIL {n}: {d}")
print(f"\n{len(passed)} passed, {len(failed)} failed")
sys.exit(1 if failed else 0)
