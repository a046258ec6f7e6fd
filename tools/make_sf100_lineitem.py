#!/usr/bin/env python3
"""Generate the DECADE-3 rung: tmp/scale/sf100/lineitem.parquet only.

VERDICT r9 item 4: probe whether the two steepest warm decade-2 growers
(a16_group_deciles, a22_weighted_median — both single range-partitioned
global sorts over lineitem, profiled scan-proportional) hold their ~6x
per-decade ratio at decade 3. Both queries read ONLY lineitem, so the
sf100 rung materializes just that table (~600M rows, ~16 GB parquet) —
the full make_sf1.py at F=1000 would also generate 100M events / 5M
Heaps documents / 2M embeddings nothing consumes.

Scaling rule is IDENTICAL to tools/make_sf1.py's lineitem block (1000
blocks, keys shift by block * KEYSPAN so every block keeps referential
shape, prices perturbed per-block so blocks aren't bit-identical);
l_orderkey is BIGINT in the source schema, so the shifted keys
(max ~8.4e9) stay in type.

Usage: python3 tools/make_sf100_lineitem.py [factor=1000]
"""
import os, sys, duckdb

SRC = "/root/testdata/sf0.1"
F = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
OUT = f"tmp/scale/sf{F // 10}"
KEYSPAN = 1 << 23


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() - 2)}")
    # Without this, COPY buffers the whole 600M-row cross product to keep
    # source order (measured: 32 GB RSS, zero bytes written after 15 min);
    # order is meaningless for a bench corpus, so let the writer stream.
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='24GB'")
    con.execute(f"CREATE TABLE blocks AS SELECT unnest(range({F})) AS b")
    con.execute(f"""
      COPY (
        SELECT l_orderkey + b * {KEYSPAN} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity,
               round(l_extendedprice * (1 + b * 0.0003), 2) AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate + INTERVAL (b) SECOND AS l_shipdate
        FROM '{SRC}/lineitem.parquet', blocks
      ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)""")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/lineitem.parquet'").fetchone()[0]
    print(f"{OUT}/lineitem.parquet: {n} rows, "
          f"{os.path.getsize(OUT + '/lineitem.parquet') / 2**30:.1f} GiB")


if __name__ == "__main__":
    main()
