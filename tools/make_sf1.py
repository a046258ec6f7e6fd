#!/usr/bin/env python3
"""Generate the sf1-equivalent whale corpus under tmp/scale/sf1/ — a
deterministic 10x of the sf0.1 fact tables with referential integrity
preserved, for the two-scale bench comparison BASELINE.md records.

Scaling rules (all DuckDB SQL, no RNG):
- lineitem + orders: 10 blocks; o_orderkey / l_orderkey shift together by
  block * KEYSPAN so every lineitem still joins its order; o_custkey /
  l_partkey / l_suppkey stay in the 1x dimension key space (dimensions grow
  slower than facts at real scale). Prices/dates get a small deterministic
  per-block perturbation so blocks aren't bit-identical (group counts and
  distinct-value behavior stay realistic).
- events: 10 blocks; event_id shifts; ts shifts by block * (timeline span +
  1h) so each block is a fresh epoch (sessions don't merge across blocks,
  per-user event volume grows 10x — the realistic growth axis).
- documents: the Heaps-salted empirical corpus from make_scale_corpus.py
  (vocabulary grows with the corpus — stationary shingle-df distribution).
- embeddings: 10 blocks; vec_id shifts; block b rotates each vector by b
  positions and adds a small deterministic per-block delta, so new vectors
  are distinct but preserve norm/cluster structure.
- customer/supplier/part/nation/region: copied at 1x.

Usage: python3 tools/make_scale_corpus.py && python3 tools/make_sf1.py
"""
import os, shutil, duckdb, sys

SRC = "/root/testdata/sf0.1"
# Optional argv factor (default 10 -> sf1). 100 -> the round-8 sf10 whale:
# 60M lineitem / 10M events / 500k docs / 200k embeddings, ~2.5 GB parquet.
F = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = "tmp/scale/sf1" if F == 10 else f"tmp/scale/sf{F // 10}"
DOCS10X = f"tmp/scale/docs{F}x_heaps/documents.parquet"
KEYSPAN = 1 << 23  # > max o_orderkey at sf0.1 (600000)


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE blocks AS SELECT unnest(range({F})) AS b")

    con.execute(f"""
      COPY (
        SELECT o_orderkey + b * {KEYSPAN} AS o_orderkey, o_custkey,
               o_orderstatus,
               round(o_totalprice * (1 + b * 0.0003), 2) AS o_totalprice,
               o_orderdate + INTERVAL (b) SECOND AS o_orderdate,
               o_orderpriority
        FROM '{SRC}/orders.parquet', blocks
      ) TO '{OUT}/orders.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
      COPY (
        SELECT l_orderkey + b * {KEYSPAN} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity,
               round(l_extendedprice * (1 + b * 0.0003), 2) AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate + INTERVAL (b) SECOND AS l_shipdate
        FROM '{SRC}/lineitem.parquet', blocks
      ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)""")

    span_s = con.sql(
        f"SELECT CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) + 3600 "
        f"FROM '{SRC}/events.parquet'").fetchone()[0]
    con.execute(f"""
      COPY (
        SELECT event_id + b * {KEYSPAN} AS event_id,
               ts + to_seconds(b * {span_s}) AS ts,
               user_id, event_type, value, props
        FROM '{SRC}/events.parquet', blocks
      ) TO '{OUT}/events.parquet' (FORMAT PARQUET)""")

    # embeddings: rotate by b, add a per-(block, position) delta of ±0.001
    con.execute(f"""
      COPY (
        SELECT vec_id + b * {KEYSPAN} AS vec_id,
               CAST(list_transform(range(1, len(embedding) + 1), i ->
                 embedding[1 + (i - 1 + b) % len(embedding)]
                   + 0.001 * (((vec_id * 31 + i * 7 + b * 13) % 3) - 1))
                 AS FLOAT[]) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', blocks
      ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")

    if os.path.exists(DOCS10X):
        shutil.copyfile(DOCS10X, f"{OUT}/documents.parquet")
    else:
        raise SystemExit(f"missing {DOCS10X}: run tools/make_scale_corpus.py {F} first")

    for t in ["customer", "supplier", "part", "nation", "region"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    con.close()


if __name__ == "__main__":
    main()
