#!/usr/bin/env python3
"""Generate the DECADE-3 rung for the dedup/ANN family:
tmp/scale/sf100/{documents,embeddings}.parquet (5M docs / 2M vectors).

VERDICT r10 item 1: the 100 TB posture for the candidate-pair-bounded
family (d11 MinHash calibration 4.2x/decade, d4 SimHash 5.0x, v-family
2.1-2.6x — all decade-2 warm ratios) rests on an argued "the df-cap keeps
growth ~linear" correction; round 10 MEASURED that correction for the
sort family (a16 6x -> 11.7x at decade 3) and this rung lets the same
measurement run for the pair family. lineitem's sf100 rung already
exists (make_sf100_lineitem.py); this adds only the two tables the
d/v queries read.

Scaling rules (same regimes as the decade-2 corpus, extended one decade):

- documents: 10 SUPERBLOCKS over the existing 500k-doc Heaps corpus
  (docs100x_heaps — the 100x empirical-CDF corpus make_scale_corpus.py
  built for round 8). In that corpus every CONTENT token carries a
  per-block `_b<N>` suffix and only the top-10-per-language function
  words are unsalted; suffixing those content tokens again with
  `_s<superblock>` reproduces the generator's exact growth regime one
  decade up: vocabulary keeps growing with the corpus (Heaps), content
  shingle document-frequencies stay STATIONARY (each superblock's
  content shingles are unique to it), and function-word shingle dfs
  grow linearly — the adversarial axis the ShingleIndex df-cap exists
  for. Re-running make_scale_corpus.py at FACTOR=1000 would produce the
  statistically identical corpus in ~10x the wall (pure-Python
  token-by-token sampling); the superblock transform is one DuckDB pass.
  n_chars is recomputed (salting lengthens tokens).

- embeddings: the make_sf1.py rule verbatim at F=1000 (rotate by block,
  +-0.001 per-(block,position) deterministic delta, vec_id shifted by
  block*KEYSPAN) — new vectors are distinct but preserve norm/cluster
  structure, so IVF/LSH bucket geometry scales rather than degenerates.

Usage: python3 tools/make_sf100_docs.py [superblocks=10]
"""
import os, sys, duckdb

DOCS_SRC = "tmp/scale/docs100x_heaps/documents.parquet"
EMB_SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT = "tmp/scale/sf100"
SUPERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
EMB_F = SUPERS * 100  # embeddings scale directly off the sf0.1 base
KEYSPAN = 1 << 23


def main():
    if not os.path.exists(DOCS_SRC):
        raise SystemExit(f"missing {DOCS_SRC}: run tools/make_scale_corpus.py 100 first")
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() - 2)}")
    # Same as make_sf100_lineitem.py: without this, COPY buffers the whole
    # cross product to keep source order (measured 32 GB RSS, no output).
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='24GB'")

    con.execute(f"CREATE TABLE supers AS SELECT unnest(range({SUPERS})) AS s")
    con.execute(f"""
      COPY (
        WITH salted AS (
          SELECT doc_id + s * {KEYSPAN} AS doc_id,
                 CASE WHEN s = 0 THEN text ELSE
                   array_to_string(list_transform(string_split(text, ' '),
                     t -> CASE WHEN regexp_matches(t, '_b\\d+$')
                               THEN t || '_s' || s ELSE t END), ' ')
                 END AS text,
                 lang, source
          FROM '{DOCS_SRC}', supers
        )
        SELECT doc_id, text, lang, source, length(text) AS n_chars FROM salted
      ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")

    con.execute(f"CREATE TABLE blocks AS SELECT unnest(range({EMB_F})) AS b")
    con.execute(f"""
      COPY (
        SELECT vec_id + b * {KEYSPAN} AS vec_id,
               CAST(list_transform(range(1, len(embedding) + 1), i ->
                 embedding[1 + (i - 1 + b) % len(embedding)]
                   + 0.001 * (((vec_id * 31 + i * 7 + b * 13) % 3) - 1))
                 AS FLOAT[]) AS embedding,
               label
        FROM '{EMB_SRC}', blocks
      ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")

    for t in ["documents", "embeddings"]:
        n, = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()
        gib = os.path.getsize(f"{OUT}/{t}.parquet") / 2**30
        print(f"{OUT}/{t}.parquet: {n} rows, {gib:.2f} GiB")
    # Sanity: vocabulary must GROW across superblocks (Heaps) while
    # per-superblock type counts stay comparable (stationary dfs).
    v0, = con.sql(f"""SELECT count(DISTINCT t) FROM (
        SELECT unnest(string_split(text, ' ')) AS t
        FROM '{OUT}/documents.parquet' WHERE doc_id < {KEYSPAN})""").fetchone()
    vall, = con.sql(f"""SELECT count(DISTINCT t) FROM (
        SELECT unnest(string_split(text, ' ')) AS t
        FROM '{OUT}/documents.parquet')""").fetchone()
    print(f"vocab: superblock0 {v0}, corpus {vall} ({vall / v0:.1f}x)")


if __name__ == "__main__":
    main()
