#!/usr/bin/env python3
"""Generate the 10x scale-evidence corpus under tmp/scale/docs10x/.

Documents are drawn from the EMPIRICAL token distribution of the sf0.1
corpus (per-language, deterministic LCG — no RNG state dependence), with
the same length and source distributions, so shingle document-frequencies
scale ~linearly with corpus size instead of exploding (a naive replicate
would multiply every df by 10 and distort the df-cap behavior the run is
meant to measure).
"""
import collections, duckdb, os, sys

SRC = "/root/testdata/sf0.1/documents.parquet"
# Optional argv factor (default 10): the round-8 second-decade whale needs
# a 100x Heaps corpus (500k docs) — same generator, same empirics, more
# blocks (vocabulary keeps growing with the corpus, df stays stationary).
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = f"tmp/scale/docs{FACTOR}x"
OUT_HEAPS = f"tmp/scale/docs{FACTOR}x_heaps"
# In the Heaps variant each 1x block salts its CONTENT tokens (everything
# below the top-K function words) with the block id, so vocabulary grows
# with the corpus and the shingle-df distribution stays stationary — the
# realistic corpus-growth regime. The unsalted variant keeps one fixed
# vocabulary, so dfs inflate linearly — the adversarial regime that pushes
# the df-cap.
TOP_K_GLOBAL = 10


def lcg(state):
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield state >> 11


def main():
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{SRC}' ORDER BY doc_id").fetchall()
    # per-language token frequency + corpus length/source empirics
    vocab = collections.defaultdict(collections.Counter)
    lens, langs, sources = [], [], []
    for _, text, lang, source in rows:
        toks = text.split(" ")
        vocab[lang].update(toks)
        lens.append(len(toks))
        langs.append(lang)
        sources.append(source)
    cum = {}
    for lang, ctr in vocab.items():
        toks, weights = zip(*sorted(ctr.items()))
        total, acc, cdf = sum(weights), 0, []
        for w in weights:
            acc += w
            cdf.append(acc)
        cum[lang] = (toks, cdf, total)

    global_toks = {lang: {t for t, _ in ctr.most_common(TOP_K_GLOBAL)}
                   for lang, ctr in vocab.items()}

    n_base = len(rows)
    for out, heaps in [(OUT, False), (OUT_HEAPS, True)]:
        rnd = lcg(20260813)
        out_rows = []
        for i in range(n_base * FACTOR):
            base = i % n_base
            block = i // n_base
            lang, source, n_toks = langs[base], sources[base], lens[base]
            toks, cdf, total = cum[lang]
            words = []
            for _ in range(n_toks):
                r = next(rnd) % total
                # binary search the empirical CDF
                lo, hi = 0, len(cdf) - 1
                while lo < hi:
                    mid = (lo + hi) // 2
                    if cdf[mid] > r:
                        hi = mid
                    else:
                        lo = mid + 1
                w = toks[lo]
                if heaps and w not in global_toks[lang]:
                    w = f"{w}_b{block}"
                words.append(w)
            text = " ".join(words)
            out_rows.append((i, text, lang, source, len(text)))

        os.makedirs(out, exist_ok=True)
        con = duckdb.connect()
        con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                    "source VARCHAR, n_chars BIGINT)")
        con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", out_rows)
        con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
        con.close()
        print(f"wrote {out}/documents.parquet ({len(out_rows)} docs, "
              f"{FACTOR}x of {n_base}, heaps={heaps})")


if __name__ == "__main__":
    main()
