package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting surface a large-scale
  * training-data pipeline needs (plus the reference's term-frequency op M8,
  * 实习四/…yelp_analysis.ipynb:1042-1101).
  *
  * Scale posture: every query is explode → hash-aggregate (one shuffle,
  * map-side combined) or a pure per-row projection; nothing materializes
  * per-document state on the driver.
  */
object TextQueries extends QueryCatalog {

  def defs: Map[String, QueryDef] = Map(

    // T1 — token counting: whitespace tokens vs regex word/number/symbol
    // tokens (a BPE-ish pre-tokenizer split), per language.
    "t1_token_stats" -> QueryDef(
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"),
          size(split(col("text"), " ")).as("ws_toks"),
          expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").as("re_toks"),
          col("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("ws_toks"), 4).as("avg_ws_toks"),
          round(avg("re_toks"), 4).as("avg_re_toks"),
          round(avg(col("n_chars").cast("double") / col("ws_toks")), 4).as("chars_per_tok"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
             |  round(avg(len(string_split(text, ' '))), 4) AS avg_ws_toks,
             |  round(avg(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))), 4) AS avg_re_toks,
             |  round(avg(CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))), 4) AS chars_per_tok
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      headline = true),

    // T2 — language ID as a self-trained naive-Bayes n-gram classifier:
    // per-language token profiles (add-one smoothing) scored against each
    // document; prediction = argmax log-likelihood. Pure joins + aggregates —
    // the scoring join shuffles on token, the right key at any scale. The
    // profile side is NOT broadcast: it is vocabulary-sized (one row per
    // (lang, token)), which at web scale is GBs per executor — let Spark
    // pick (AQE will still broadcast it when it is genuinely small).
    // Output: confusion matrix.
    "t2_lang_id_confusion" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val docTok = docs.select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        val profile = docTok.groupBy(col("lang").as("cand"), col("tok"))
          .agg(count(lit(1)).as("n_lt"))
        val langTotals = docTok.groupBy(col("lang").as("cand")).agg(count(lit(1)).as("n_l"))
        val vocab = docTok.agg(countDistinct("tok").as("v"))
        val scored = docTok
          .join(profile.join(broadcast(langTotals), "cand").crossJoin(vocab), Seq("tok"))
          .withColumn("ll", log((col("n_lt") + 1.0) / (col("n_l") + col("v"))))
          .groupBy(col("doc_id"), col("lang"), col("cand"))
          .agg(round(sum("ll"), 6).as("loglik"))
        val w = Window.partitionBy("doc_id").orderBy(desc("loglik"), col("cand"))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy(col("lang").as("true_lang"), col("cand").as("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy("true_lang", "pred_lang")
      },
      Some("""WITH dt AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
             |            FROM documents),
             |prof AS (SELECT lang AS cand, tok, count(*) AS n_lt FROM dt GROUP BY 1, 2),
             |tot AS (SELECT lang AS cand, count(*) AS n_l FROM dt GROUP BY 1),
             |voc AS (SELECT count(DISTINCT tok) AS v FROM dt),
             |scored AS (
             |  SELECT dt.doc_id, dt.lang, p.cand,
             |         round(sum(ln((p.n_lt + 1.0) / (t.n_l + voc.v))), 6) AS loglik
             |  FROM dt JOIN prof p USING (tok) JOIN tot t ON p.cand = t.cand, voc
             |  GROUP BY 1, 2, 3),
             |pred AS (SELECT doc_id, lang, cand FROM scored
             |  QUALIFY row_number() OVER (PARTITION BY doc_id
             |    ORDER BY loglik DESC, cand) = 1)
             |SELECT lang AS true_lang, cand AS pred_lang, count(*) AS n
             |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // T3 — quality scoring: length, lexical diversity, and token-shape
    // signals composed into a [0,1] score (the filter stage of a pretraining
    // data pipeline), profiled per source.
    "t3_quality_score" -> QueryDef(
      (s, dir) => Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tok", size(col("toks")))
        .withColumn("distinct_ratio",
          size(array_distinct(col("toks"))).cast("double") / col("n_tok"))
        .withColumn("avg_tok_len",
          (col("n_chars") - col("n_tok") + 1).cast("double") / col("n_tok"))
        .withColumn("quality",
          round(lit(0.5) * least(lit(1.0), col("n_tok") / lit(50.0)) +
            lit(0.3) * col("distinct_ratio") +
            lit(0.2) * least(lit(1.0), col("avg_tok_len") / lit(6.0)), 6))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("quality"), 6).as("avg_q"),
          round(min("quality"), 6).as("min_q"),
          round(max("quality"), 6).as("max_q"))
        .orderBy("source"),
      Some("""WITH d AS (SELECT source, n_chars,
             |    len(string_split(text, ' ')) AS n_tok,
             |    len(list_distinct(string_split(text, ' '))) AS n_dist
             |  FROM documents),
             |q AS (SELECT source,
             |    round(0.5 * least(1.0, n_tok / 50.0) +
             |          0.3 * (CAST(n_dist AS DOUBLE) / n_tok) +
             |          0.2 * least(1.0, ((n_chars - n_tok + 1.0) / n_tok) / 6.0), 6) AS quality
             |  FROM d)
             |SELECT source, count(*) AS n_docs, round(avg(quality), 6) AS avg_q,
             |  round(min(quality), 6) AS min_q, round(max(quality), 6) AS max_q
             |FROM q GROUP BY 1 ORDER BY 1""".stripMargin)),

    // T4 — document fingerprinting: position-weighted rolling checksum
    // (order-sensitive, unlike a bag hash) — Σ hash64(tok)·(pos%7+1) mod 2⁴⁰.
    // Distributes as explode + sum; fingerprint equality ⇒ near-certain dup.
    "t4_fingerprint" -> QueryDef(
      (s, dir) => {
        val hexpr = "cast(conv(substring(md5(tok), 1, 15), 16, 10) as long)"
        Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .withColumn("term", expr(hexpr) % lit(1L << 40) * (col("pos") % 7 + 1))
          .groupBy("doc_id")
          .agg(pmod(sum("term"), lit(1L << 40)).as("fingerprint"))
          .groupBy(expr("fingerprint % 16").as("bucket"))
          .agg(count(lit(1)).as("n_docs"), countDistinct("fingerprint").as("n_distinct"))
          .orderBy("bucket")
      },
      Some("""WITH dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             |    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
             |  FROM documents),
             |fp AS (SELECT doc_id,
             |    CAST(sum((CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 1099511627776)
             |        * (pos % 7 + 1)) % 1099511627776 AS BIGINT) AS fingerprint
             |  FROM dt GROUP BY 1)
             |SELECT fingerprint % 16 AS bucket, count(*) AS n_docs,
             |  count(DISTINCT fingerprint) AS n_distinct
             |FROM fp GROUP BY 1 ORDER BY 1""".stripMargin)),

    // T6 — corpus curation end-to-end: the composed pretraining data filter
    // (quality gate → near-dup survivor selection → per-source retention).
    // Quality reuses T3's score; survivors reuse D5's semantics inline
    // (keep the min doc_id of each Jaccard ≥ 0.5 shingle-overlap pair —
    // the pair graph here is exactly the mutual-best near-dup set, so the
    // survivor rule needs no full closure: a doc is dropped iff it pairs
    // with a smaller kept doc... resolved relationally via the component
    // minimum, same as D5). Fully relational, oracle-checked end to end.
    "t6_corpus_curation" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tok", size(col("toks")))
          .withColumn("quality",
            lit(0.5) * least(lit(1.0), col("n_tok") / lit(50.0)) +
              lit(0.3) * (size(array_distinct(col("toks"))).cast("double") / col("n_tok")) +
              lit(0.2) * least(lit(1.0),
                ((col("n_chars") - col("n_tok") + 1).cast("double") / col("n_tok")) / lit(6.0)))
        val kept = docs.filter(col("quality") >= 0.8)
        // Same df-cap machinery as the shared index, but built over the
        // quality-KEPT docs (the corpus-wide cached index does not apply).
        val sh = graft.ops.ShingleIndex.cappedOf(kept.select("doc_id", "text"))
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val pairs = sh.as("a").join(sh.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("sa")), "id_a")
          .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("sb")), "id_b")
          .filter(col("inter") / (col("sa") + col("sb") - col("inter")) >= 0.5)
        val dropped = graft.graph.GraphOps.connectedComponents(
            pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
          .filter(col("id") =!= col("component"))
          .select(col("id").as("doc_id"))
        val curated = kept.join(dropped, Seq("doc_id"), "left_anti")
        docs.groupBy("source").agg(count(lit(1)).as("n_raw"))
          .join(curated.groupBy("source").agg(count(lit(1)).as("n_curated")), Seq("source"), "left")
          .na.fill(0, Seq("n_curated"))
          .withColumn("retention", round(col("n_curated") / col("n_raw"), 6))
          .orderBy("source")
      },
      Some(s"""WITH RECURSIVE
             |d AS (SELECT doc_id, source, text, n_chars,
             |    len(string_split(text, ' ')) AS n_tok,
             |    len(list_distinct(string_split(text, ' '))) AS n_dist
             |  FROM documents),
             |q AS (SELECT doc_id, source, text,
             |    0.5 * least(1.0, n_tok / 50.0) +
             |    0.3 * (CAST(n_dist AS DOUBLE) / n_tok) +
             |    0.2 * least(1.0, ((n_chars - n_tok + 1.0) / n_tok) / 6.0) AS quality
             |  FROM d),
             |kept AS (SELECT doc_id, source, text FROM q WHERE quality >= 0.8),
             |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM kept),
             |${graft.ops.ShingleIndex.cappedSql},
             |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |pairs AS (SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.doc_id = id_a
             |  JOIN sizes sb ON sb.doc_id = id_b
             |  WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5),
             |sym AS (SELECT id_a AS a, id_b AS b FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |walk(a, b) AS (SELECT a, b FROM sym
             |  UNION SELECT w.a, s.b FROM walk w JOIN sym s ON w.b = s.a),
             |comp AS (SELECT a AS id, least(a, min(b)) AS component
             |  FROM walk GROUP BY a),
             |dropped AS (SELECT id AS doc_id FROM comp WHERE id <> component),
             |curated AS (SELECT * FROM kept
             |  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
             |raw_counts AS (SELECT source, count(*) AS n_raw FROM documents GROUP BY 1),
             |cur_counts AS (SELECT source, count(*) AS n_curated FROM curated GROUP BY 1)
             |SELECT source, n_raw, coalesce(n_curated, 0) AS n_curated,
             |  round(coalesce(n_curated, 0) * 1.0 / n_raw, 6) AS retention
             |FROM raw_counts LEFT JOIN cur_counts USING (source)
             |ORDER BY source""".stripMargin),
      headline = true),

    // T7 — PII scrub: regex-detect and redact email/phone-shaped spans, the
    // standard pre-release curation pass. The synthetic corpus contains no
    // PII, so deterministic PII-shaped suffixes are injected first (doc_id
    // mod 5 / mod 7 gates) — the scrub then has real work that both engines
    // reproduce exactly. Per-row projection: no shuffle beyond the final
    // per-source rollup. Patterns stay in the regex subset Java and RE2
    // share (no backrefs, no lookaround).
    "t7_pii_scrub" -> QueryDef(
      (s, dir) => {
        val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
        val phoneRe = "\\+1-[0-9]{3}-[0-9]{4}"
        // expr() goes through the SQL parser, which consumes one level of
        // backslash escaping inside string literals — double them there.
        val emailSql = emailRe.replace("\\", "\\\\")
        val phoneSql = phoneRe.replace("\\", "\\\\")
        val docs = Tables.documents(s, dir)
          .withColumn("raw", concat(col("text"),
            when(col("doc_id") % 5 === 0,
              concat(lit(" contact"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit(" +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))))
        docs
          .withColumn("n_emails", size(expr(s"regexp_extract_all(raw, '$emailSql', 0)")))
          .withColumn("n_phones", size(expr(s"regexp_extract_all(raw, '$phoneSql', 0)")))
          .withColumn("clean",
            regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_emails").as("total_emails"),
            sum("n_phones").as("total_phones"),
            sum((col("n_emails") > 0 || col("n_phones") > 0).cast("long")).as("n_docs_with_pii"),
            sum(length(col("raw")) - length(col("clean"))).as("chars_delta"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source, doc_id, text ||
             |    CASE WHEN doc_id % 5 = 0
             |      THEN ' contact' || doc_id || '@example.com' ELSE '' END ||
             |    CASE WHEN doc_id % 7 = 0
             |      THEN ' +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
             |    AS raw FROM documents),
             |scrubbed AS (SELECT source, raw,
             |    len(regexp_extract_all(raw, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS n_emails,
             |    len(regexp_extract_all(raw, '\+1-[0-9]{3}-[0-9]{4}')) AS n_phones,
             |    regexp_replace(regexp_replace(raw, '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
             |      '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
             |  FROM d)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_emails) AS BIGINT) AS total_emails,
             |  CAST(sum(n_phones) AS BIGINT) AS total_phones,
             |  CAST(sum(CASE WHEN n_emails > 0 OR n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_docs_with_pii,
             |  CAST(sum(len(raw) - len(clean)) AS BIGINT) AS chars_delta
             |FROM scrubbed GROUP BY 1 ORDER BY 1""".stripMargin)),

    // T8 — repetition filter (the Gopher-style "fraction of text in the
    // most-repeated n-gram" quality rule): per-doc ratio of the top word-3-
    // gram's count to all 3-grams (WITH multiplicity — repetition is the
    // signal), bucketed to a corpus histogram. explode → two hash aggs.
    "t8_repetition" -> QueryDef(
      (s, dir) => {
        val sh = Tables.fanout(Tables.documents(s, dir))
          .select(col("doc_id"), explode(graft.functions.ShingleExpr.shinglesNative(
            graft.functions.TextFunctions.tokens(col("text")), 3)).as("sh"))
        sh.groupBy("doc_id", "sh").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg((max("cnt") / sum("cnt")).as("rep_ratio"))
          .groupBy(floor(col("rep_ratio") * 10).cast("long").as("decile"))
          .agg(count(lit(1)).as("n_docs"),
            round(avg("rep_ratio"), 6).as("avg_ratio"))
          .orderBy("decile")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT doc_id, unnest(
             |    [t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
             |     for i in generate_series(0, len(t) - 3)]) AS sh
             |  FROM toks WHERE len(t) >= 3),
             |per AS (SELECT doc_id, sh, count(*) AS cnt FROM sh GROUP BY 1, 2),
             |ratios AS (SELECT doc_id, max(cnt) * 1.0 / sum(cnt) AS rep_ratio
             |  FROM per GROUP BY 1)
             |SELECT CAST(floor(rep_ratio * 10) AS BIGINT) AS decile,
             |  count(*) AS n_docs, round(avg(rep_ratio), 6) AS avg_ratio
             |FROM ratios GROUP BY 1 ORDER BY 1""".stripMargin)),

    // T9 — sequence packing: assemble documents into fixed-token-budget
    // training sequences (the step between a curated corpus and a trainer's
    // fixed-length batches). Greedy contiguous fill by running token count:
    // a doc's bin is its EXCLUSIVE prefix sum div the budget. Packing is
    // per (source, shard) — real pipelines never pack across shard/file
    // boundaries, and that is exactly what keeps this distributed: the
    // running sum is a window over (source, shard), never a global-order
    // window (which would funnel the corpus through one task at any scale).
    "t9_sequence_pack" -> QueryDef(
      (s, dir) => {
        val budget = 512
        val w = Window.partitionBy("source", "shard").orderBy("doc_id")
        val bins = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).as("n_tokens"))
          .withColumn("shard", pmod(col("doc_id"), lit(4L)))
          .withColumn("cum", sum("n_tokens").over(w))
          .withColumn("bin",
            floor((col("cum") - col("n_tokens")) / budget).cast("long"))
          .groupBy("source", "shard", "bin")
          .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
        bins.groupBy("source")
          .agg(count(lit(1)).as("n_bins"),
            sum("n_docs").as("n_docs"),
            sum("fill").as("total_tokens"),
            round(avg(col("fill").cast("double") / budget), 6).as("avg_fill"),
            max("fill").as("max_bin_tokens"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |    len(string_split(text, ' ')) AS n_tokens, doc_id % 4 AS shard
             |  FROM documents),
             |c AS (SELECT doc_id, source, shard, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t),
             |bins AS (SELECT source, shard,
             |    CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin,
             |    CAST(sum(n_tokens) AS BIGINT) AS fill, count(*) AS n_docs
             |  FROM c GROUP BY 1, 2, 3)
             |SELECT source, count(*) AS n_bins,
             |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
             |  CAST(sum(fill) AS BIGINT) AS total_tokens,
             |  round(avg(CAST(fill AS DOUBLE) / 512), 6) AS avg_fill,
             |  CAST(max(fill) AS BIGINT) AS max_bin_tokens
             |FROM bins GROUP BY 1 ORDER BY 1""".stripMargin)),

    // T10 — sliding-window chunking: every document splits into 64-token
    // chunks at stride 48 (16-token overlap) — the context-window prep step
    // of a RAG/pretraining pipeline. Chunk starts come from a native
    // `sequence` explode, chunk content from a 1-based `slice` — both
    // per-row projections, so the op is one explode + one hash-agg (the
    // same shuffle shape as every text op here; chunk fan-out multiplies
    // rows by ~n_tokens/stride, distributed, never driver-side). Chunk
    // fingerprints (md5-derived 60-bit) make the content itself — not just
    // the counts — part of the oracle check.
    "t10_chunking" -> QueryDef(
      (s, dir) => {
        val win = 64; val stride = 48
        val chunks = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
          .withColumn("n", size(col("toks")))
          .filter(col("n") >= 1)
          .withColumn("start",
            explode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride))))
          .withColumn("chunk_toks",
            slice(col("toks"), col("start") + 1, lit(win)))
          .withColumn("chunk_len", size(col("chunk_toks")))
          .withColumn("fp", graft.functions.TextFunctions.hash64(
            array_join(col("chunk_toks"), " ")))
        chunks.groupBy("source")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum("chunk_len").as("total_chunk_tokens"),
            countDistinct(col("fp")).as("n_distinct_chunks"),
            round(avg(col("chunk_len").cast("double")), 6).as("avg_chunk_tokens"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks,
             |    len(string_split(text, ' ')) AS n FROM documents),
             |st AS (SELECT doc_id, source, toks, n,
             |    unnest(range(0, n, 48)) AS start FROM t WHERE n >= 1),
             |ch AS (SELECT doc_id, source,
             |    toks[start + 1 : least(start + 64, n)] AS chunk_toks
             |  FROM st),
             |fp AS (SELECT doc_id, source, len(chunk_toks) AS chunk_len,
             |    CAST(('0x' || substr(md5(array_to_string(chunk_toks, ' ')), 1, 15)) AS BIGINT) AS fp
             |  FROM ch)
             |SELECT source, count(DISTINCT doc_id) AS n_docs,
             |  count(*) AS n_chunks,
             |  CAST(sum(chunk_len) AS BIGINT) AS total_chunk_tokens,
             |  count(DISTINCT fp) AS n_distinct_chunks,
             |  round(avg(CAST(chunk_len AS DOUBLE)), 6) AS avg_chunk_tokens
             |FROM fp GROUP BY 1 ORDER BY 1""".stripMargin)),

    // T5 — term frequency / word-cloud prep (reference M8: concat → split →
    // stopword filter → top-n, 实习四/…ipynb:1042-1101).
    "t5_word_freq" -> QueryDef(
      (s, dir) => Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 3 && !col("tok").isin("the", "with", "from", "this"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("tok")).limit(30),
      Some("""SELECT tok, count(*) AS n FROM (
             |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             |WHERE length(tok) > 3 AND tok NOT IN ('the', 'with', 'from', 'this')
             |GROUP BY 1 ORDER BY n DESC, tok LIMIT 30""".stripMargin)),

    // Engine-added — top-3 TF-IDF terms per document (keyword extraction).
    // The score is quantized to integer micro-units BEFORE ranking so an
    // ulp of libm ln() difference between engines cannot flip a rank:
    // near-ties become exact ties broken lexicographically. The argmax
    // window partitions by doc_id — millions of small partitions at scale,
    // no global order; tf and df are single hash aggregates.
    "t11_top_tfidf" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val f = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(length(col("tok")) > 3)
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfreq = f.groupBy("tok").agg(count(lit(1)).as("df"))
        val nd = docs.agg(count(lit(1)).as("nd"))
        val sc = f.join(dfreq, "tok").crossJoin(broadcast(nd))
          .withColumn("score_micro",
            round(col("tf") * log((col("nd") + lit(1.0)) / (col("df") + lit(1.0)))
              * lit(1000000.0)).cast("long"))
        val w = Window.partitionBy("doc_id").orderBy(desc("score_micro"), col("tok"))
        sc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
          .select("doc_id", "rnk", "tok", "score_micro")
          .orderBy("doc_id", "rnk")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |f AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             |  WHERE length(tok) > 3 GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df FROM f GROUP BY 1),
             |n AS (SELECT count(*) AS nd FROM documents),
             |sc AS (SELECT f.doc_id, f.tok,
             |    CAST(round(f.tf * ln((n.nd + 1.0) / (dfreq.df + 1.0)) * 1000000)
             |      AS BIGINT) AS score_micro
             |  FROM f JOIN dfreq USING (tok) CROSS JOIN n),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |    ORDER BY score_micro DESC, tok) AS rnk FROM sc)
             |SELECT doc_id, rnk, tok, score_micro FROM r WHERE rnk <= 3
             |ORDER BY doc_id, rnk""".stripMargin)),

    // Engine-added — Zipf's-law fit: OLS of ln(freq) on ln(rank) over the
    // top-100 tokens (the corpus-health diagnostic — natural text slopes
    // ≈ −1; a far-off slope flags boilerplate or spam). Top-100 via
    // TakeOrderedAndProject (scale-safe), ranked by a bounded window over
    // ≤100 rows with a non-foldable constant partition key. Both logs are
    // quantized to integer micro-units BEFORE the moment sums (t11
    // pattern: an ulp of libm ln() skew cannot move an integer), so the
    // regression inputs are identical integers and the slope/intercept/r²
    // arithmetic is a pure IEEE chain both engines evaluate bit-for-bit.
    "t12_zipf_fit" -> QueryDef(
      (s, dir) => {
        val top = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("tok"))
          .filter(length(col("tok")) > 0)
          .groupBy("tok").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("tok")).limit(100)
        val one = coalesce(pmod(col("n"), lit(1)), lit(0))
        val rw = Window.partitionBy(one).orderBy(desc("n"), col("tok"))
        val pts = top.withColumn("rank", row_number().over(rw))
          .select(
            round(log(col("rank").cast("double")) * lit(1000000.0)).cast("long").as("xq"),
            round(log(col("n").cast("double")) * lit(1000000.0)).cast("long").as("yq"))
        val m = pts.agg(count(lit(1)).as("np"),
          sum("xq").as("sx"), sum("yq").as("sy"),
          sum(col("xq") * col("yq")).as("sxy"),
          sum(col("xq") * col("xq")).as("sxx"),
          sum(col("yq") * col("yq")).as("syy"))
        val num = (col("np") * col("sxy") - col("sx") * col("sy")).cast("double")
        val den = (col("np") * col("sxx") - col("sx") * col("sx")).cast("double")
        val deny = (col("np") * col("syy") - col("sy") * col("sy")).cast("double")
        m.select(col("np").as("n_terms"),
          round(num / den, 6).as("slope"),
          round((col("sy").cast("double") - num / den * col("sx").cast("double"))
            / col("np").cast("double") / lit(1000000.0), 6).as("intercept"),
          round(num * num / (den * deny), 6).as("r2"))
      },
      Some("""WITH freq AS (SELECT tok, count(*) AS n FROM (
             |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             |  WHERE length(tok) > 0 GROUP BY 1 ORDER BY n DESC, tok LIMIT 100),
             |pts AS (SELECT
             |    CAST(round(ln(CAST(row_number() OVER (ORDER BY n DESC, tok) AS DOUBLE))
             |      * 1000000) AS BIGINT) AS xq,
             |    CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS yq
             |  FROM freq),
             |s AS (SELECT count(*) AS np,
             |    CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
             |    CAST(sum(xq * yq) AS BIGINT) AS sxy,
             |    CAST(sum(xq * xq) AS BIGINT) AS sxx,
             |    CAST(sum(yq * yq) AS BIGINT) AS syy
             |  FROM pts)
             |SELECT np AS n_terms,
             |  round(CAST(np * sxy - sx * sy AS DOUBLE)
             |    / CAST(np * sxx - sx * sx AS DOUBLE), 6) AS slope,
             |  round((CAST(sy AS DOUBLE) - CAST(np * sxy - sx * sy AS DOUBLE)
             |      / CAST(np * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |    / CAST(np AS DOUBLE) / 1000000, 6) AS intercept,
             |  round(CAST(np * sxy - sx * sy AS DOUBLE) * CAST(np * sxy - sx * sy AS DOUBLE)
             |    / (CAST(np * sxx - sx * sx AS DOUBLE) * CAST(np * syy - sy * sy AS DOUBLE)),
             |    6) AS r2
             |FROM s""".stripMargin)),

    // T13 — cross-document duplicated-text coverage (the Gopher/RefinedWeb
    // corpus-health metric): per document, the fraction of its distinct
    // word-3-grams that also appear in at least one OTHER document, bucketed
    // into deciles. Complements t8 (intra-doc repetition) and d2 (pairwise
    // similarity): this is the corpus-level "how much of my text is shared
    // boilerplate" histogram a curation run reads before choosing dedup
    // thresholds. Scale posture: COUNTING shingle document-frequency is
    // linear (one map-side-combined shuffle on `sh`) even where PAIRING
    // needs the df-cap — so no cap here, the true df feeds the coverage.
    // The df join reuses the same `sh` shuffle key; per-doc fractions
    // quantize to integer micro-units BEFORE the decile average so the
    // cross-partition sum is order-free exact.
    "t13_dup_coverage" -> QueryDef(
      (s, dir) => {
        val sh = Tables.fanout(Tables.documents(s, dir))
          .select(col("doc_id"), explode(array_distinct(
            graft.functions.ShingleExpr.shinglesNative(
              graft.functions.TextFunctions.tokens(col("text")), 3))).as("sh"))
        val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("ndocs"))
        sh.join(dfreq, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("tot"),
            sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("dup"))
          .select(least(expr("(dup * 10) div tot"), lit(9L)).as("decile"),
            expr("(dup * 1000000) div tot").as("fmic"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"),
            round(sum("fmic").cast("double") / count(lit(1)) / lit(1000000.0), 6)
              .as("avg_frac"))
          .orderBy("decile")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT doc_id, unnest(list_distinct(
             |    [t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
             |     for i in generate_series(0, len(t) - 3)])) AS sh
             |  FROM toks WHERE len(t) >= 3),
             |df AS (SELECT sh, count(*) AS ndocs FROM sh GROUP BY 1),
             |per AS (SELECT doc_id, count(*) AS tot,
             |    CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup
             |  FROM sh JOIN df USING (sh) GROUP BY 1),
             |b AS (SELECT least((dup * 10) // tot, 9) AS decile,
             |    (dup * 1000000) // tot AS fmic FROM per)
             |SELECT decile, count(*) AS n_docs,
             |  round(CAST(sum(fmic) AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_frac
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // T14 — bigram-LM quality scoring (the CCNet/KenLM perplexity-filter
    // shape): train a bigram model on the corpus itself (MLE P(w2|w1) =
    // C(w1w2)/C(w1·)), score every document by its mean bigram log-prob,
    // flag low-likelihood docs. Per-bigram log-probs quantize to integer
    // micro-units (t12 pattern: ln of an identical double both engines,
    // round absorbs the possible libm ulp) BEFORE any sum, so doc scores
    // and source aggregates are order-free exact integer arithmetic. Scale
    // posture: the model is two hash aggregates over the bigram explode
    // (one shuffle each, map-side combined); scoring re-joins the SAME
    // bigram key, then w1 — the count side is vocabulary-sized, NOT
    // broadcast by hand (web-scale vocab is GBs; AQE still broadcasts it
    // when genuinely small, same call as t2).
    "t14_bigram_quality" -> QueryDef(
      (s, dir) => {
        val bg = Tables.fanout(Tables.documents(s, dir))
          .select(col("doc_id"), col("source"),
            explode(graft.functions.ShingleExpr.shinglesNative(
              graft.functions.TextFunctions.tokens(col("text")), 2)).as("bg"))
          .withColumn("w1", substring_index(col("bg"), " ", 1))
        val bgCnt = bg.groupBy("bg").agg(count(lit(1)).as("cb"))
        val leftCnt = bg.groupBy("w1").agg(count(lit(1)).as("cw"))
        val perDoc = bg.join(bgCnt, "bg").join(leftCnt, "w1")
          .withColumn("q", round(log(col("cb").cast("double")
            / col("cw").cast("double")) * 1000000).cast("long"))
          .groupBy("doc_id", "source")
          .agg(sum("q").as("sq"), count(lit(1)).as("nb"))
          .withColumn("mmicro", expr("sq div nb"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("mmicro") < lit(-3500000L), 1L).otherwise(0L)).as("n_flagged"),
            sum("sq").as("tq"), sum("nb").as("tnb"))
          .select(col("source"), col("n_docs"), col("n_flagged"),
            round(col("tq").cast("double") / col("tnb").cast("double")
              / lit(1000000.0), 6).as("mean_logprob"))
          .orderBy("source")
      },
      Some("""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
             |    FROM documents),
             |bg0 AS (SELECT doc_id, source,
             |    unnest([t[i+1] || ' ' || t[i+2] for i in generate_series(0, len(t) - 2)]) AS bg
             |  FROM toks WHERE len(t) >= 2),
             |bgw AS (SELECT doc_id, source, bg, string_split(bg, ' ')[1] AS w1 FROM bg0),
             |cb AS (SELECT bg, count(*) AS cb FROM bgw GROUP BY 1),
             |cw AS (SELECT w1, count(*) AS cw FROM bgw GROUP BY 1),
             |q AS (SELECT doc_id, source,
             |    CAST(round(ln(CAST(cb.cb AS DOUBLE) / CAST(cw.cw AS DOUBLE))
             |      * 1000000) AS BIGINT) AS q
             |  FROM bgw JOIN cb USING (bg) JOIN cw USING (w1)),
             |pd AS (SELECT doc_id, source, CAST(sum(q) AS BIGINT) AS sq,
             |    count(*) AS nb FROM q GROUP BY 1, 2),
             |pm AS (SELECT source, sq, nb, sq // nb AS mmicro FROM pd)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN mmicro < -3500000 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_flagged,
             |  round(CAST(sum(sq) AS DOUBLE) / CAST(sum(nb) AS DOUBLE) / 1000000.0, 6)
             |    AS mean_logprob
             |FROM pm GROUP BY 1 ORDER BY 1""".stripMargin)),

    // T15 — maximal-marginal-relevance (MMR) diverse selection: re-rank a
    // retrieved candidate pool so each pick maximizes λ·relevance −
    // (1−λ)·max-similarity-to-already-picked (λ = 0.7) — the standard
    // diversity re-ranker for retrieval / training-subset selection. The
    // production shape is pool-bounded: relevance (query-term density,
    // integer micro-units) picks a TOP-50 pool via TakeOrdered, pairwise
    // BIGRAM Jaccards (denser than 3-grams — the pool's near-dup pairs sit
    // at sim ≈ 0.99, exactly what the penalty must demote) are computed
    // ONCE over the pool's inverted shingle index (≤ pool² pairs — never corpus²), and the 5 greedy picks unroll
    // with a lineage cut per round (each pick's 1-row frame re-enters the
    // next round twice — anti-join + sim lookup — which would double the
    // Catalyst plan per round unchecked). ALL scoring is integer: rel and
    // sim in micro-units, score = (7·rel − 3·maxsim) div 10, truncation
    // identical cross-engine — so every argmax is exact.
    "t15_mmr_select" -> QueryDef(
      (s, dir) => {
        val qterms = Seq("spark", "table", "query")
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
          .filter(size(col("t")) > 0)
        val rel = toks.select(col("doc_id"),
          expr(s"(size(filter(t, x -> x IN (${qterms.map("'" + _ + "'").mkString(",")})))" +
            " * 1000000) div size(t)").as("rel"))
        val pool = graft.core.Materialize.cut(
          rel.orderBy(desc("rel"), col("doc_id")).limit(50))
        val psh = toks.join(pool.select("doc_id"), "doc_id")
          .select(col("doc_id"), explode(array_distinct(
            graft.functions.ShingleExpr.shinglesNative(col("t"), 2))).as("sh"))
        val sz = psh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = psh.select(col("doc_id").as("ia"), col("sh"))
          .join(psh.select(col("doc_id").as("ib"), col("sh")), "sh")
          .filter(col("ia") < col("ib"))
          .groupBy("ia", "ib").agg(count(lit(1)).as("c"))
        val simHalf = inter
          .join(sz.select(col("doc_id").as("ia"), col("n").as("na")), "ia")
          .join(sz.select(col("doc_id").as("ib"), col("n").as("nb")), "ib")
          .select(col("ia"), col("ib"), expr("(c * 1000000) div (na + nb - c)").as("smic"))
        val sim = graft.core.Materialize.cut(simHalf.unionByName(
          simHalf.select(col("ib").as("ia"), col("ia").as("ib"), col("smic"))))
        val first = graft.core.Materialize.cut(
          pool.select(col("doc_id"), col("rel"), lit(0L).as("maxsim"),
              expr("(7 * rel) div 10").as("score"), lit(1).as("pick"))
            .orderBy(desc("score"), col("doc_id")).limit(1))
        val selected = (2 to 5).foldLeft(first) { (sel, i) =>
          val cand = pool.join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
            .join(sim.join(sel.select(col("doc_id").as("ib")), "ib")
                .groupBy("ia").agg(max("smic").as("ms")),
              col("doc_id") === col("ia"), "left")
            .select(col("doc_id"), col("rel"),
              coalesce(col("ms"), lit(0L)).as("maxsim"))
            .withColumn("score", expr("(7 * rel - 3 * maxsim) div 10"))
            .withColumn("pick", lit(i))
          graft.core.Materialize.cut(sel.unionByName(
            cand.orderBy(desc("score"), col("doc_id")).limit(1)))
        }
        selected.select(col("pick"), col("doc_id"),
            round(col("rel").cast("double") / 1e6, 6).as("rel"),
            round(col("maxsim").cast("double") / 1e6, 6).as("max_sim"),
            round(col("score").cast("double") / 1e6, 6).as("mmr_score"))
          .orderBy("pick")
      },
      Some {
        val q = "('spark', 'table', 'query')"
        def candSql(i: Int): String = {
          val prev = (1 until i).map(j => s"SELECT doc_id FROM s$j").mkString(" UNION ALL ")
          s"""c$i AS (SELECT p.doc_id, p.rel, coalesce(mx.ms, 0) AS maxsim
             |  FROM pool p
             |  LEFT JOIN (SELECT a, max(smic) AS ms FROM sim
             |      WHERE b IN ($prev) GROUP BY 1) mx ON mx.a = p.doc_id
             |  WHERE p.doc_id NOT IN ($prev)),
             |s$i AS MATERIALIZED (SELECT doc_id, rel, maxsim,
             |    (7 * rel - 3 * maxsim) // 10 AS score, $i AS pick
             |  FROM c$i ORDER BY score DESC, doc_id LIMIT 1)""".stripMargin
        }
        s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
           |    WHERE len(string_split(text, ' ')) > 0),
           |rel AS (SELECT doc_id,
           |    (len(list_filter(t, x -> x IN $q)) * 1000000) // len(t) AS rel
           |  FROM toks),
           |pool AS MATERIALIZED (SELECT doc_id, rel FROM rel
           |  ORDER BY rel DESC, doc_id LIMIT 50),
           |psh AS (SELECT toks.doc_id, unnest(list_distinct(
           |    [t[i+1] || ' ' || t[i+2]
           |     for i in generate_series(0, len(t) - 2)])) AS sh
           |  FROM toks JOIN pool ON pool.doc_id = toks.doc_id WHERE len(t) >= 2),
           |sz AS (SELECT doc_id, count(*) AS n FROM psh GROUP BY 1),
           |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
           |  FROM psh a JOIN psh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |simh AS (SELECT ia, ib, (c * 1000000) // (sa.n + sb.n - c) AS smic
           |  FROM inter JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib),
           |sim AS MATERIALIZED (SELECT ia AS a, ib AS b, smic FROM simh
           |  UNION ALL SELECT ib, ia, smic FROM simh),
           |s1 AS MATERIALIZED (SELECT doc_id, rel, CAST(0 AS BIGINT) AS maxsim,
           |    (7 * rel) // 10 AS score, 1 AS pick
           |  FROM pool ORDER BY score DESC, doc_id LIMIT 1),
           |${(2 to 5).map(candSql).mkString(",\n")}
           |SELECT pick, doc_id,
           |  round(CAST(rel AS DOUBLE) / 1000000, 6) AS rel,
           |  round(CAST(maxsim AS DOUBLE) / 1000000, 6) AS max_sim,
           |  round(CAST(score AS DOUBLE) / 1000000, 6) AS mmr_score
           |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
           |  UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
           |  UNION ALL SELECT * FROM s5)
           |ORDER BY pick""".stripMargin
      }),

    // T16 — BM25 ranked retrieval (Okapi k1 = 1.2, b = 0.75): the lexical
    // scorer behind every retrieval-based curation / RAG pre-filter. Doc
    // lengths and term frequencies are hash aggregates over the exploded
    // token stream; the query-term filter lands BEFORE the tf aggregation so
    // the scored side is |terms|-bounded, and df/corpus stats ride in as
    // broadcast one-row frames. FP discipline: idf = ln((N−df+½)/(df+½)+1)
    // is the one libm call — quantized to integer micro-units (t11 rule);
    // the tf-saturation fraction is a pure-IEEE chain written in the same
    // association both engines; each per-term score rounds to integer
    // micro-units BEFORE the per-doc sum, so the sum is order-free and the
    // top-10 argmax exact. Top-10 via TakeOrderedAndProject, never a global
    // sort.
    "t16_bm25" -> QueryDef(
      (s, dir) => {
        val terms = Seq("spark", "window", "merge", "vector")
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val st = dl.agg(count(lit(1)).as("nd"), sum("dl").as("tot"))
        val tf = toks.filter(col("tok").isin(terms: _*))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        tf.join(broadcast(dfreq), "tok").join(dl, "doc_id").crossJoin(broadcast(st))
          .withColumn("idf_micro",
            round(log((col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
              + lit(1.0)) * lit(1000000.0)).cast("long"))
          .withColumn("term_micro",
            round(col("idf_micro") * (col("tf") * lit(2.2))
              / (col("tf") + lit(1.2) * (lit(0.25)
                + lit(0.75) * (col("dl") * col("nd")).cast("double") / col("tot"))))
              .cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms"), sum("term_micro").as("score_micro"))
          .orderBy(desc("score_micro"), col("doc_id")).limit(10)
          .select(col("doc_id"), col("n_terms"),
            round(col("score_micro").cast("double") / 1000000, 6).as("bm25"))
          .orderBy(desc("bm25"), col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
             |st AS (SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             |  WHERE tok IN ('spark', 'window', 'merge', 'vector') GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |sc AS (SELECT tf.doc_id,
             |    CAST(round(ln((nd - df + 0.5) / (df + 0.5) + 1.0) * 1000000.0)
             |      AS BIGINT) AS idf_micro,
             |    tf.tf, dl.dl, st.nd, st.tot
             |  FROM tf JOIN dfreq USING (tok) JOIN dl ON dl.doc_id = tf.doc_id
             |  CROSS JOIN st),
             |tm AS (SELECT doc_id,
             |    CAST(round(idf_micro * (tf * 2.2)
             |      / (tf + 1.2 * (0.25 + 0.75 * CAST(dl * nd AS DOUBLE) / tot)))
             |      AS BIGINT) AS term_micro
             |  FROM sc),
             |agg AS (SELECT doc_id, count(*) AS n_terms,
             |    CAST(sum(term_micro) AS BIGINT) AS score_micro
             |  FROM tm GROUP BY 1
             |  ORDER BY score_micro DESC, doc_id LIMIT 10)
             |SELECT doc_id, n_terms,
             |  round(CAST(score_micro AS DOUBLE) / 1000000, 6) AS bm25
             |FROM agg ORDER BY bm25 DESC, doc_id""".stripMargin))
  )
}
