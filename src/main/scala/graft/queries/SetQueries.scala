package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.7): union-all, set difference, train/valid
  * splits, sampling.
  *
  * Determinism posture: the reference's random splits/samples
  * (train_test_split, df.sample(frac)) are re-expressed as *hash splits* —
  * `key*prime mod 100 < p` — because seeded RNG streams are engine-specific
  * and could never hash-match a DuckDB oracle. Hash splits are also the
  * 100 TB-correct design: no global shuffle or row numbering, every row
  * decides its split locally, and the assignment is stable under
  * repartitioning and re-runs.
  */
object SetQueries extends QueryCatalog {

  def defs: Map[String, QueryDef] = Map(

    // U1 — union-all row concat (reference pd.concat, 实习二/…ipynb:533-534):
    // high-value and urgent order slices unioned, distinct counted.
    "u1_union_all" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val hi = o.filter(col("o_totalprice") > 4000).select("o_orderkey", "o_orderstatus")
        val ur = o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey", "o_orderstatus")
        hi.unionByName(ur)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_rows"), countDistinct("o_orderkey").as("n_distinct"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_rows,
             |  count(DISTINCT o_orderkey) AS n_distinct
             |FROM (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 4000
             |      UNION ALL
             |      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // U2 — set difference via EXCEPT (reference set(all) − set(reviewed),
    // analyze_data_bias.py:231-236): part keys never shipped.
    "u2_except" -> QueryDef(
      (s, dir) => Tables.part(s, dir).select(col("p_partkey").as("k"))
        .except(Tables.lineitem(s, dir).select(col("l_partkey").as("k")))
        .agg(count(lit(1)).as("n_unshipped"), coalesce(min("k"), lit(-1L)).as("min_key")),
      Some("""SELECT count(*) AS n_unshipped, coalesce(min(k), -1) AS min_key FROM (
             |  SELECT p_partkey AS k FROM part
             |  EXCEPT
             |  SELECT l_partkey AS k FROM lineitem)""".stripMargin)),

    // U3 — deterministic 70/30 train/valid hash split (reference positional
    // np.split 实习二/…ipynb:108 / train_test_split): per-split aggregates
    // prove the split is disjoint and exhaustive.
    "u3_hash_split" -> QueryDef(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("split",
          when(pmod(col("o_orderkey") * lit(2654435761L), lit(100L)) < 70, "train").otherwise("valid"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
          round(avg("o_totalprice"), 4).as("avg_price"))
        .orderBy("split"),
      Some("""SELECT CASE WHEN (o_orderkey * 2654435761) % 100 < 70
             |  THEN 'train' ELSE 'valid' END AS split,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
             |  round(avg(o_totalprice), 4) AS avg_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // U4 — deterministic 10% sample (reference sample(frac=0.1, seed),
    // clip_data.py:9-15): hash-gate keeps the scan parallel and reproducible.
    "u4_hash_sample" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(pmod(col("l_orderkey") * lit(7L) + col("l_linenumber"), lit(10L)) === 0)
        .agg(count(lit(1)).as("n_sampled"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_quantity"), 4).as("avg_qty")),
      Some("""SELECT count(*) AS n_sampled, round(sum(l_extendedprice), 2) AS sum_price,
             |  round(avg(l_quantity), 4) AS avg_qty
             |FROM lineitem WHERE (l_orderkey * 7 + l_linenumber) % 10 = 0""".stripMargin)),

    // U5 — one-hot / get_dummies (reference pd.get_dummies + column concat,
    // 实习二/…ipynb:850-853): o_orderpriority expands to indicator columns in
    // one projection (the category list is declared, so the schema is static
    // and no pivot-discovery pass scans the data), then per-status indicator
    // sums + the mean of the first dummy — the groupby-mean a model-prep
    // pipeline would feed.
    "u5_one_hot" -> QueryDef(
      (s, dir) => {
        val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val dummies = Tables.orders(s, dir).select(
          col("o_orderstatus") +: pris.zipWithIndex.map { case (p, i) =>
            (col("o_orderpriority") === p).cast("long").as(s"pri_${i + 1}")
          }: _*)
        dummies.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum("pri_1").as("n_pri_1"), sum("pri_2").as("n_pri_2"),
            sum("pri_3").as("n_pri_3"), sum("pri_4").as("n_pri_4"),
            sum("pri_5").as("n_pri_5"),
            round(avg("pri_1"), 6).as("urgent_rate"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH d AS (SELECT o_orderstatus,
             |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pri_1,
             |    CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS pri_2,
             |    CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS pri_3,
             |    CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END AS pri_4,
             |    CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS pri_5
             |  FROM orders)
             |SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(pri_1) AS BIGINT) AS n_pri_1,
             |  CAST(sum(pri_2) AS BIGINT) AS n_pri_2,
             |  CAST(sum(pri_3) AS BIGINT) AS n_pri_3,
             |  CAST(sum(pri_4) AS BIGINT) AS n_pri_4,
             |  CAST(sum(pri_5) AS BIGINT) AS n_pri_5,
             |  round(avg(CAST(pri_1 AS DOUBLE)), 6) AS urgent_rate
             |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),

    // U6 — per-source quota sampling (the per-domain cap of a corpus
    // curation pipeline: no single source may dominate the training mix).
    // Rank docs within each source by a deterministic md5-derived key and
    // keep the first q — reproducible across runs/engines, unlike seeded
    // RNG. One shuffle on source; the window sorts only within a group, and
    // the hot sources a cap exists for are trimmed to q anyway. Summary
    // proves the cap: kept counts never exceed q and ranks are 1..q.
    "u6_source_quota" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val q = 8
        val ranked = Tables.documents(s, dir)
          .withColumn("hk", graft.functions.TextFunctions.hash64(
            concat(lit("quota:"), col("doc_id").cast("string"))))
          .withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))))
        ranked.filter(col("rn") <= q)
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"),
            min("doc_id").as("first_kept"),
            sum("doc_id").as("kept_checksum"))
          .orderBy("source")
      },
      Some("""WITH ranked AS (SELECT source, doc_id,
             |    row_number() OVER (PARTITION BY source ORDER BY
             |      CAST(('0x' || substr(md5('quota:' || doc_id), 1, 15)) AS BIGINT),
             |      doc_id) AS rn
             |  FROM documents)
             |SELECT source, count(*) AS n_kept, min(doc_id) AS first_kept,
             |  CAST(sum(doc_id) AS BIGINT) AS kept_checksum
             |FROM ranked WHERE rn <= 8
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // U7 — stratified mixture sampling: per-stratum RATES (a per-language
    // target mixture — the knob a pretraining pipeline turns to up/down-
    // weight domains), enforced by a deterministic per-row hash gate, so
    // unlike u6's fixed CAP there is no per-stratum ranking shuffle at all:
    // one scan, one filter, one agg — embarrassingly parallel at any scale.
    // Rates are percent thresholds against hash64(doc_id) mod 100.
    "u7_stratified_sample" -> QueryDef(
      (s, dir) => {
        val gate = pmod(graft.functions.TextFunctions.hash64(
          concat(lit("mix:"), col("doc_id").cast("string"))), lit(100L))
        val rate = when(col("lang") === "en", 80L)
          .when(col("lang") === "de", 50L)
          .otherwise(20L)
        Tables.documents(s, dir)
          .filter(gate < rate)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"),
            min("doc_id").as("first_kept"),
            sum("doc_id").as("kept_checksum"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_kept, min(doc_id) AS first_kept,
             |  CAST(sum(doc_id) AS BIGINT) AS kept_checksum
             |FROM documents
             |WHERE CAST(('0x' || substr(md5('mix:' || doc_id), 1, 15)) AS BIGINT) % 100
             |  < CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 50 ELSE 20 END
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Engine-added — CDC-style MERGE/upsert (Delta/Iceberg `MERGE INTO`
    // semantics: WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT /
    // untouched rows kept): the incremental-snapshot maintenance step of
    // any warehouse-scale pipeline. The change set is derived
    // deterministically from orders — per-customer spend in integer cents
    // (order-free exact), keys ≡ 0 (mod 3) as updates, keys ≡ 5 (mod 11)
    // shifted past max(custkey) as inserts. The merge itself is ONE
    // shuffle: a full-outer equi-join on the key (map-side-combined agg
    // feeds it; the max-key scalar rides broadcast) — the same plan a
    // lakehouse MERGE compiles to, minus the file rewrite.
    "u8_merge_upsert" -> QueryDef(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey").as("key"), col("c_mktsegment").as("seg"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        val maxk = cust.agg(max("key").as("maxk"))
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("k"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("spent_cents"))
        val upd = spend.filter(pmod(col("k"), lit(3L)) === 0)
          .select(col("k").as("ukey"), col("spent_cents"))
        val ins = spend.filter(pmod(col("k"), lit(11L)) === 5)
          .crossJoin(broadcast(maxk))
          .select((col("k") + col("maxk")).as("ukey"), col("spent_cents"))
        val changes = upd.unionByName(ins)
        val merged = cust.join(changes, col("key") === col("ukey"), "full_outer")
          .select(
            when(col("key").isNotNull && col("ukey").isNotNull, "update")
              .when(col("ukey").isNotNull, "insert").otherwise("keep").as("op"),
            coalesce(col("key"), col("ukey")).as("mkey"),
            (coalesce(col("bal_cents"), lit(0L))
              + coalesce(col("spent_cents"), lit(0L))).as("new_bal"),
            when(col("key").isNotNull && col("ukey").isNotNull, lit("UPGRADED"))
              .when(col("ukey").isNotNull, lit("NEW")).otherwise(col("seg")).as("new_seg"))
        merged.groupBy("op")
          .agg(count(lit(1)).as("n_rows"),
            sum("new_bal").as("bal_cents"),
            countDistinct("new_seg").as("n_segments"),
            min("mkey").as("min_key"), max("mkey").as("max_key"))
          .orderBy("op")
      },
      Some("""WITH cust AS (SELECT c_custkey AS key, c_mktsegment AS seg,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
             |mk AS (SELECT max(key) AS maxk FROM cust),
             |spend AS (SELECT o_custkey AS k,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spent_cents
             |  FROM orders GROUP BY 1),
             |changes AS (
             |  SELECT k AS ukey, spent_cents FROM spend WHERE k % 3 = 0
             |  UNION ALL
             |  SELECT k + mk.maxk, spent_cents FROM spend CROSS JOIN mk WHERE k % 11 = 5),
             |merged AS (SELECT
             |    CASE WHEN c.key IS NOT NULL AND g.ukey IS NOT NULL THEN 'update'
             |         WHEN g.ukey IS NOT NULL THEN 'insert' ELSE 'keep' END AS op,
             |    coalesce(c.key, g.ukey) AS mkey,
             |    coalesce(c.bal_cents, 0) + coalesce(g.spent_cents, 0) AS new_bal,
             |    CASE WHEN c.key IS NOT NULL AND g.ukey IS NOT NULL THEN 'UPGRADED'
             |         WHEN g.ukey IS NOT NULL THEN 'NEW' ELSE c.seg END AS new_seg
             |  FROM cust c FULL OUTER JOIN changes g ON g.ukey = c.key)
             |SELECT op, count(*) AS n_rows, CAST(sum(new_bal) AS BIGINT) AS bal_cents,
             |  count(DISTINCT new_seg) AS n_segments,
             |  min(mkey) AS min_key, max(mkey) AS max_key
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Engine-added — temperature-scaled source mixing (the q_s ∝ size_s^α
    // rebalancing rule, α = 1/2: the knob multilingual / multi-domain
    // pretraining mixes turn to damp dominant sources and boost the tail).
    // Against u6's fixed CAP and u7's fixed RATES, the quota here is
    // COMPUTED from corpus composition under a global budget. Everything
    // deciding the mix is integer: per-source sqrt(chars) quantizes to
    // micro-units (sqrt and × are single correctly-rounded IEEE ops —
    // bit-identical per row cross-engine; floor makes them integers BEFORE
    // the order-sensitive sum), quotas are truncating integer division with
    // largest-remainder rounding on integer remainders, and doc selection
    // ranks by the shared md5 hash through ops.Cumulative's global
    // range-partitioned rank minus broadcast per-source offsets — no
    // per-source window over data-proportional rows anywhere in the plan.
    "u9_temperature_mix" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 24L
        val d = Tables.documents(s, dir)
        val sizes = d.groupBy("source")
          .agg(sum("n_chars").as("chars"), count(lit(1)).as("n_docs"))
          .withColumn("w",
            floor(sqrt(col("chars").cast("double")) * lit(1000000.0)).cast("long"))
        val tot = sizes.agg(sum("w").as("tw"))
        val shared = sizes.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"($budget * w) div tw"))
          .withColumn("rem", expr(s"($budget * w) % tw"))
        val residual = shared.agg((lit(budget) - sum("base")).as("extra"))
        // bounded post-agg frame (one row per source); non-foldable constant
        // key keeps the WindowExec partitioned (w13/w6 pattern)
        val one = coalesce(pmod(col("chars"), lit(1L)), lit(0L))
        val quotas = shared
          .withColumn("rr", row_number().over(
            Window.partitionBy(one).orderBy(desc("rem"), col("source"))))
          .crossJoin(broadcast(residual))
          .withColumn("quota",
            col("base") + when(col("rr") <= col("extra"), 1L).otherwise(0L))
          .select("source", "quota", "n_docs")
        val ranked = graft.ops.Cumulative.runningSum(
          d.withColumn("hk", graft.functions.TextFunctions.hash64(
            concat(lit("temp:"), col("doc_id").cast("string")))),
          Seq(col("source"), col("hk"), col("doc_id")), lit(1L), "grnk", "__gc")
        val offs = quotas
          .join(broadcast(quotas.select(col("source").as("bs"), col("n_docs").as("bn"))),
            col("bs") < col("source"), "left")
          .groupBy(col("source"), col("quota"))
          .agg(coalesce(sum("bn"), lit(0L)).as("off"))
        ranked.join(broadcast(offs), "source")
          .filter(col("grnk") - col("off") <= col("quota"))
          .groupBy("source", "quota")
          .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_kept"),
            sum("doc_id").as("kept_checksum"))
          .orderBy("source")
      },
      Some("""WITH sizes AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars,
             |    count(*) AS n_docs FROM documents GROUP BY 1),
             |wtd AS (SELECT source, n_docs,
             |    CAST(floor(sqrt(CAST(chars AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
             |  FROM sizes),
             |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM wtd),
             |shared AS (SELECT source, n_docs, (24 * w) // tw AS base,
             |    (24 * w) % tw AS rem FROM wtd CROSS JOIN tot),
             |resid AS (SELECT 24 - CAST(sum(base) AS BIGINT) AS extra FROM shared),
             |quotas AS (SELECT source, n_docs,
             |    base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
             |      <= extra THEN 1 ELSE 0 END AS quota
             |  FROM shared CROSS JOIN resid),
             |ranked AS (SELECT d.source, d.doc_id,
             |    row_number() OVER (PARTITION BY d.source ORDER BY
             |      CAST(('0x' || substr(md5('temp:' || d.doc_id), 1, 15)) AS BIGINT),
             |      d.doc_id) AS rn
             |  FROM documents d)
             |SELECT q.source, q.quota, count(*) AS n_kept, min(r.doc_id) AS first_kept,
             |  CAST(sum(r.doc_id) AS BIGINT) AS kept_checksum
             |FROM ranked r JOIN quotas q ON q.source = r.source AND r.rn <= q.quota
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // Engine-added — rendezvous (highest-random-weight) shard assignment:
    // every document scores each of the 8 shards with an independent hash
    // and lands on the argmax. THE deterministic way to shard 100 TB:
    // assignment is a pure per-row projection (no shuffle, no coordination,
    // stable under re-runs and repartitioning), and when a shard is
    // added/removed only ~1/n of keys move — against mod-n sharding where
    // nearly all do. The 8 scores are one codegen'd array over the shared
    // md5 hash; the argmax is array_position(array_max) — no explode, no
    // 8× row fanout. The only shuffle is the final bounded per-shard
    // rollup (map-side combined).
    "u10_rendezvous_shard" -> QueryDef(
      (s, dir) => {
        val nShards = 8
        val hs = array((0 until nShards).map(i =>
          graft.functions.TextFunctions.hash64(
            concat(lit(s"rv$i:"), col("doc_id").cast("string")))): _*)
        Tables.documents(s, dir)
          .withColumn("hs", hs)
          .withColumn("shard", (array_position(col("hs"), array_max(col("hs"))) - 1L)
            .cast("long"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
            sum("doc_id").as("doc_checksum"))
          .orderBy("shard")
      },
      Some {
        val hsql = (0 until 8).map(i =>
          s"CAST(('0x' || substr(md5('rv$i:' || doc_id), 1, 15)) AS BIGINT)")
        val arr = hsql.mkString("[", ", ", "]")
        s"""WITH h AS (SELECT doc_id, n_chars,
           |    list_position($arr, list_max($arr)) - 1 AS shard
           |  FROM documents)
           |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS chars,
           |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
           |  CAST(sum(doc_id) AS BIGINT) AS doc_checksum
           |FROM h GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Engine-added — deterministic negative sampling for recommender /
    // contrastive training: each purchasing customer gets k = 3 brands they
    // did NOT buy, picked by hash rank over the (customer, brand) pair —
    // reproducible across runs and engines (seeded RNG streams are not),
    // and shuffle-free per row like every sampling op here. Candidates are
    // customer × the TINY brand dim (broadcast nested-loop over 25 rows —
    // a literal-dim fanout, not a data×data cartesian), positives leave by
    // anti join, and the pick is a rank window PARTITIONED BY CUSTOMER
    // (≤ |brands| candidate rows each). Output: the 25-row per-brand
    // positive/negative exposure audit a sampler must pass before training.
    "u12_negative_sampling" -> QueryDef(
      (s, dir) => {
        // Shared-subtree cut (round-14, guide §2.4): `pos` feeds THREE
        // consumers below (the negatives anti-join, the distinct-customer
        // fanout, and the per-brand positive rollup) — left lazy, the
        // lineitem⋈orders⋈part chain executed three times (measured: u12
        // task time 3.9 s for 2.7 s wall, ~3× the one-pass cost). One
        // checkpointed pass, three cheap readers.
        val pos = graft.core.Materialize.cut(Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("o_custkey").as("cust"), col("p_brand").as("brand"))
          .distinct())
        val brands = Tables.part(s, dir).select(col("p_brand").as("brand")).distinct()
        val negs = pos.select("cust").distinct()
          .crossJoin(broadcast(brands))
          .join(pos, Seq("cust", "brand"), "left_anti")
          .withColumn("h", graft.functions.TextFunctions.hash64(
            concat(lit("neg:"), col("cust").cast("string"), lit(":"), col("brand"))))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("cust").orderBy(desc("h"), col("brand"))))
          .filter(col("rn") <= 3)
        val posAgg = pos.groupBy("brand").agg(count(lit(1)).as("n_pos"))
        val negAgg = negs.groupBy("brand")
          .agg(count(lit(1)).as("n_neg"), sum("cust").as("neg_checksum"))
        posAgg.join(negAgg, Seq("brand"), "full_outer")
          .select(col("brand"), coalesce(col("n_pos"), lit(0L)).as("n_pos"),
            coalesce(col("n_neg"), lit(0L)).as("n_neg"),
            coalesce(col("neg_checksum"), lit(0L)).as("neg_checksum"))
          .orderBy("brand")
      },
      Some("""WITH pos AS (SELECT DISTINCT o_custkey AS cust, p_brand AS brand
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN part ON l_partkey = p_partkey),
             |brands AS (SELECT DISTINCT p_brand AS brand FROM part),
             |cand AS (SELECT c.cust, b.brand
             |  FROM (SELECT DISTINCT cust FROM pos) c CROSS JOIN brands b),
             |neg0 AS (SELECT cand.cust, cand.brand,
             |    CAST(('0x' || substr(md5('neg:' || cand.cust || ':' || cand.brand),
             |      1, 15)) AS BIGINT) AS h
             |  FROM cand ANTI JOIN pos ON pos.cust = cand.cust AND pos.brand = cand.brand),
             |negs AS (SELECT cust, brand FROM neg0
             |  QUALIFY row_number() OVER (PARTITION BY cust ORDER BY h DESC, brand) <= 3),
             |pa AS (SELECT brand, count(*) AS n_pos FROM pos GROUP BY 1),
             |na AS (SELECT brand, count(*) AS n_neg, CAST(sum(cust) AS BIGINT)
             |    AS neg_checksum FROM negs GROUP BY 1)
             |SELECT coalesce(pa.brand, na.brand) AS brand,
             |  coalesce(n_pos, 0) AS n_pos, coalesce(n_neg, 0) AS n_neg,
             |  coalesce(neg_checksum, 0) AS neg_checksum
             |FROM pa FULL JOIN na ON pa.brand = na.brand
             |ORDER BY 1""".stripMargin))
  )
}
