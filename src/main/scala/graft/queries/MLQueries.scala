package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML / spatial-statistics operators (SURVEY.md §2.9) that reduce to
  * relational programs: kNN-distance elbow (M2), Voronoi-by-nearest-center
  * (M5), standardization (M6), lexicon sentiment (M7), 2-D Gaussian KDE (M9),
  * local Moran's I / LISA (M10), closed-form linear regression (M11),
  * regression metrics (M13), holiday semi-join (M20), bias-audit composite
  * (M21). Iterative algorithms (DBSCAN, K-Means, GBT) live in graft.ml.
  */
object MLQueries extends QueryCatalog {

  /** k=5 neighbor list over the synthetic customer points, parquet-staged
    * once per (application, dir) — m10 and m10b consume the identical frame,
    * so the grid kNN runs once, not once per query (ops.Staged). */
  private def custKnn5(s: SparkSession, dir: String) =
    graft.ops.Staged(s, s"custknn5:$dir") {
      graft.ml.Knn.neighborsAuto(
        Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
          .select(col("c_custkey").as("id"), col("lon").as("x"), col("lat").as("y")),
        k = 5)
    }

  /** LISA permutation p-values at any rep count (m10b runs the oracle-checked
    * 49; `reps = 999` reproduces the reference esda default,
    * 实习四/…yelp_analysis.ipynb:5995 — LisaPermutationSpec pins quadrant
    * stability between the two). The null distribution comes from
    * DETERMINISTIC block-local permutations — rep r reorders z values within
    * id-mod-64 blocks by an affine bijection mod a Mersenne prime — so every
    * permuted draw is reproducible cross-engine; neighbor sums fold over
    * SORTED lists (bit-identical FP order). Every rank window is PARTITIONED
    * by (rep, block), so no global sort appears at any rep count; work
    * scales linearly in `reps` (the rep axis is a crossJoin fan-out that
    * parallelizes across the cluster). */
  private[graft] def lisaPvalues(s: SparkSession, dir: String, reps: Int) = {
    val R = reps
    val pts = Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
      .select(col("c_custkey").as("id"), col("lon"), col("lat"), col("c_acctbal").as("x"))
    val stats = pts.agg(avg("x").as("m"), stddev_samp(col("x")).as("sd"))
    val z = pts.crossJoin(stats).withColumn("z", (col("x") - col("m")) / col("sd"))
      .select("id", "lon", "lat", "z")
    val nbrs = custKnn5(s, dir).select("aid", "bid")
    // Sorted-then-sequential sum: deterministic FP order cross-engine
    // (matches DuckDB list_sum(list_sort(...))). The sum itself is the
    // native loop — the HOF fold ran interpreted once per (point, rep)
    // group, which dominated this query's wall-clock.
    def sortedAvg(c: org.apache.spark.sql.Column) =
      graft.functions.SortedSumD.sortedSum(c) / count(lit(1))
    val obs = nbrs.join(z.select(col("id").as("bid"), col("z").as("bz")), "bid")
      .groupBy(col("aid").as("id"))
      .agg(sortedAvg(col("bz")).as("lag_obs"))
      .join(z.select("id", "z"), "id")
      .withColumn("i_obs", col("z") * col("lag_obs"))
    val B = 64L
    val posById = z.select("id", "z")
      .withColumn("blk", pmod(col("id"), lit(B)))
      .withColumn("pos", row_number().over(Window.partitionBy("blk").orderBy("id")))
    val repsDf = s.range(0, R).toDF("r")
    // Permutation key from the arithmetic universal-hash family (an
    // affine bijection mod the Mersenne prime per rep) — one md5 per
    // (id, rep) measured as this stage's dominant cost, and the digest
    // buys nothing over a bijective scramble here.
    val hp = lit(graft.functions.TextFunctions.HashP)
    val hashed = z.select("id")
      .withColumn("blk", pmod(col("id"), lit(B)))
      .crossJoin(repsDf)
      .withColumn("hk", pmod(
        pmod(col("id"), hp) * (col("r") * 2 + 3) + (col("r") * 12345L + 67891L), hp))
      .withColumn("pos", row_number().over(
        Window.partitionBy("r", "blk").orderBy(col("hk"), col("id"))))
    val permz = hashed
      .join(posById.select(col("blk"), col("pos"), col("z").as("pz")), Seq("blk", "pos"))
      .select(col("r"), col("id").as("bid"), col("pz"))
    val permLag = nbrs.join(permz, "bid")
      .groupBy(col("aid").as("id"), col("r"))
      .agg(sortedAvg(col("pz")).as("lag_r"))
    val iR = permLag.join(obs.select("id", "z", "i_obs"), "id")
      .withColumn("i_r", col("z") * col("lag_r"))
    val pvals = iR.groupBy("id")
      .agg(sum(when((col("i_obs") >= 0 && col("i_r") >= col("i_obs"))
        || (col("i_obs") < 0 && col("i_r") <= col("i_obs")), 1L)
        .otherwise(0L)).as("cnt"))
      .withColumn("p", (col("cnt") + lit(1)).cast("double") / lit((R + 1).toDouble))
    obs.join(pvals, "id")
      .withColumn("quad", when(col("z") > 0 && col("lag_obs") > 0, "HH")
        .when(col("z") <= 0 && col("lag_obs") <= 0, "LL")
        .when(col("z") <= 0, "LH").otherwise("HL"))
      .groupBy("quad")
      .agg(count(lit(1)).as("n"),
        sum(when(col("p") <= 0.05, 1L).otherwise(0L)).as("n_sig"),
        round(avg("p"), 6).as("avg_p"))
      .orderBy("quad")
  }

  def defs: Map[String, QueryDef] = Map(

    // M2 — kNN-distance elbow for eps selection (reference test.py:69-146):
    // distance to the 4th nearest neighbor per point, curve sorted desc,
    // elbow candidates = largest central-difference gradient. Exact pairwise
    // here (oracle parity); the production path is the grid-bucketed kNN in
    // graft.ml (cell-neighborhood join, exact when cell ≥ max k-dist).
    "m2_knn_elbow" -> QueryDef(
      (s, dir) => {
        val pts = Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
          .select(col("c_custkey").as("id"), col("lon").as("x"), col("lat").as("y"))
        // Auto-sized grid cell (Knn.autoCellSize): the hand-picked 0.02 sat
        // exactly at the E[locations per cell] ≈ k failure boundary GEOSCALE
        // measured (15% ring-1 failures, 45% fallback at one density).
        val kdist = graft.ml.Knn.neighborsAuto(pts, k = 4,
            calibrationKey = Some(s"m2:$dir"))
          .filter(col("rn") === 4)
          .select(col("aid").as("id"), round(sqrt(col("d2")), 10).as("kdist"))
        // Curve position via the distributed prefix helper (per-point rows are
        // data-proportional — a global row_number window would single-task the
        // whole curve), then lag/lead reconstructed as equi-joins on adjacent
        // positions: shuffles on idx, never a global sort.
        val curve = graft.ops.Cumulative.runningSum(
            kdist, Seq(col("kdist").desc, col("id")), lit(1L), "idx", "__c")
          .select("idx", "kdist")
        curve
          .join(curve.select((col("idx") + 1).as("idx"), col("kdist").as("pv")), "idx")
          .join(curve.select((col("idx") - 1).as("idx"), col("kdist").as("nv")), "idx")
          .withColumn("grad", (col("pv") - col("nv")) / 2.0)
          .select(col("idx"), round(col("kdist"), 8).as("kdist"), round(col("grad"), 8).as("grad"))
          .orderBy(desc("grad"), col("idx")).limit(5)
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        s"""WITH pts AS (SELECT c_custkey AS id, $lonSql AS lon, $latSql AS lat FROM customer),
           |pairs AS (SELECT a.id, sqrt(power(a.lon-b.lon, 2) + power(a.lat-b.lat, 2)) AS d
           |  FROM pts a JOIN pts b ON a.id <> b.id),
           |kdist AS (SELECT id, round(d, 10) AS kdist FROM pairs
           |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY d) = 4),
           |curve AS (SELECT id, kdist,
           |    row_number() OVER (ORDER BY kdist DESC, id) AS idx FROM kdist),
           |g AS (SELECT idx, kdist,
           |    (lag(kdist, 1) OVER (ORDER BY idx) - lead(kdist, 1) OVER (ORDER BY idx)) / 2.0 AS grad
           |  FROM curve)
           |SELECT idx, round(kdist, 8) AS kdist, round(grad, 8) AS grad
           |FROM g WHERE grad IS NOT NULL
           |ORDER BY grad DESC, idx LIMIT 5""".stripMargin
      },
      // Headline (round-15, VERDICT r14 item 2): compute-proportional
      // scaling signal for the driver's 8↔32-core probe (~25 s task time
      // at sf0.1 — the grid-kNN candidate windows).
      headline = true),

    // M5 — Voronoi tessellation by nearest center (reference
    // 实习二/…ipynb:608-625): nearest-center assignment ≡ Voronoi membership,
    // so no polygon geometry is needed. 15 deterministic centers broadcast.
    "m5_voronoi_zones" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val centers = (0 until 15).map(c =>
          (c.toLong, -74.3 + (c * 37 % 60) / 100.0, 40.5 + (c * 23 % 50) / 100.0))
          .toDF("center_id", "clon", "clat")
        val pts = Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
        val w = Window.partitionBy("c_custkey").orderBy(col("d2"), col("center_id"))
        pts.crossJoin(broadcast(centers))
          .withColumn("d2", pow(col("lon") - col("clon"), 2) + pow(col("lat") - col("clat"), 2))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy("center_id")
          .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 4).as("avg_bal"))
          .orderBy("center_id")
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        val centers = (0 until 15).map(c =>
          s"($c, ${-74.3 + (c * 37 % 60) / 100.0}, ${40.5 + (c * 23 % 50) / 100.0})").mkString(", ")
        s"""WITH pts AS (SELECT c_custkey, c_acctbal, $lonSql AS lon, $latSql AS lat FROM customer),
           |centers(center_id, clon, clat) AS (VALUES $centers),
           |assigned AS (SELECT c_custkey, c_acctbal, center_id FROM pts CROSS JOIN centers
           |  QUALIFY row_number() OVER (PARTITION BY c_custkey
           |    ORDER BY power(lon-clon, 2) + power(lat-clat, 2), center_id) = 1)
           |SELECT center_id, count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
           |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // M6 — standardization (reference StandardScaler, 实习四/…ipynb:1545-1547):
    // global mean/sd broadcast back, z-score histogram by integer bucket.
    "m6_standardize" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val stats = li.agg(avg("l_extendedprice").as("m"), stddev_samp(col("l_extendedprice")).as("sd"))
        li.crossJoin(stats)
          .withColumn("z", (col("l_extendedprice") - col("m")) / col("sd"))
          .groupBy(floor(col("z")).as("z_bucket"))
          .agg(count(lit(1)).as("n"), round(avg("z"), 6).as("avg_z"))
          .orderBy("z_bucket")
      },
      Some("""SELECT CAST(floor((l_extendedprice - m) / sd) AS BIGINT) AS z_bucket, count(*) AS n,
             |  round(avg((l_extendedprice - m) / sd), 6) AS avg_z
             |FROM lineitem,
             |  (SELECT avg(l_extendedprice) m, stddev_samp(l_extendedprice) sd FROM lineitem)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // M7 — lexicon sentiment scoring (reference TextBlob polarity + ±0.1
    // categorize, 实习四/…ipynb:789-856): token ⋈ broadcast lexicon → mean
    // polarity per doc → 3-way category → per-lang profile. The lexicon is
    // the REAL shipped wordlist (sources.Lexicon — ~1,100 AFINN-scale
    // English words normalized to [-1,1]) plus the 12-token engine-domain
    // overlay that covers the synthetic corpus vocabulary.
    "m7_sentiment" -> QueryDef(
      (s, dir) => {
        val lexicon = graft.sources.Lexicon.scoring(s)
        val docTok = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
        docTok.join(broadcast(lexicon), Seq("tok"), "left")
          .groupBy("doc_id", "lang")
          .agg(round(avg("score"), 6).as("polarity"))
        match { case perDoc =>
          perDoc
            .withColumn("cat",
              when(col("polarity").isNull, "no_signal")
                .when(col("polarity") > 0.1, "positive")
                .when(col("polarity") >= -0.1, "neutral")
                .otherwise("negative"))
            .groupBy("lang", "cat")
            .agg(count(lit(1)).as("n"), round(avg("polarity"), 6).as("avg_pol"))
            .orderBy("lang", "cat")
        }
      },
      Some(s"""WITH ${graft.sources.Lexicon.scoringSql},
             |dt AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
             |       FROM documents),
             |perdoc AS (SELECT doc_id, lang, round(avg(score), 6) AS polarity
             |  FROM dt LEFT JOIN lex USING (tok) GROUP BY 1, 2),
             |cats AS (SELECT lang, polarity,
             |    CASE WHEN polarity IS NULL THEN 'no_signal'
             |      WHEN polarity > 0.1 THEN 'positive'
             |      WHEN polarity >= -0.1 THEN 'neutral'
             |      ELSE 'negative' END AS cat
             |  FROM perdoc)
             |SELECT lang, cat, count(*) AS n, round(avg(polarity), 6) AS avg_pol
             |FROM cats GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      headline = true),

    // M7b — the reference's FIVE-way categorize (±0.1/±0.5 thresholds,
    // 实习四/…ipynb:835-856) plus a lexicon-based subjectivity measure
    // (TextBlob emits polarity AND subjectivity; the standard lexicon proxy
    // is the scored-token fraction per doc). Same broadcast lexicon join as
    // m7; per-category counts + mean subjectivity.
    "m7b_sentiment_5way" -> QueryDef(
      (s, dir) => {
        val lexicon = graft.sources.Lexicon.scoring(s)
        val docTok = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val perDoc = docTok.join(broadcast(lexicon), Seq("tok"), "left")
          .groupBy("doc_id")
          .agg(round(avg("score"), 6).as("polarity"),
            round(sum(when(col("score").isNotNull, 1.0).otherwise(0.0)) /
              count(lit(1)), 6).as("subjectivity"))
        perDoc
          .withColumn("cat",
            when(col("polarity").isNull, "no_signal")
              .when(col("polarity") > 0.5, "very_positive")
              .when(col("polarity") > 0.1, "positive")
              .when(col("polarity") >= -0.1, "neutral")
              .when(col("polarity") >= -0.5, "negative")
              .otherwise("very_negative"))
          .groupBy("cat")
          .agg(count(lit(1)).as("n"),
            round(avg("polarity"), 6).as("avg_pol"),
            round(avg("subjectivity"), 6).as("avg_subj"))
          .orderBy("cat")
      },
      Some(s"""WITH ${graft.sources.Lexicon.scoringSql},
             |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |       FROM documents),
             |perdoc AS (SELECT doc_id, round(avg(score), 6) AS polarity,
             |    round(sum(CASE WHEN score IS NOT NULL THEN 1.0 ELSE 0.0 END)
             |      / count(*), 6) AS subjectivity
             |  FROM dt LEFT JOIN lex USING (tok) GROUP BY 1),
             |cats AS (SELECT polarity, subjectivity,
             |    CASE WHEN polarity IS NULL THEN 'no_signal'
             |      WHEN polarity > 0.5 THEN 'very_positive'
             |      WHEN polarity > 0.1 THEN 'positive'
             |      WHEN polarity >= -0.1 THEN 'neutral'
             |      WHEN polarity >= -0.5 THEN 'negative'
             |      ELSE 'very_negative' END AS cat
             |  FROM perdoc)
             |SELECT cat, count(*) AS n, round(avg(polarity), 6) AS avg_pol,
             |  round(avg(subjectivity), 6) AS avg_subj
             |FROM cats GROUP BY 1 ORDER BY 1""".stripMargin)),

    // M9 — 2-D Gaussian KDE on a fixed evaluation grid (reference
    // gaussian_kde over 100×100, 实习四/…ipynb:1580-1599; bandwidth h=0.05):
    // grid ⨯ points kernel sum. Grid side is tiny and broadcast; the sum
    // shuffles only 80 cells.
    "m9_kde_grid" -> QueryDef(
      (s, dir) => {
        val grid = s.range(0, 10).select(col("id").as("gx"))
          .crossJoin(s.range(0, 8).select(col("id").as("gy")))
          .withColumn("glon", lit(-74.3) + col("gx") * lit(0.06) + lit(0.03))
          .withColumn("glat", lit(40.5) + col("gy") * lit(0.0625) + lit(0.03125))
        val pts = Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
        pts.crossJoin(broadcast(grid))
          .withColumn("kern",
            exp((pow(col("lon") - col("glon"), 2) + pow(col("lat") - col("glat"), 2)) / lit(-2 * 0.05 * 0.05)))
          .groupBy("gx", "gy")
          .agg(round(sum("kern"), 4).as("density"))
          .orderBy("gx", "gy")
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        s"""WITH pts AS (SELECT $lonSql AS lon, $latSql AS lat FROM customer),
           |grid AS (SELECT gx.range AS gx, gy.range AS gy,
           |    -74.3 + gx.range * 0.06 + 0.03 AS glon,
           |    40.5 + gy.range * 0.0625 + 0.03125 AS glat
           |  FROM range(0, 10) gx, range(0, 8) gy)
           |SELECT gx, gy,
           |  round(sum(exp((power(lon-glon, 2) + power(lat-glat, 2)) / (-2 * 0.05 * 0.05))), 4) AS density
           |FROM pts CROSS JOIN grid GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // M10 — local Moran's I / LISA (reference KNN k=5 row-standardized
    // weights + quadrants, 实习四/…ipynb:5960-6030): z-scores, 5-NN spatial
    // lag, Iᵢ = zᵢ·lagᵢ, HH/LL/LH/HL at the mean. Analytic form only — the
    // reference's 999-permutation p-values are a seeded-RNG loop that can't
    // be oracle-matched; documented approximation.
    "m10_lisa" -> QueryDef(
      (s, dir) => {
        val pts = Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
          .select(col("c_custkey").as("id"), col("lon"), col("lat"), col("c_acctbal").as("x"))
        val stats = pts.agg(avg("x").as("m"), stddev_samp(col("x")).as("sd"))
        val z = pts.crossJoin(stats).withColumn("z", (col("x") - col("m")) / col("sd"))
          .select("id", "lon", "lat", "z")
        val nbrs = custKnn5(s, dir)
        val nn = nbrs
          .join(z.select(col("id").as("aid"), col("z")), "aid")
          .join(z.select(col("id").as("bid"), col("z").as("bz")), "bid")
          .groupBy(col("aid").as("id"))
          .agg(first(col("z")).as("z"), avg(col("bz")).as("lag_z"))
        nn.withColumn("moran_i", round(col("z") * col("lag_z"), 6))
          .withColumn("quad",
            when(col("z") > 0 && col("lag_z") > 0, "HH")
              .when(col("z") <= 0 && col("lag_z") <= 0, "LL")
              .when(col("z") <= 0, "LH").otherwise("HL"))
          .groupBy("quad")
          .agg(count(lit(1)).as("n"), round(avg("moran_i"), 6).as("avg_i"))
          .orderBy("quad")
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        s"""WITH pts AS (SELECT c_custkey AS id, $lonSql AS lon, $latSql AS lat,
           |    c_acctbal AS x FROM customer),
           |st AS (SELECT avg(x) m, stddev_samp(x) sd FROM pts),
           |z AS (SELECT id, lon, lat, (x - m) / sd AS z FROM pts, st),
           |nn AS (SELECT a.id, a.z, b.z AS bz FROM z a JOIN z b ON a.id <> b.id
           |  QUALIFY row_number() OVER (PARTITION BY a.id
           |    ORDER BY power(a.lon-b.lon, 2) + power(a.lat-b.lat, 2), b.id) <= 5),
           |lagd AS (SELECT id, any_value(z) AS z, avg(bz) AS lag_z FROM nn GROUP BY id),
           |quads AS (SELECT round(z * lag_z, 6) AS moran_i,
           |    CASE WHEN z > 0 AND lag_z > 0 THEN 'HH'
           |      WHEN z <= 0 AND lag_z <= 0 THEN 'LL'
           |      WHEN z <= 0 THEN 'LH' ELSE 'HL' END AS quad
           |  FROM lagd)
           |SELECT quad, count(*) AS n, round(avg(moran_i), 6) AS avg_i
           |FROM quads GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // M10b — LISA permutation p-values (reference esda 999-permutation
    // significance, 实习四/…yelp_analysis.ipynb:5995-6016). The reference's
    // seeded-RNG loop is engine-specific; here the null distribution comes
    // from DETERMINISTIC md5-hash permutations — rep r reorders the z values
    // by ranking ids on hash64(r:id) and pairing that rank with the id-order
    // rank — so a SQL oracle reproduces every permuted draw exactly.
    // 49 reps ⇒ p ∈ {0.02,…,1}; p = (1 + #{I_r at least as extreme})/50.
    // Neighbor sums fold over SORTED value lists (bit-identical cross-engine
    // — group-order avg would flip >= comparisons on ulp differences).
    // Permutations are BLOCK-LOCAL: ids are bucketed by id mod 64 and each
    // rep permutes z values within its bucket only, so every rank window is
    // PARTITIONED (bounded by block size) — no global sort per rep. Since ids
    // are arbitrary labels, the blocks are exchangeable subsets and the
    // restricted permutation preserves the spatial-randomness null (standard
    // restricted-permutation inference); blocks stay deterministic and
    // SQL-expressible, so the oracle reproduces every permuted draw exactly.
    "m10b_lisa_pvalues" -> QueryDef(
      (s, dir) => lisaPvalues(s, dir, reps = 49),
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        s"""WITH pts AS (SELECT c_custkey AS id, $lonSql AS lon, $latSql AS lat,
           |    c_acctbal AS x FROM customer),
           |st AS (SELECT avg(x) m, stddev_samp(x) sd FROM pts),
           |z AS (SELECT id, lon, lat, (x - m) / sd AS z FROM pts, st),
           |nn AS (SELECT a.id AS aid, b.id AS bid, b.z AS bz
           |  FROM z a JOIN z b ON a.id <> b.id
           |  QUALIFY row_number() OVER (PARTITION BY a.id
           |    ORDER BY power(a.lon-b.lon, 2) + power(a.lat-b.lat, 2), b.id) <= 5),
           |obs AS (SELECT aid AS id, list_sum(list_sort(list(bz))) / count(*) AS lag_obs
           |  FROM nn GROUP BY 1),
           |obsz AS (SELECT o.id, z.z, o.lag_obs, z.z * o.lag_obs AS i_obs
           |  FROM obs o JOIN z USING (id)),
           |pos_by_id AS (SELECT id, z, id % 64 AS blk,
           |    row_number() OVER (PARTITION BY id % 64 ORDER BY id) AS pos FROM z),
           |hashed AS (SELECT z.id, t.r, z.id % 64 AS blk,
           |    row_number() OVER (PARTITION BY t.r, z.id % 64 ORDER BY
           |      ((z.id % 2147483647) * (t.r * 2 + 3) + (t.r * 12345 + 67891))
           |        % 2147483647, z.id) AS pos
           |  FROM z, generate_series(0, 48) t(r)),
           |permz AS (SELECT h.r, h.id AS bid, p.z AS pz
           |  FROM hashed h JOIN pos_by_id p USING (blk, pos)),
           |permlag AS (SELECT nn.aid AS id, pz.r,
           |    list_sum(list_sort(list(pz.pz))) / count(*) AS lag_r
           |  FROM nn JOIN permz pz USING (bid) GROUP BY 1, 2),
           |ir AS (SELECT pl.id, pl.r, oz.i_obs, oz.z * pl.lag_r AS i_r
           |  FROM permlag pl JOIN obsz oz USING (id)),
           |pv AS (SELECT id, (1 + sum(CASE WHEN (i_obs >= 0 AND i_r >= i_obs)
           |      OR (i_obs < 0 AND i_r <= i_obs) THEN 1 ELSE 0 END)) / 50.0 AS p
           |  FROM ir GROUP BY 1),
           |quads AS (SELECT oz.id,
           |    CASE WHEN z > 0 AND lag_obs > 0 THEN 'HH'
           |      WHEN z <= 0 AND lag_obs <= 0 THEN 'LL'
           |      WHEN z <= 0 THEN 'LH' ELSE 'HL' END AS quad, p
           |  FROM obsz oz JOIN pv USING (id))
           |SELECT quad, count(*) AS n,
           |  CAST(sum(CASE WHEN p <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_sig,
           |  round(avg(p), 6) AS avg_p
           |FROM quads GROUP BY 1 ORDER BY 1""".stripMargin
      },
      // Headline (round-15, VERDICT r14 item 2): compute-proportional
      // scaling signal for the driver's 8↔32-core probe (~12 s task time
      // at sf0.1 — the 49-permutation LISA fan-out).
      headline = true),

    // M11 — one-variable linear regression, closed form (reference
    // stats.linregress stars↔sentiment, 实习四/…ipynb:1155-1170):
    // slope = cov/var, intercept, r, r².
    "m11_linregress" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .agg(
          covar_samp(col("l_quantity"), col("l_extendedprice")).as("cov"),
          var_samp(col("l_quantity")).as("vx"),
          avg("l_quantity").as("mx"), avg("l_extendedprice").as("my"),
          corr(col("l_quantity"), col("l_extendedprice")).as("r"))
        .select(
          round(col("cov") / col("vx"), 6).as("slope"),
          round(col("my") - col("cov") / col("vx") * col("mx"), 4).as("intercept"),
          round(col("r"), 6).as("r"),
          round(col("r") * col("r"), 6).as("r2")),
      Some("""SELECT round(covar_samp(l_quantity, l_extendedprice) / var_samp(l_quantity), 6) AS slope,
             |  round(avg(l_extendedprice) - covar_samp(l_quantity, l_extendedprice)
             |    / var_samp(l_quantity) * avg(l_quantity), 4) AS intercept,
             |  round(corr(l_quantity, l_extendedprice), 6) AS r,
             |  round(corr(l_quantity, l_extendedprice) * corr(l_quantity, l_extendedprice), 6) AS r2
             |FROM lineitem""".stripMargin)),

    // M13 — regression metric battery (reference RMSLE/MAE/RMSE/R²/rel-err,
    // 实习二/…ipynb:906-911, :8238-8262) for a deterministic linear "model"
    // ŷ = 105·quantity (metrics are aggregates — no model state needed).
    "m13_reg_metrics" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .withColumn("yhat", col("l_quantity") * lit(105.0))
        .withColumn("err", col("yhat") - col("l_extendedprice"))
        .agg(
          round(avg(abs(col("err"))), 4).as("mae"),
          round(sqrt(avg(col("err") * col("err"))), 4).as("rmse"),
          round(sqrt(avg(pow(log1p(col("yhat")) - log1p(col("l_extendedprice")), 2))), 6).as("rmsle"),
          // SST via var_samp·(n−1) keeps r² a single aggregate pass.
          round(lit(1.0) - sum(col("err") * col("err")) /
            (var_samp(col("l_extendedprice")) * (count(lit(1)) - 1)), 6).as("r2"),
          round(avg(abs(col("err")) / col("l_extendedprice")), 6).as("mean_rel_err")),
      Some("""WITH d AS (SELECT l_extendedprice AS y, l_quantity * 105.0 AS yhat,
             |    l_quantity * 105.0 - l_extendedprice AS err
             |  FROM lineitem)
             |SELECT round(avg(abs(err)), 4) AS mae,
             |  round(sqrt(avg(err * err)), 4) AS rmse,
             |  round(sqrt(avg(power(ln(1 + yhat) - ln(1 + y), 2))), 6) AS rmsle,
             |  round(1.0 - sum(err * err) / (var_samp(y) * (count(*) - 1)), 6) AS r2,
             |  round(avg(abs(err) / y), 6) AS mean_rel_err
             |FROM d""".stripMargin)),

    // M20 — holiday-calendar semi-join feature (reference is_rest = date ∈
    // holidays, 实习二/…ipynb:120-124, 344): broadcast literal date list.
    "m20_holiday_flag" -> QueryDef(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("is_rest",
          to_date(col("o_orderdate")).isin("1995-01-01", "1995-07-04", "1995-12-25",
            "1996-01-01", "1996-07-04", "1996-12-25").cast("int"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("is_rest").as("n_holiday"),
          round(avg(col("is_rest").cast("double")), 6).as("holiday_rate"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) IN
             |    ('1995-01-01', '1995-07-04', '1995-12-25',
             |     '1996-01-01', '1996-07-04', '1996-12-25') THEN 1 ELSE 0 END) AS BIGINT) AS n_holiday,
             |  round(avg(CASE WHEN CAST(o_orderdate AS DATE) IN
             |    ('1995-01-01', '1995-07-04', '1995-12-25',
             |     '1996-01-01', '1996-07-04', '1996-12-25') THEN 1.0 ELSE 0.0 END), 6) AS holiday_rate
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // M21 — data-bias audit composite (reference analyze_data_bias.py:417-479):
    // missing rate + user concentration + coverage + value balance folded
    // into one 0–10 score. Each signal is a scalar aggregate; the composite
    // is a cross join of 1-row sides.
    "m21_bias_audit" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val conc = {
          // Rank via the distributed prefix helper — per-user rows are
          // data-proportional, so a global row_number window here would be
          // the same single-task scale-killer fixed in a11/a12.
          val totals = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
          val ranked = graft.ops.Cumulative.runningSum(
            totals, Seq(col("cnt").desc, col("user_id")), lit(1L), "rnk", "__c")
          ranked.crossJoin(totals.agg(sum("cnt").as("total_ev"), count(lit(1)).as("n_users")))
            .filter(col("rnk") <= col("n_users") / 5)
            .agg((sum("cnt") / first("total_ev")).as("top20_share"))
        }
        val cover = Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_uncovered"))
          .crossJoin(Tables.customer(s, dir).agg(count(lit(1)).as("n_cust")))
          .select((lit(1.0) - col("n_uncovered") / col("n_cust")).as("coverage"))
        val balance = ev.agg(
          (sum(when(col("value") > 100, 1.0).otherwise(0.0)) / count(lit(1))).as("high_share"))
        // Geo dispersion σ (reference analyze_data_bias.py:377-385): spread
        // of the point cloud as √(var lon + var lat).
        val disp = Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
          .agg(sqrt(var_samp(col("lon")) + var_samp(col("lat"))).as("geo_sigma"))
        conc.crossJoin(cover).crossJoin(balance).crossJoin(disp)
          .select(
            round(col("top20_share"), 6).as("top20_share"),
            round(col("coverage"), 6).as("coverage"),
            round(col("high_share"), 6).as("high_share"),
            round(col("geo_sigma"), 6).as("geo_sigma"),
            round(lit(10.0) * (lit(1.0)
              - (col("top20_share") - lit(0.2)) * lit(0.5)
              - (lit(1.0) - col("coverage")) * lit(2.0)
              - abs(col("high_share") - lit(0.5))), 4).as("bias_score"))
      },
      Some(s"""WITH t AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
             |g AS (SELECT sum(cnt) AS total_ev, count(*) AS n_users FROM t),
             |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, user_id) AS rnk FROM t),
             |conc AS (SELECT sum(cnt) * 1.0 / max(g.total_ev) AS top20_share
             |  FROM r, g WHERE rnk <= g.n_users / 5),
             |cover AS (SELECT 1.0 - (SELECT count(*) FROM customer
             |    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) * 1.0
             |    / (SELECT count(*) FROM customer) AS coverage),
             |bal AS (SELECT sum(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END) / count(*) AS high_share
             |  FROM events),
             |disp AS (SELECT sqrt(var_samp(lon) + var_samp(lat)) AS geo_sigma FROM
             |  (SELECT ${Tables.syntheticPointSql("c_custkey")._1} AS lon,
             |          ${Tables.syntheticPointSql("c_custkey")._2} AS lat FROM customer))
             |SELECT round(top20_share, 6) AS top20_share,
             |  round(coverage, 6) AS coverage,
             |  round(high_share, 6) AS high_share,
             |  round(geo_sigma, 6) AS geo_sigma,
             |  round(10.0 * (1.0 - (top20_share - 0.2) * 0.5
             |    - (1.0 - coverage) * 2.0 - abs(high_share - 0.5)), 4) AS bias_score
             |FROM conc, cover, bal, disp""".stripMargin)),

    // Engine-added — EXACT two-sample Kolmogorov–Smirnov drift statistic
    // between the value distributions of two event cohorts (the data-drift
    // check a training pipeline runs between ingestion shards before mixing
    // them). Values bin to a FIXED literal grid (floor(value/5), capped at
    // 99) so the per-cohort histograms are bounded ≤ 100 rows no matter the
    // data volume: one map-side-combined shuffle builds them, and the ECDF
    // cumulative runs over that bounded frame (constant-key window — never
    // a global window over data-proportional rows). D's comparison is the
    // integer cross-product |cumA·nB − cumB·nA| — no division until the one
    // reported value — so the argmax is exact and the tie-break (smaller
    // bin) is deterministic cross-engine.
    "m23_ks_drift" -> QueryDef(
      (s, dir) => {
        val binned = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .withColumn("bin", least(floor(col("value") / lit(5.0)).cast("int"), lit(99)))
          .groupBy("bin")
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ca"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cb"))
        // ≤ 100 bins post-agg: the non-foldable constant key keeps WindowExec
        // partitioned (lit(0) would fold away — see w13/w6).
        val one = coalesce(pmod(col("bin"), lit(1)), lit(0))
        val wCum = Window.partitionBy(one).orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(one)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        binned
          .withColumn("cuma", sum("ca").over(wCum))
          .withColumn("cumb", sum("cb").over(wCum))
          .withColumn("na", sum("ca").over(wAll))
          .withColumn("nb", sum("cb").over(wAll))
          .withColumn("dnum", abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .orderBy(desc("dnum"), col("bin"))
          .limit(1)
          .select(col("bin").as("at_bin"), col("na").as("n_click"),
            col("nb").as("n_purchase"),
            round(col("dnum").cast("double")
              / (col("na") * col("nb")).cast("double"), 6).as("ks_d"))
      },
      Some("""WITH e AS (SELECT event_type,
             |    least(CAST(floor(value / 5.0) AS INT), 99) AS bin
             |  FROM events WHERE event_type IN ('click', 'purchase')),
             |b AS (SELECT bin,
             |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM e GROUP BY 1),
             |c AS (SELECT bin,
             |    CAST(sum(ca) OVER (ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
             |    CAST(sum(cb) OVER (ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb,
             |    CAST(sum(ca) OVER () AS BIGINT) AS na,
             |    CAST(sum(cb) OVER () AS BIGINT) AS nb
             |  FROM b)
             |SELECT bin AS at_bin, na AS n_click, nb AS n_purchase,
             |  round(CAST(abs(cuma * nb - cumb * na) AS DOUBLE)
             |    / CAST(na * nb AS DOUBLE), 6) AS ks_d
             |FROM c ORDER BY abs(cuma * nb - cumb * na) DESC, bin LIMIT 1""".stripMargin)),

    // Engine-added — Benford first-digit audit of order totals: the classic
    // fabricated-data / corruption screen (does the leading-digit
    // distribution follow log10(1+1/d)?), here as a data-quality diagnostic
    // over ingested monetary columns. The leading digit comes from the
    // INTEGER cents string — never floor(log10(x)), whose libm boundary at
    // powers of ten could misclassify a digit. Expected probabilities are
    // shared literal doubles (Double.toString round-trips exactly, so both
    // engines parse the identical IEEE value), and each chi-square term is
    // a pure-IEEE chain (−, ×, /) on identical inputs — bit-identical
    // cross-engine. Scale: one map-side-combined 9-group aggregate; the
    // digit frame and total ride broadcast.
    "m24_benford" -> {
      val pStr = (1 to 9).map(d => math.log10(1 + 1.0 / d).toString)
      QueryDef(
        (s, dir) => {
          val obs = Tables.orders(s, dir)
            .select(substring(round(col("o_totalprice") * 100).cast("long")
              .cast("string"), 1, 1).cast("int").as("digit"))
            .groupBy("digit").agg(count(lit(1)).as("n_obs"))
          val tot = obs.agg(sum("n_obs").as("n"))
          val pArr = array(pStr.map(p => lit(p.toDouble)): _*)
          val digits = s.range(1, 10).select(col("id").cast("int").as("digit"))
          val dlt = col("n_obs").cast("double") - col("n") * col("p")
          digits.join(obs, Seq("digit"), "left")
            .na.fill(0L, Seq("n_obs"))
            .crossJoin(broadcast(tot))
            .withColumn("p", element_at(pArr, col("digit")))
            .select(col("digit"), col("n_obs"),
              round(col("n") * col("p"), 4).as("expected"),
              round(dlt * dlt / (col("n") * col("p")), 6).as("chi2_term"))
            .orderBy("digit")
        },
        Some {
          // DuckDB types bare decimal literals as DECIMAL — cast each to
          // DOUBLE or the whole chi-square chain runs in decimal arithmetic.
          val arr = pStr.map(p => s"CAST($p AS DOUBLE)").mkString("[", ", ", "]")
          s"""WITH obs AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
             |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
             |    count(*) AS n_obs
             |  FROM orders GROUP BY 1),
             |d AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS digit),
             |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
             |j AS (SELECT d.digit, CAST(coalesce(obs.n_obs, 0) AS BIGINT) AS n_obs,
             |    t.n, ($arr)[d.digit] AS p
             |  FROM d LEFT JOIN obs USING (digit) CROSS JOIN t)
             |SELECT digit, n_obs, round(n * p, 4) AS expected,
             |  round((CAST(n_obs AS DOUBLE) - n * p) * (CAST(n_obs AS DOUBLE) - n * p)
             |    / (n * p), 6) AS chi2_term
             |FROM j ORDER BY digit""".stripMargin
        })
    },

    // Engine-added — market-basket association rules at the brand level:
    // support / confidence / lift for brand pairs co-occurring in an order
    // (the a-priori 2-itemset pass). The pair generation is a self-join on
    // the ORDER key over per-order DISTINCT brands — fanout bounded by
    // basket size (≤ items per order), never |brands|². Ranking uses the
    // integer cross-product lift (n·nab·10⁶ div na·nb) so the top-15 is an
    // exact TakeOrderedAndProject; the reported ratios are single IEEE
    // divisions of identical integers. Long arithmetic holds to ~10⁹
    // orders; beyond that the lift product widens to decimal with the same
    // plan. Brand counts and the order total ride broadcast.
    "m25_basket_lift" -> QueryDef(
      (s, dir) => {
        val ob = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
          .distinct()
        val tot = ob.agg(countDistinct("ok").as("n"))
        val bc = ob.groupBy("brand").agg(count(lit(1)).as("nb"))
        val pairs = ob.select(col("ok"), col("brand").as("brand_a"))
          .join(ob.select(col("ok"), col("brand").as("brand_b")), "ok")
          .filter(col("brand_a") < col("brand_b"))
          .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("nab"))
        pairs
          .join(broadcast(bc.select(col("brand").as("brand_a"), col("nb").as("na"))), "brand_a")
          .join(broadcast(bc.select(col("brand").as("brand_b"), col("nb").as("nbb"))), "brand_b")
          .crossJoin(broadcast(tot))
          .withColumn("lmic", expr("(n * nab * 1000000) div (na * nbb)"))
          .orderBy(desc("lmic"), desc("nab"), col("brand_a"), col("brand_b"))
          .limit(15)
          .select(col("brand_a"), col("brand_b"), col("nab").as("support_cnt"),
            col("na"), col("nbb").as("nb"),
            round(col("nab").cast("double") / col("n"), 6).as("support"),
            round(col("nab").cast("double") / col("na"), 6).as("confidence"),
            round((col("n") * col("nab")).cast("double")
              / (col("na") * col("nbb")).cast("double"), 6).as("lift"))
      },
      Some("""WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |tot AS (SELECT count(DISTINCT ok) AS n FROM ob),
             |bc AS (SELECT brand, count(*) AS nb FROM ob GROUP BY 1),
             |pr AS (SELECT x.brand AS brand_a, y.brand AS brand_b, count(*) AS nab
             |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.brand < y.brand
             |  GROUP BY 1, 2),
             |sc AS (SELECT brand_a, brand_b, nab, a.nb AS na, b.nb AS nbb, n,
             |    (n * nab * 1000000) // (a.nb * b.nb) AS lmic
             |  FROM pr JOIN bc a ON a.brand = brand_a
             |  JOIN bc b ON b.brand = brand_b CROSS JOIN tot)
             |SELECT brand_a, brand_b, nab AS support_cnt, na, nbb AS nb,
             |  round(CAST(nab AS DOUBLE) / n, 6) AS support,
             |  round(CAST(nab AS DOUBLE) / na, 6) AS confidence,
             |  round(CAST(n * nab AS DOUBLE) / CAST(na * nbb AS DOUBLE), 6) AS lift
             |FROM sc ORDER BY lmic DESC, nab DESC, brand_a, brand_b
             |LIMIT 15""".stripMargin)),

    // Engine-added — chi-square test of independence between two
    // categorical columns (order priority × order status): the contingency
    // table is one map-side-combined hash aggregate; row totals, column
    // totals and the grand total are derived from the SAME bounded table
    // (≤ |priorities|·|statuses| rows) and ride broadcast back onto the
    // cells. Expected counts r_i·c_j/n and each cell's chi-square term are
    // pure-IEEE chains over exact integers — bit-identical cross-engine.
    // The per-cell contributions expose WHERE the dependence lives, which
    // is the part a data-quality audit actually reads.
    "m26_chi2_independence" -> QueryDef(
      (s, dir) => {
        val ct = graft.core.Materialize.cut(
          Tables.orders(s, dir)
            .groupBy(col("o_orderpriority").as("prio"), col("o_orderstatus").as("status"))
            .agg(count(lit(1)).as("nij")))
        val r = ct.groupBy("prio").agg(sum("nij").as("ri"))
        val c = ct.groupBy("status").agg(sum("nij").as("cj"))
        val n = ct.agg(sum("nij").as("n"))
        ct.join(broadcast(r), "prio").join(broadcast(c), "status")
          .crossJoin(broadcast(n))
          .withColumn("expected", (col("ri") * col("cj")).cast("double") / col("n"))
          .select(col("prio"), col("status"), col("nij"),
            round(col("expected"), 4).as("expected"),
            round((col("nij").cast("double") - col("expected"))
              * (col("nij").cast("double") - col("expected")) / col("expected"), 6)
              .as("chi2_term"))
          .orderBy("prio", "status")
      },
      Some("""WITH ct AS (SELECT o_orderpriority AS prio, o_orderstatus AS status,
             |    count(*) AS nij FROM orders GROUP BY 1, 2),
             |r AS (SELECT prio, CAST(sum(nij) AS BIGINT) AS ri FROM ct GROUP BY 1),
             |c AS (SELECT status, CAST(sum(nij) AS BIGINT) AS cj FROM ct GROUP BY 1),
             |t AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM ct),
             |e AS (SELECT prio, status, nij,
             |    CAST(ri * cj AS DOUBLE) / n AS expected
             |  FROM ct JOIN r USING (prio) JOIN c USING (status) CROSS JOIN t)
             |SELECT prio, status, nij, round(expected, 4) AS expected,
             |  round((CAST(nij AS DOUBLE) - expected) * (CAST(nij AS DOUBLE) - expected)
             |    / expected, 6) AS chi2_term
             |FROM e ORDER BY prio, status""".stripMargin)),

    // Engine-added — Mann-Whitney U rank test between two cohorts' value
    // distributions (the nonparametric complement to m23's KS): operates on
    // the DISTINCT-VALUE histogram, never per-row ranks — tie groups give
    // their members the average rank, which over the histogram is pure
    // integer arithmetic (doubled ranks r2 = 2·cumBefore + cnt + 1, so
    // half-ranks stay integral). The cumulative count over the value order
    // runs on ops.Cumulative's range-partitioned path (the distinct-value
    // frame shrinks with quantization but is still data-dependent — no
    // constant-key window allowed). U, the tie-correction Σ(t³−t) and all
    // moments stay integer; z is one IEEE chain over them. Long holds to
    // ~10⁹ rows (R₂ₐ ≈ n·2n); decimal(38,0) widens it beyond, same plan.
    "m27_mann_whitney" -> QueryDef(
      (s, dir) => {
        val byV = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "signup"))
          .select(col("event_type").as("g"),
            round(col("value") * 100).cast("long").as("v"))
          .groupBy("v")
          .agg(sum(when(col("g") === "click", 1L).otherwise(0L)).as("nav"),
            sum(when(col("g") === "signup", 1L).otherwise(0L)).as("nbv"))
        val ranked = graft.ops.Cumulative.runningSum(
          byV, Seq(col("v")), col("nav") + col("nbv"), "rnk", "cum")
        val m = ranked
          .select(col("nav"), col("nbv"), (col("nav") + col("nbv")).as("cnt"), col("cum"))
          .withColumn("r2", lit(2L) * (col("cum") - col("cnt")) + col("cnt") + 1L)
          .agg(sum("nav").as("na"), sum("nbv").as("nb"),
            sum(col("nav") * col("r2")).as("r2a"),
            sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("sumt"))
        m.select(col("na").as("n_click"), col("nb").as("n_signup"),
            ((col("r2a") - col("na") * (col("na") + 1L)).cast("double") / 2).as("u"),
            col("sumt").as("tie_mass"),
            (col("na") + col("nb")).as("n"))
          .select(col("n_click"), col("n_signup"),
            round(col("u"), 1).as("u_stat"), col("tie_mass"),
            round(((col("u") - col("n_click").cast("double") * col("n_signup") / 2))
              / sqrt(col("n_click").cast("double") * col("n_signup")
                * ((col("n") + 1) - col("tie_mass").cast("double")
                  / (col("n") * (col("n") - lit(1.0)))) / 12), 6).as("z"))
      },
      Some("""WITH e AS (SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS v
             |  FROM events WHERE event_type IN ('click', 'signup')),
             |h AS (SELECT v,
             |    CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nav,
             |    CAST(sum(CASE WHEN g = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS nbv
             |  FROM e GROUP BY 1),
             |c AS (SELECT nav, nbv, nav + nbv AS cnt,
             |    CAST(sum(nav + nbv) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |  FROM h),
             |r AS (SELECT nav, nbv, cnt, 2 * (cum - cnt) + cnt + 1 AS r2 FROM c),
             |m AS (SELECT CAST(sum(nav) AS BIGINT) AS na, CAST(sum(nbv) AS BIGINT) AS nb,
             |    CAST(sum(nav * r2) AS BIGINT) AS r2a,
             |    CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS sumt
             |  FROM r),
             |u AS (SELECT na AS n_click, nb AS n_signup,
             |    CAST(r2a - na * (na + 1) AS DOUBLE) / 2 AS u, sumt AS tie_mass,
             |    na + nb AS n
             |  FROM m)
             |SELECT n_click, n_signup, round(u, 1) AS u_stat, tie_mass,
             |  round((u - CAST(n_click AS DOUBLE) * n_signup / 2)
             |    / sqrt(CAST(n_click AS DOUBLE) * n_signup
             |      * ((n + 1) - CAST(tie_mass AS DOUBLE) / (n * (n - 1.0))) / 12), 6) AS z
             |FROM u""".stripMargin)),

    // Engine-added — Kaplan-Meier conversion curve: time from first signup
    // to first subsequent purchase per user, RIGHT-CENSORED at the corpus
    // horizon for users who never convert — the estimator that handles
    // "hasn't converted YET" correctly where a naive mean drops it. Per-user
    // durations are one aggregation; the day-level table is bounded by the
    // corpus time span (≤ 30 rows — bounded by time range, not volume, so
    // the constant-key window is legitimate: the w13 argument). At-risk
    // counts derive from cumulative integer counts; each survival factor
    // ln((n−e)/n) quantizes to integer micro-units before the cumulative
    // sum (t12 discipline), with an explicit −20·10⁶ floor when an event
    // day empties the risk set (ln 0). S(d) = exp(cum/10⁶), one libm call
    // per row on identical inputs, absorbed by round 6.
    "m28_kaplan_meier" -> QueryDef(
      (s, dir) => {
        val dayNs = 86400000000000L
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ns"))
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts_ns").as("sts"))
        val pu = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ns").as("pts"))
        val firstP = su.join(pu, Seq("user_id"), "left")
          .groupBy("user_id", "sts")
          .agg(min(when(col("pts") >= col("sts"), col("pts"))).as("fp"))
        val mx = ev.agg(max("ts_ns").as("mx"))
        val dur = firstP.crossJoin(broadcast(mx))
          .select(
            when(col("fp").isNotNull, expr(s"(fp - sts) div $dayNs"))
              .otherwise(expr(s"(mx - sts) div $dayNs")).as("d"),
            when(col("fp").isNotNull, 1L).otherwise(0L).as("event"))
        val byD = dur.groupBy("d")
          .agg(sum("event").as("e"), sum(lit(1L) - col("event")).as("c"))
        val one = coalesce(pmod(col("d"), lit(1L)), lit(0L))
        val wAll = Window.partitionBy(one)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val wPrior = Window.partitionBy(one).orderBy("d")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wCum = Window.partitionBy(one).orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byD
          .withColumn("n_risk",
            sum(col("e") + col("c")).over(wAll)
              - coalesce(sum(col("e") + col("c")).over(wPrior), lit(0L)))
          .withColumn("lf",
            when(col("e") === 0, 0L)
              .when(col("n_risk") > col("e"),
                round(log((col("n_risk") - col("e")).cast("double")
                  / col("n_risk").cast("double")) * 1000000).cast("long"))
              .otherwise(lit(-20000000L)))
          .withColumn("survival", round(exp(sum("lf").over(wCum) / lit(1000000.0)), 6))
          .select(col("d").as("day"), col("n_risk"), col("e").as("n_events"),
            col("c").as("n_censored"), col("survival"))
          .orderBy("day")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
             |su AS (SELECT user_id, min(ts_ns) AS sts FROM ev
             |  WHERE event_type = 'signup' GROUP BY 1),
             |pu AS (SELECT user_id, ts_ns AS pts FROM ev WHERE event_type = 'purchase'),
             |fp AS (SELECT su.user_id, su.sts,
             |    min(CASE WHEN pts >= sts THEN pts END) AS fp
             |  FROM su LEFT JOIN pu ON pu.user_id = su.user_id GROUP BY 1, 2),
             |mx AS (SELECT max(ts_ns) AS mx FROM ev),
             |dur AS (SELECT
             |    CASE WHEN fp IS NOT NULL THEN (fp - sts) // 86400000000000
             |         ELSE (mx - sts) // 86400000000000 END AS d,
             |    CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS event
             |  FROM fp CROSS JOIN mx),
             |byd AS (SELECT d, CAST(sum(event) AS BIGINT) AS e,
             |    CAST(sum(1 - event) AS BIGINT) AS c FROM dur GROUP BY 1),
             |r AS (SELECT d, e, c,
             |    CAST(sum(e + c) OVER () AS BIGINT)
             |      - CAST(coalesce(sum(e + c) OVER (ORDER BY d
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      AS n_risk
             |  FROM byd),
             |lf AS (SELECT d, e, c, n_risk,
             |    CASE WHEN e = 0 THEN 0
             |         WHEN n_risk > e THEN CAST(round(ln(CAST(n_risk - e AS DOUBLE)
             |           / CAST(n_risk AS DOUBLE)) * 1000000) AS BIGINT)
             |         ELSE -20000000 END AS lf
             |  FROM r)
             |SELECT d AS day, n_risk, e AS n_events, c AS n_censored,
             |  round(exp(CAST(sum(lf) OVER (ORDER BY d
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    / 1000000.0), 6) AS survival
             |FROM lf ORDER BY day""".stripMargin)),

    // Engine-added — ROC-AUC for a binary classifier, computed EXACTLY via
    // the rank-sum identity AUC = U/(n₊·n₋) (the m27 Mann-Whitney
    // machinery): ties between scores get average ranks, and the whole
    // statistic reduces to integer sums over the DISTINCT-SCORE histogram —
    // never a per-row global sort, never a threshold sweep. Task: does
    // order value (integer cents — exact) separate fulfilled ('F') orders
    // from the rest? Cumulative ranks ride the range-partitioned prefix-sum
    // path; doubled ranks keep everything integral until the single
    // reported division. Gini = 2·AUC − 1 falls out for free.
    "m29_auc" -> QueryDef(
      (s, dir) => {
        val byV = Tables.orders(s, dir)
          .select((col("o_orderstatus") === "F").cast("long").as("pos"),
            round(col("o_totalprice") * 100).cast("long").as("v"))
          .groupBy("v")
          .agg(sum("pos").as("nav"), sum(lit(1L) - col("pos")).as("nbv"))
        val ranked = graft.ops.Cumulative.runningSum(
          byV, Seq(col("v")), col("nav") + col("nbv"), "rnk", "cum")
        ranked
          .select(col("nav"), col("nbv"), (col("nav") + col("nbv")).as("cnt"), col("cum"))
          .withColumn("r2", lit(2L) * (col("cum") - col("cnt")) + col("cnt") + 1L)
          .agg(sum("nav").as("na"), sum("nbv").as("nb"),
            sum(col("nav") * col("r2")).as("r2a"))
          .select(col("na").as("n_pos"), col("nb").as("n_neg"),
            round((col("r2a") - col("na") * (col("na") + 1L)).cast("double") / 2
              / (col("na") * col("nb")).cast("double"), 6).as("auc"),
            round(lit(2.0) * ((col("r2a") - col("na") * (col("na") + 1L)).cast("double")
              / 2 / (col("na") * col("nb")).cast("double")) - lit(1.0), 6).as("gini"))
      },
      Some("""WITH o AS (SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
             |  FROM orders),
             |h AS (SELECT v, CAST(sum(pos) AS BIGINT) AS nav,
             |    CAST(sum(1 - pos) AS BIGINT) AS nbv
             |  FROM o GROUP BY 1),
             |c AS (SELECT nav, nbv, nav + nbv AS cnt,
             |    CAST(sum(nav + nbv) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |  FROM h),
             |r AS (SELECT nav, nbv, cnt, 2 * (cum - cnt) + cnt + 1 AS r2 FROM c),
             |m AS (SELECT CAST(sum(nav) AS BIGINT) AS na,
             |    CAST(sum(nbv) AS BIGINT) AS nb,
             |    CAST(sum(nav * r2) AS BIGINT) AS r2a
             |  FROM r)
             |SELECT na AS n_pos, nb AS n_neg,
             |  round(CAST(r2a - na * (na + 1) AS DOUBLE) / 2
             |    / CAST(na * nb AS DOUBLE), 6) AS auc,
             |  round(2.0 * (CAST(r2a - na * (na + 1) AS DOUBLE) / 2
             |    / CAST(na * nb AS DOUBLE)) - 1.0, 6) AS gini
             |FROM m""".stripMargin))
  )
}
