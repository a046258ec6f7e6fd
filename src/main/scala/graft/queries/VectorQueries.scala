package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.core.Tables
import graft.functions.VectorExpr
import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>`, dim 64):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH as
  * the scale path, and an IVF-style coarse-centroid assignment.
  *
  * Scale posture: brute force is probes × corpus (probe side broadcast —
  * linear in corpus, never corpus²); LSH bounds candidate generation by
  * bucket equi-join; IVF assignment is a relational explode-join-aggregate
  * whose shuffle key is (vector, centroid) — all hold at 1000 executors.
  */
object VectorQueries extends QueryCatalog {

  private val Dim = 64

  private def ssum(c: org.apache.spark.sql.Column) =
    graft.functions.SortedSumD.sortedSum(c)

  /** Deterministic relational Lloyd over the embeddings (k=4, 2 iterations,
    * init = k lowest vec_ids) in the (id, dim, value) row layout. Returns
    * (rows [PERSISTED — caller must release], final centers, assignment).
    * Consumed via [[lloydStaged]] (one parquet-staged build per
    * (application, dir, k) serving v5/v6/v7); mirrored CTE fragments in
    * [[lloydSql]]. */
  private def lloyd(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 4, iters: Int = 2) = {
    // fanout BEFORE the 64x explode: the embeddings parquet arrives as one
    // split, and without it every Lloyd join/fold stage inherits 1-2 tasks
    // (measured at the 10x corpus: 95 s single-task argmin stages, 31 cores
    // idle, v5 141 s total).
    val rows = Tables.fanout(Tables.embeddings(s, dir))
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("dim"), col("col").cast("double").as("v"))
      .persist()
    var centers = rows.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("dim"), col("v").as("cv"))
    var assigned = rows.select("vec_id").limit(0)
    for (_ <- 1 to iters) {
      // Assignment in the ARRAY layout: k dim-ordered centroid arrays
      // broadcast against the un-exploded embeddings, distance = ONE native
      // sorted-fold call per (vector, centroid). The row-layout form
      // (rows ⋈ centers on dim → per-(vec,cid) collect_list fold) pushes
      // rows×k intermediate rows through a boxed TypedImperativeAggregate —
      // the sf10 whale measured it 46–62× per data decade (v5 25 s→1556 s).
      // Values are bit-identical (same multiset, same sorted order, same
      // sequential sum — see VectorMath.sortedSqDiffSumF), so the DuckDB
      // twin and every downstream hash compare are untouched.
      val centArr = centerArrays(centers)
      val d2 = Tables.embeddings(s, dir).crossJoin(broadcast(centArr))
        .select(col("vec_id"), col("cid"),
          VectorExpr.vecSortedSqDiffSum(
            col("embedding"), col("carr"), lit(0)).as("d2"))
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
      // Per-round lineage cuts (the GraphOps/t15 idiom): assigned feeds BOTH
      // the recenter fold and the caller's probe join, and centers feeds the
      // next round's d2 — left lazy, each round's corpus-sized argmin join
      // re-evaluates once per consumer (measured at the 10x corpus: the
      // iteration-1 join ran 2-3x inside one action, ~100 s of repeated
      // single-stage work). Both frames are rows<<corpus, so the cut is free.
      assigned = graft.core.Materialize.cut(
        d2.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).select("vec_id", "cid"))
      // Two-level fold (ops.SortedFold): (cid, dim) groups hold one value
      // per member vector — corpus-proportional, so the single-level sorted
      // mean was a latent OOM at scale.
      centers = graft.core.Materialize.cut(
        graft.ops.SortedFold.means(
            assigned.join(rows, "vec_id"), Seq("cid", "dim"), col("vec_id"),
            Seq("v" -> "cv"))
          .select("cid", "dim", "cv"))
    }
    (rows, centers, assigned)
  }

  /** (cid [+ extra key cols], carr) — each centroid's (cid, dim, cv) rows
    * gathered into ONE dim-ordered array<double> (k rows total, broadcast
    * side of the array-layout assignment). struct sort orders by the first
    * field (dim, unique per group), so `carr[i]` is the dim-i component. */
  private def centerArrays(centers: org.apache.spark.sql.DataFrame,
      keys: Seq[String] = Seq("cid")) =
    centers.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(col("dim"), col("cv")))).as("p"))
      .withColumn("carr", expr("transform(p, x -> x.cv)"))
      .drop("p")

  /** [[lloyd]]'s (centers, assigned) as a parquet-staged shared index (the
    * ShingleIndex/custKnn5 pattern, round-7 hardening): the deterministic
    * codebook is built ONCE per (application, dir) and every consumer —
    * v6's cluster summary, v7's IVF search — re-reads the stage.
    *
    * Two reasons, both 100 TB-shaped:
    *  1. an IVF deployment trains its coarse quantizer once and serves many
    *     searches against it; v6 (build) and v7 (search) re-fitting the
    *     same codebook per query was the benchmark shape, not the
    *     production one;
    *  2. the lazy-lineage/localCheckpoint state the in-memory form carries
    *     is exactly the mechanism class behind BENCH_r06's v7 reading
    *     (31.5 s in-suite vs 2.5 s isolated, BASELINE.md round-7 section):
    *     parquet stages hold no executor blocks, so suite-position memory
    *     pressure cannot force a recompute.
    *
    * Both frames ride ONE staged file (kind='c' center rows, kind='a'
    * assignment rows) so the Lloyd iteration runs exactly once even when
    * the stage is built cold by whichever consumer runs first. */
  private def lloydStaged(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 4, iters: Int = 2) = {
    var release: List[org.apache.spark.sql.DataFrame] = Nil
    val st = graft.ops.Staged(s, s"lloyd:$k:$iters:$dir",
        afterWrite = () => { release.foreach(_.unpersist()); release = Nil }) {
      val (rows, centers, assigned) = lloyd(s, dir, k, iters)
      release = List(rows)
      centers.select(lit("c").as("kind"), col("cid").cast("long").as("k1"),
          col("dim").cast("long").as("k2"), col("cv").as("v"))
        .unionByName(assigned.select(lit("a").as("kind"),
          col("vec_id").cast("long").as("k1"), col("cid").cast("long").as("k2"),
          lit(null).cast("double").as("v")))
    }
    val centers = st.filter(col("kind") === "c")
      .select(col("k1").as("cid"), col("k2").cast("int").as("dim"), col("v").as("cv"))
    val assigned = st.filter(col("kind") === "a")
      .select(col("k1").as("vec_id"), col("k2").as("cid"))
    (centers, assigned)
  }

  /** DuckDB CTE chain mirroring [[lloyd]] at cluster count `k`:
    * rows_, c0..c2, a1..a2. */
  private def lloydSql(k: Int): String = {
    val steps = (1 to 2).map { i =>
      s"""a$i AS (SELECT vec_id, cid FROM (
         |    SELECT r.vec_id, c.cid,
         |      list_sum(list_sort(list((r.v - c.cv) * (r.v - c.cv)))) AS d2
         |    FROM rows_ r JOIN c${i - 1} c USING (dim) GROUP BY 1, 2)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
         |cp$i AS (SELECT a.cid, r.dim, r.vec_id // ${graft.ops.SortedFold.BucketCap} AS bkt,
         |    list_sum(list_sort(list(r.v))) AS sv, count(*) AS n
         |  FROM a$i a JOIN rows_ r USING (vec_id) GROUP BY 1, 2, 3),
         |c$i AS (SELECT cid, dim,
         |    list_sum(list_sort(list(sv))) / sum(n) AS cv
         |  FROM cp$i GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""rows_ AS (SELECT vec_id,
       |    generate_subscripts(embedding, 1) - 1 AS dim,
       |    unnest(embedding)::DOUBLE AS v
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, dim, v AS cv FROM rows_ WHERE vec_id < $k),
       |$steps""".stripMargin
  }

  /** Corpus-adaptive multi-table LSH geometry: (tables, bitsPerTable).
    *
    * Fixed-width banding is the same trap SimHashWide names for blocking:
    * candidate pairs per table ≈ n²/2^(w+1), so a corpus-independent w is
    * Θ(n²) — the round-8 sf10 whale measured exactly that (v3 at 200k
    * vectors: ~10¹⁰ candidate pairs from the frozen 4×8 shape, a 56 GB
    * heap and a driver heartbeat freeze). Width therefore grows with the
    * corpus: w = max(8, ceil(log₂(n/8))) keeps E[bucket] ≤ 8, bounding
    * pairs per table to ≈ 4n — LINEAR by construction. Wider bands cut
    * per-table recall (collision prob p^w for per-plane agreement p), so
    * tables grow one-per-extra-bit in compensation (OR across tables),
    * capped at 12; the plane budget is tables × width consecutive
    * projections of the same deterministic hyperplane family.
    *
    * Oracle equality: at every oracle-checked scale the formula yields the
    * literal (4, 8) the DuckDB twins pin — embeddings n = 20 (sf0.001),
    * 200 (sf0.01, the correctness gate), 2,000 (sf0.1, the bench point)
    * all give w = 8, t = 4 — so the adaptive path and the frozen SQL are
    * bit-identical everywhere a hash compare runs (the a16 rewrite
    * precedent: scale-correct plan, oracle-exact result). */
  private[graft] def lshGeometry(n: Long): (Int, Int) = {
    val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, n / 8 - 1))
    val w = math.min(24, math.max(8, ceilLog2))
    val t = math.min(12, 4 + (w - 8))
    (t, w)
  }

  /** One count() per (application, corpus): the adaptive geometry needs the
    * corpus size, and a parquet count is metadata-only — but not free
    * inside a 3-rep suite, so memoize. Keyed by (dir, mtime, size) of the
    * embeddings file, not dir alone: a corpus REGENERATED at the same path
    * within one application (tests, whale re-gen) must not compute its LSH
    * geometry from the stale count. */
  private val embCounts =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), java.lang.Long]()

  private def embCacheKey(dir: String): (String, Long, Long) = {
    val f = new java.io.File(dir, "embeddings.parquet")
    (dir, f.lastModified(), f.length())
  }

  /** v3's over-full-bucket cap: 16× the E[bucket] ≤ 8 the adaptive width
    * targets. See the v3 scaladoc for the sf10 measurements behind it. */
  private val NeardupBucketCap = 128

  /** (vec_id, band) rows for the corpus-adaptive multi-table LSH (see
    * [[lshGeometry]]). The band keys come from ONE fused native call per row
    * (VectorExpr.vecLshBandKeys): the dots-column + derived-keys composition
    * is a trap at whale geometry — CollapseProject re-inlines the projection
    * array into all tables×width element_at references, Janino rejects the
    * fused method (64 KB), and the interpreted fallback recomputes the
    * projections per reference (one sf10 task measured at 858 s inside
    * hyperplaneDotsF before the fusion). */
  private def bandedIds(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val n: Long = embCounts.computeIfAbsent(embCacheKey(dir),
      _ => Tables.embeddings(s, dir).count())
    val (tables, w) = lshGeometry(n)
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        explode(VectorExpr.vecLshBandKeys(col("embedding"), tables, w)).as("band"))
  }

  def defs: Map[String, QueryDef] = Map(

    // V1 — brute-force cosine top-k: for each of 5 probe vectors, the 5
    // nearest neighbors by cosine. Probe side broadcast; ranking on the
    // 6-dp-rounded cosine with vec_id tie-break for determinism.
    "v1_knn_brute" -> QueryDef(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val probes = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
        val scored = e.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("probe_id"))
          .withColumn("cos", round(VectorExpr.vecCosine(col("embedding"), col("pe")), 6))
        val w = Window.partitionBy("probe_id").orderBy(desc("cos"), col("vec_id"))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
          .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor"), col("cos"))
          .orderBy("probe_id", "rn")
      },
      Some(s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
              |          FROM embeddings WHERE vec_id < 5),
              |s AS (SELECT probe_id, vec_id,
              |    round(${cosineSql("embedding", "pe", Dim)}, 6) AS cos
              |  FROM embeddings CROSS JOIN p WHERE vec_id <> probe_id),
              |r AS (SELECT probe_id, vec_id,  cos,
              |    row_number() OVER (PARTITION BY probe_id
              |      ORDER BY cos DESC, vec_id) AS rn FROM s)
              |SELECT probe_id, rn, vec_id AS neighbor, cos
              |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin),
      headline = true),

    // V2 — ANN via MULTI-TABLE random-hyperplane LSH (corpus-adaptive
    // geometry, 4 tables × 8 sign bits at every oracle-checked scale — see
    // lshGeometry), a candidate is any vector sharing ANY
    // table's bucket with the probe. A single 8-bit table caps recall AND
    // makes the same-bucket join Θ(n²/256) at scale; banding keeps each
    // table's bucket small while OR-ing tables for recall — same shape as
    // d3's banded MinHash. Candidate generation runs over bare (id, band)
    // rows; embeddings re-attach after pair dedup (no wide-array shuffle).
    // Output: per-probe top-3 with the deduped candidate count (recall
    // diagnostics).
    "v2_ann_lsh" -> QueryDef(
      (s, dir) => {
        val banded = bandedIds(s, dir)
        val pbanded = banded.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("band"))
        val candIds = banded.join(broadcast(pbanded), Seq("band"))
          .filter(col("vec_id") =!= col("probe_id"))
          .select("probe_id", "vec_id").dropDuplicates("probe_id", "vec_id")
        val e = Tables.embeddings(s, dir)
        val cand = candIds
          .join(e, "vec_id")
          .join(broadcast(e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))), "probe_id")
          .withColumn("cos", round(VectorExpr.vecCosine(col("embedding"), col("pe")), 6))
        val w = Window.partitionBy("probe_id").orderBy(desc("cos"), col("vec_id"))
        cand
          .withColumn("n_cand", count(lit(1)).over(Window.partitionBy("probe_id")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor"),
            col("cos"), col("n_cand"))
          .orderBy("probe_id", "rn")
      },
      Some {
        val dots = hyperplaneDotsSql("embedding", 32, Dim)
        val bands = lshBandKeysSql("dots", 4, 8)
        s"""WITH base AS (SELECT vec_id, embedding, $dots AS dots FROM embeddings),
           |banded AS (SELECT vec_id, unnest($bands) AS band FROM base),
           |p AS (SELECT vec_id AS probe_id, band FROM banded WHERE vec_id < 5),
           |cand AS (SELECT DISTINCT probe_id, b.vec_id
           |  FROM banded b JOIN p USING (band) WHERE b.vec_id <> probe_id),
           |scored AS (SELECT probe_id, c.vec_id,
           |    round(${cosineSql("ce.embedding", "pe.embedding", Dim)}, 6) AS cos
           |  FROM cand c JOIN embeddings ce ON ce.vec_id = c.vec_id
           |  JOIN embeddings pe ON pe.vec_id = c.probe_id),
           |r AS (SELECT probe_id, vec_id, cos,
           |    count(*) OVER (PARTITION BY probe_id) AS n_cand,
           |    row_number() OVER (PARTITION BY probe_id
           |      ORDER BY cos DESC, vec_id) AS rn FROM scored)
           |SELECT probe_id, rn, vec_id AS neighbor, cos, n_cand
           |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin
      }),

    // V3 — embedding near-dup candidates via the same multi-table LSH:
    // all pairs sharing any non-over-full bucket of any table, deduped,
    // ranked by cosine, top-20. Two guards make the pair volume linear:
    //  1. adaptive width (lshGeometry) keeps E[bucket] ≤ 8 — ~4n pairs per
    //     table under uniform hashing;
    //  2. the over-full-bucket cap (NeardupBucketCap) handles the CLUSTERED
    //     case uniformity misses: a dense region puts a whole cluster in
    //     one bucket at any width (sf10 whale measured: 345M pairs from
    //     buckets up to 2,444 deep, vs the ~9M uniform estimate). Buckets
    //     deeper than the cap are dense-region noise, not near-dup signal
    //     (the d2/d7 df-cap rationale applied to vector buckets): dropping
    //     them cuts sf10 pairs 345M → 24.4M while keeping 0.87 recall on
    //     the corpus's planted same-rotation near-dups (DuckDB-measured;
    //     a true near-dup pair is only lost if EVERY table's shared bucket
    //     is over-full). The cap never fires at the oracle-checked scales
    //     (max occupancy ≪ 128 at n ≤ 2,000) and is mirrored in the SQL
    //     twin regardless, so both sides stay formally identical.
    "v3_embedding_neardup" -> QueryDef(
      (s, dir) => {
        val banded = bandedIds(s, dir)
        val keep = banded.groupBy("band").agg(count(lit(1)).as("occ"))
          .filter(col("occ") <= NeardupBucketCap).select("band")
        val capped = banded.join(keep, "band")
        val pairIds = capped.as("a").join(capped.as("b"),
            col("a.band") === col("b.band") && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
          .dropDuplicates("id_a", "id_b")
        val e = Tables.embeddings(s, dir)
        pairIds
          .join(e.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
          .join(e.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
          .select(col("id_a"), col("id_b"),
            round(VectorExpr.vecCosine(col("ea"), col("eb")), 6).as("cos"))
          .orderBy(desc("cos"), col("id_a"), col("id_b")).limit(20)
      },
      Some {
        val dots = hyperplaneDotsSql("embedding", 32, Dim)
        val bands = lshBandKeysSql("dots", 4, 8)
        s"""WITH base AS (SELECT vec_id, embedding, $dots AS dots FROM embeddings),
           |banded AS (SELECT vec_id, unnest($bands) AS band FROM base),
           |keep AS (SELECT band FROM banded GROUP BY band
           |  HAVING count(*) <= $NeardupBucketCap),
           |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM banded a JOIN keep USING (band) JOIN banded b
           |    ON a.band = b.band AND a.vec_id < b.vec_id)
           |SELECT id_a, id_b,
           |  round(${cosineSql("ea.embedding", "eb.embedding", Dim)}, 6) AS cos
           |FROM pairs JOIN embeddings ea ON ea.vec_id = id_a
           |JOIN embeddings eb ON eb.vec_id = id_b
           |ORDER BY cos DESC, id_a, id_b LIMIT 20""".stripMargin
      }),

    // V5 — IVF with a TRAINED coarse quantizer at production shape: the
    // deterministic relational Lloyd (same machinery as v6/v7, k=16, fixed
    // iterations, init = 16 lowest vec_ids) trains the codebook; every
    // vector lands in one inverted list; probes scan only their nprobe=4
    // nearest lists with exact cosine re-ranking and report the candidate
    // count. The scale path for ANN beyond LSH: list sizes are balanced by
    // the quantizer, probe work is ~nprobe/k of the corpus. Replacing the
    // seeded MLlib fit with the relational Lloyd made every stage
    // bit-reproducible — so unlike round 3 this is fully oracle-checked
    // (and IvfSpec still pins recall vs brute force).
    "v5_ivf_trained" -> QueryDef(
      (s, dir) => {
        val k = 16; val nprobe = 4; val topk = 3
        val (centers, assigned) = lloydStaged(s, dir, k = k)
        val probeRows = Tables.embeddings(s, dir).filter(col("vec_id") < 5)
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id").as("probe_id"), col("pos").as("dim"),
            col("col").cast("double").as("pv"))
        val pc = probeRows.join(centers, "dim")
          .withColumn("t", (col("pv") - col("cv")) * (col("pv") - col("cv")))
          .groupBy("probe_id", "cid").agg(ssum(col("t")).as("d2"))
        val wc = Window.partitionBy("probe_id").orderBy(col("d2"), col("cid"))
        val probeLists = pc.withColumn("crn", row_number().over(wc))
          .filter(col("crn") <= nprobe).select("probe_id", "cid")
        val e = Tables.embeddings(s, dir)
        val scored = probeLists.join(assigned, "cid")
          .filter(col("vec_id") =!= col("probe_id"))
          .join(e.select(col("vec_id"), col("embedding")), "vec_id")
          .join(broadcast(e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))), "probe_id")
          .withColumn("cos", round(VectorExpr.vecCosine(col("embedding"), col("pe")), 6))
        val w = Window.partitionBy("probe_id").orderBy(desc("cos"), col("vec_id"))
        val result = scored
          .withColumn("n_cand", count(lit(1)).over(Window.partitionBy("probe_id")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= topk)
          .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor"),
            col("cos"), col("n_cand"))
          .orderBy("probe_id", "rn")
        result
      },
      Some {
        s"""WITH ${lloydSql(16)},
           |probes AS (SELECT vec_id AS probe_id FROM embeddings WHERE vec_id < 5),
           |pc AS (SELECT p.probe_id, c.cid,
           |    list_sum(list_sort(list((r.v - c.cv) * (r.v - c.cv)))) AS d2
           |  FROM probes p
           |  JOIN rows_ r ON r.vec_id = p.probe_id
           |  JOIN c2 c ON c.dim = r.dim
           |  GROUP BY 1, 2),
           |plist AS (SELECT probe_id, cid FROM pc
           |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d2, cid) <= 4),
           |cand AS (SELECT pl.probe_id, a.vec_id
           |  FROM plist pl JOIN a2 a USING (cid)
           |  WHERE a.vec_id <> pl.probe_id),
           |scored AS (SELECT c.probe_id, c.vec_id,
           |    round(${cosineSql("ec.embedding", "ep.embedding", Dim)}, 6) AS cos
           |  FROM cand c
           |  JOIN embeddings ec ON ec.vec_id = c.vec_id
           |  JOIN embeddings ep ON ep.vec_id = c.probe_id),
           |r AS (SELECT probe_id, vec_id, cos,
           |    count(*) OVER (PARTITION BY probe_id) AS n_cand,
           |    row_number() OVER (PARTITION BY probe_id
           |      ORDER BY cos DESC, vec_id) AS rn FROM scored)
           |SELECT probe_id, rn, vec_id AS neighbor, cos, n_cand
           |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin
      }),

    // V8 — Product Quantization ANN (the faiss-style memory-scale path:
    // 64-dim floats compress to M=8 sub-codes of K=16 — 32 bits/vector —
    // and the scan runs over CODES, not vectors): per-subspace codebooks
    // from the same deterministic relational Lloyd (subspace = extra group
    // key, one pass trains all 8 codebooks), vectors encode to their
    // nearest sub-centroid per subspace, probes build an ADC table (probe ×
    // subspace × centroid partial distances — K·M rows per probe,
    // broadcast), approximate distance is the sum of 8 table lookups (a
    // codes-equi-join + hash-agg — no vector math on the corpus side), and
    // the ADC top-20 shortlist re-ranks by exact L2 (the standard
    // shortlist-then-rerank PQ pipeline; only shortlist×Dim rows touch real
    // vectors). Every stage sorted-fold deterministic ⇒ full DuckDB oracle;
    // PqSpec pins end-to-end recall vs exact L2.
    "v8_pq_search" -> QueryDef(
      (s, dir) => {
        val subDim = 8 // Dim / M subspaces of 8 dims each
        val k = 16; val iters = 2; val shortlist = 20; val topk = 5
        val trainN = 500L // codebooks train on a deterministic prefix sample
        def explode64(df: org.apache.spark.sql.DataFrame) = df
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), expr(s"pos div $subDim").as("m"), col("pos").as("dim"),
            col("col").cast("double").as("v"))
        // Codebook + corpus codes as ONE parquet-staged index (round-7
        // hardening, see lloydStaged): a PQ deployment encodes the corpus
        // once and serves many probes; staging also removes the
        // persisted/localCheckpoint state that suite-position memory
        // pressure could force to recompute (the BENCH_r06 v8 reading).
        var release: List[org.apache.spark.sql.DataFrame] = Nil
        val st = graft.ops.Staged(s, s"pq:$k:$iters:$subDim:$dir",
            afterWrite = () => { release.foreach(_.unpersist()); release = Nil }) {
          // faiss-faithful: Lloyd runs on the SAMPLE (training cost is fixed
          // regardless of corpus size); the full corpus only pays the single
          // final nearest-sub-centroid encoding pass below. Only the sample
          // is exploded to the row layout — the corpus-sized unpivot the
          // encode pass used to share was 64× the rows it needed.
          val train = Tables.fanout(
              Tables.embeddings(s, dir).filter(col("vec_id") < trainN))
            .transform(explode64)
            .persist()
          release = List(train)
          var centers = train.filter(col("vec_id") < k)
            .select(col("m").as("cm"), col("vec_id").as("cid"), col("dim"), col("v").as("cv"))
          for (_ <- 1 to iters) {
            val d2 = train.join(broadcast(centers.drop("cm")), "dim")
              .withColumn("t", (col("v") - col("cv")) * (col("v") - col("cv")))
              .groupBy("vec_id", "m", "cid").agg(ssum(col("t")).as("d2"))
            val w = Window.partitionBy("vec_id", "m").orderBy(col("d2"), col("cid"))
            val assigned = d2.withColumn("rn", row_number().over(w))
              .filter(col("rn") === 1).select("vec_id", "m", "cid")
            // Per-round cut (the lloyd idiom): the post-loop centers feed BOTH
            // the corpus encode pass and the stage write — left lazy the whole
            // training chain re-evaluates once per consumer.
            centers = graft.core.Materialize.cut(
              assigned.join(train, Seq("vec_id", "m"))
                .groupBy(col("m").as("cm"), col("cid"), col("dim"))
                .agg((ssum(col("v")) / count(lit(1))).as("cv")))
          }
          // Corpus encode in the ARRAY layout (the lloyd assignment rewrite):
          // 128 dim-ordered sub-centroid arrays broadcast against the
          // un-exploded corpus, one native sorted-fold call per
          // (vector, subspace, centroid) — bit-identical to the row-layout
          // group fold, at 8× fewer rows and no boxed Collect (the sf10
          // whale read the old shape at 48× per data decade).
          val subArr = centerArrays(centers, Seq("cm", "cid"))
            .withColumn("start", (col("cm") * subDim).cast("int"))
          val codes = Tables.embeddings(s, dir).crossJoin(broadcast(subArr))
            .select(col("vec_id"), col("cm").as("m"), col("cid"),
              VectorExpr.vecSortedSqDiffSum(
                col("embedding"), col("carr"), col("start")).as("d2"))
            .withColumn("rn", row_number().over(
              Window.partitionBy("vec_id", "m").orderBy(col("d2"), col("cid"))))
            .filter(col("rn") === 1).select("vec_id", "m", "cid")
          centers.select(lit("c").as("kind"), col("cm").cast("long").as("m"),
              col("cid").cast("long").as("k1"), col("dim").cast("long").as("k2"),
              col("cv").as("v"))
            .unionByName(codes.select(lit("a").as("kind"), col("m").cast("long"),
              col("vec_id").cast("long").as("k1"), col("cid").cast("long").as("k2"),
              lit(null).cast("double").as("v")))
        }
        val centers = st.filter(col("kind") === "c")
          .select(col("m").as("cm"), col("k1").as("cid"),
            col("k2").cast("int").as("dim"), col("v").as("cv"))
        val codes = st.filter(col("kind") === "a")
          .select(col("k1").as("vec_id"), col("m"), col("k2").as("cid"))
        val adc = explode64(Tables.embeddings(s, dir).filter(col("vec_id") < 5))
          .select(col("vec_id").as("probe_id"), col("dim"), col("v").as("pv"))
          .join(broadcast(centers), "dim")
          .withColumn("t", (col("pv") - col("cv")) * (col("pv") - col("cv")))
          .groupBy(col("probe_id"), col("cm").as("m"), col("cid"))
          .agg(ssum(col("t")).as("pd2"))
        val approx = codes.join(broadcast(adc), Seq("m", "cid"))
          .filter(col("vec_id") =!= col("probe_id"))
          .groupBy("probe_id", "vec_id").agg(ssum(col("pd2")).as("ad2"))
        val wAdc = Window.partitionBy("probe_id").orderBy(col("ad2"), col("vec_id"))
        val cand = approx.withColumn("crn", row_number().over(wAdc))
          .filter(col("crn") <= shortlist).select("probe_id", "vec_id")
        // exact re-rank of the shortlist: |shortlist|·Dim rows per probe.
        // One lazy corpus explode, scanned once — the broadcast shortlist
        // prunes it to ~|shortlist| vectors inside the join.
        val exact = cand
          .join(explode64(Tables.embeddings(s, dir))
            .select(col("vec_id"), col("dim"), col("v")), "vec_id")
          .join(explode64(Tables.embeddings(s, dir).filter(col("vec_id") < 5))
            .select(col("vec_id").as("probe_id"), col("dim"), col("v").as("pv")),
            Seq("probe_id", "dim"))
          .withColumn("t", (col("v") - col("pv")) * (col("v") - col("pv")))
          .groupBy("probe_id", "vec_id").agg(ssum(col("t")).as("d2"))
        val w2 = Window.partitionBy("probe_id").orderBy(col("d2"), col("vec_id"))
        val result = exact.withColumn("rn", row_number().over(w2))
          .filter(col("rn") <= topk)
          .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor"),
            round(col("d2"), 6).as("d2"))
          .orderBy("probe_id", "rn")
        result
      },
      Some {
        val steps = (1 to 2).map { i =>
          s"""a$i AS MATERIALIZED (SELECT vec_id, m, cid FROM (
             |    SELECT r.vec_id, r.m, c.cid,
             |      list_sum(list_sort(list((r.v - c.cv) * (r.v - c.cv)))) AS d2
             |    FROM train r JOIN c${i - 1} c ON c.dim = r.dim GROUP BY 1, 2, 3)
             |  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1),
             |c$i AS MATERIALIZED (SELECT a.m, a.cid, r.dim,
             |    list_sum(list_sort(list(r.v))) / count(*) AS cv
             |  FROM a$i a JOIN train r ON r.vec_id = a.vec_id AND r.m = a.m
             |  GROUP BY 1, 2, 3)""".stripMargin
        }.mkString(",\n")
        s"""WITH rows_ AS MATERIALIZED (SELECT vec_id,
           |    generate_subscripts(embedding, 1) - 1 AS dim,
           |    (generate_subscripts(embedding, 1) - 1) // 8 AS m,
           |    unnest(embedding)::DOUBLE AS v
           |  FROM embeddings),
           |train AS MATERIALIZED (SELECT * FROM rows_ WHERE vec_id < 500),
           |c0 AS MATERIALIZED (SELECT m, vec_id AS cid, dim, v AS cv
           |  FROM rows_ WHERE vec_id < 16),
           |$steps,
           |codes AS MATERIALIZED (SELECT vec_id, m, cid FROM (
           |    SELECT r.vec_id, r.m, c.cid,
           |      list_sum(list_sort(list((r.v - c.cv) * (r.v - c.cv)))) AS d2
           |    FROM rows_ r JOIN c2 c ON c.dim = r.dim GROUP BY 1, 2, 3)
           |  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1),
           |adc AS MATERIALIZED (SELECT r.vec_id AS probe_id, c.m, c.cid,
           |    list_sum(list_sort(list((r.v - c.cv) * (r.v - c.cv)))) AS pd2
           |  FROM rows_ r JOIN c2 c ON c.dim = r.dim
           |  WHERE r.vec_id < 5 GROUP BY 1, 2, 3),
           |approx AS MATERIALIZED (SELECT a.probe_id, x.vec_id,
           |    list_sum(list_sort(list(a.pd2))) AS ad2
           |  FROM codes x JOIN adc a ON a.m = x.m AND a.cid = x.cid
           |  WHERE x.vec_id <> a.probe_id GROUP BY 1, 2),
           |cand AS MATERIALIZED (SELECT probe_id, vec_id FROM (
           |    SELECT probe_id, vec_id, row_number() OVER (
           |      PARTITION BY probe_id ORDER BY ad2, vec_id) AS crn FROM approx)
           |  WHERE crn <= 20),
           |exact AS (SELECT c.probe_id, c.vec_id,
           |    list_sum(list_sort(list((r.v - p.v) * (r.v - p.v)))) AS d2
           |  FROM cand c
           |  JOIN rows_ r ON r.vec_id = c.vec_id
           |  JOIN rows_ p ON p.vec_id = c.probe_id AND p.dim = r.dim
           |  GROUP BY 1, 2)
           |SELECT probe_id, rn, vec_id AS neighbor, round(d2, 6) AS d2
           |FROM (SELECT probe_id, vec_id, d2, row_number() OVER (
           |    PARTITION BY probe_id ORDER BY d2, vec_id) AS rn FROM exact)
           |WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin
      }),

    // V4 — IVF-style coarse assignment: per-label centroids (the "trained"
    // quantizer), every vector assigned to its nearest centroid by cosine;
    // output = assignment-vs-label confusion summary. Fully relational:
    // posexplode → per-(label,dim) mean → dim equi-join → per-(vec,centroid)
    // sums — the 100 TB path (no driver-side centroid math).
    "v4_ivf_assign" -> QueryDef(
      (s, dir) => {
        // No fanout here: v4 is single-pass (one agg + one broadcast join
        // over an UNPERSISTED comps), so the repartition's two extra
        // shuffle stages cost more than the single-task explode they
        // spread (measured at both scales; the iterative family differs).
        val e = Tables.embeddings(s, dir)
        val comps = e.select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
          .withColumn("x", col("x").cast("double"))
        val centroids = comps.groupBy(col("label").as("c_label"), col("dim"))
          .agg(avg("x").as("cx"))
        // Broadcast: centroids are |labels|×|dims| rows by construction
        // (tiny at any corpus size), and joining on `dim` alone has only 64
        // distinct keys — a shuffle there caps parallelism at 64 tasks.
        val scored = comps.join(broadcast(centroids), "dim")
          .groupBy("vec_id", "label", "c_label")
          .agg(sum(col("x") * col("cx")).as("dot"),
            sum(col("x") * col("x")).as("n2a"),
            sum(col("cx") * col("cx")).as("n2b"))
          .withColumn("cos", round(col("dot") / sqrt(col("n2a") * col("n2b")), 6))
        val w = Window.partitionBy("vec_id").orderBy(desc("cos"), col("c_label"))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("c_label") === col("label"), 1L).otherwise(0L)).as("n_correct"))
          .orderBy("label")
      },
      Some("""WITH comps AS (SELECT vec_id, label,
             |    generate_subscripts(embedding, 1) - 1 AS dim,
             |    unnest(embedding)::DOUBLE AS x
             |  FROM embeddings),
             |cent AS (SELECT label AS c_label, dim, avg(x) AS cx
             |  FROM comps GROUP BY 1, 2),
             |scored AS (SELECT vec_id, label, c_label,
             |    round(sum(x * cx) / sqrt(sum(x * x) * sum(cx * cx)), 6) AS cos
             |  FROM comps JOIN cent USING (dim)
             |  GROUP BY 1, 2, 3),
             |assigned AS (SELECT vec_id, label, c_label FROM scored
             |  QUALIFY row_number() OVER (PARTITION BY vec_id
             |    ORDER BY cos DESC, c_label) = 1)
             |SELECT label, count(*) AS n,
             |  CAST(sum(CASE WHEN c_label = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
             |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin)),

    // V6 — embedding clustering: Lloyd's K-Means over the 64-dim vectors in
    // fully relational form (the m3b pattern lifted to high dimensions via
    // the (id, dim, value) row layout — posexplode, a dim equi-join against
    // the k×64-row broadcast-sized center relation, per-(vector, center)
    // sorted-fold distances, argmin window, per-(center, dim) sorted-fold
    // means). Deterministic init = the k lowest vec_ids, so the run is
    // bit-reproducible and DuckDB checks it exactly with unrolled
    // iterations. The training-pipeline use: topic-bucketing a corpus by
    // embedding before mixture sampling.
    "v6_kmeans_embed" -> QueryDef(
      (s, dir) => {
        val (centers, assigned) = lloydStaged(s, dir)
        val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("n"))
        val norms = centers.withColumn("c2", col("cv") * col("cv"))
          .groupBy("cid").agg(sqrt(ssum(col("c2"))).as("nrm"))
        sizes.join(norms, "cid")
          .select(col("cid"), col("n"), round(col("nrm"), 6).as("center_norm"))
          .orderBy("cid")
      },
      Some {
        s"""WITH ${lloydSql(4)},
           |sizes AS (SELECT cid, count(*) AS n FROM a2 GROUP BY 1),
           |norms AS (SELECT cid, sqrt(list_sum(list_sort(list(cv * cv)))) AS nrm
           |  FROM c2 GROUP BY 1)
           |SELECT cid, n, round(nrm, 6) AS center_norm
           |FROM sizes JOIN norms USING (cid) ORDER BY cid""".stripMargin
      }),

    // V7 — IVF search end-to-end on the deterministic codebook: the v6
    // Lloyd centers are the coarse quantizer, its assignment the inverted
    // lists; each probe ranks centers exactly, scans only its nprobe=2
    // nearest lists, and re-ranks candidates by exact cosine. Same output
    // shape as the v1 brute-force baseline, so the two are directly
    // comparable — and unlike the MLlib-trained v5 (spec-pinned recall),
    // every stage here is bit-reproducible and oracle-checked. Scale: the
    // probe side broadcasts; the list scan touches |corpus|·nprobe/k rows.
    "v7_ivf_search" -> QueryDef(
      (s, dir) => {
        val nprobe = 2
        val topk = 5
        val (centers, assigned) = lloydStaged(s, dir)
        // Probe rows rebuilt directly from the 5 probe vectors (tiny) — the
        // staged codebook replaces the shared corpus-explode frame.
        val probeRows = Tables.embeddings(s, dir).filter(col("vec_id") < 5)
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id").as("probe_id"), col("pos").as("dim"),
            col("col").cast("double").as("pv"))
        val pc = probeRows.join(centers, "dim")
          .withColumn("t", (col("pv") - col("cv")) * (col("pv") - col("cv")))
          .groupBy("probe_id", "cid").agg(ssum(col("t")).as("d2"))
        val wc = Window.partitionBy("probe_id").orderBy(col("d2"), col("cid"))
        val probeLists = pc.withColumn("crn", row_number().over(wc))
          .filter(col("crn") <= nprobe).select("probe_id", "cid")
        val e = Tables.embeddings(s, dir)
        val scored = probeLists.join(assigned, "cid")
          .filter(col("vec_id") =!= col("probe_id"))
          .join(e.select(col("vec_id"), col("embedding")), "vec_id")
          .join(broadcast(e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))), "probe_id")
          .withColumn("cos",
            round(VectorExpr.vecCosine(col("embedding"), col("pe")), 6))
        val w = Window.partitionBy("probe_id").orderBy(desc("cos"), col("vec_id"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= topk)
          .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor"), col("cos"))
          .orderBy("probe_id", "rn")
      },
      Some {
        s"""WITH ${lloydSql(4)},
           |probes AS (SELECT vec_id AS probe_id FROM embeddings WHERE vec_id < 5),
           |pc AS (SELECT p.probe_id, c.cid,
           |    list_sum(list_sort(list((r.v - c.cv) * (r.v - c.cv)))) AS d2
           |  FROM probes p
           |  JOIN rows_ r ON r.vec_id = p.probe_id
           |  JOIN c2 c ON c.dim = r.dim
           |  GROUP BY 1, 2),
           |plist AS (SELECT probe_id, cid FROM pc
           |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d2, cid) <= 2),
           |cand AS (SELECT pl.probe_id, a.vec_id
           |  FROM plist pl JOIN a2 a USING (cid)
           |  WHERE a.vec_id <> pl.probe_id),
           |scored AS (SELECT c.probe_id, c.vec_id,
           |    round(${cosineSql("ec.embedding", "ep.embedding", Dim)}, 6) AS cos
           |  FROM cand c
           |  JOIN embeddings ec ON ec.vec_id = c.vec_id
           |  JOIN embeddings ep ON ep.vec_id = c.probe_id),
           |r AS (SELECT probe_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY probe_id
           |      ORDER BY cos DESC, vec_id) AS rn FROM scored)
           |SELECT probe_id, rn, vec_id AS neighbor, cos
           |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin
      }),

    // V9 — int8 SCALAR QUANTIZATION search (the third quantizer beside LSH
    // and IVF/PQ): per-dimension min/max affine-maps each value to a 0..255
    // code, the approximate distance is the INTEGER Σ(code−qcode)² — exact,
    // order-free sums — and the top-10 by quantized distance re-rank by
    // true cosine for the reported top-5. The quantization itself is pure
    // IEEE -,/,·,round on identical inputs, so codes match DuckDB
    // bit-for-bit with no libm involved. At scale SQ8 is the memory-
    // bandwidth play (4× smaller vectors, integer SIMD distances) layered
    // under an IVF list scan; the stats frame is 64 rows broadcast.
    "v9_sq8_search" -> QueryDef(
      (s, dir) => {
        // Persist the explode output AND the code frame: rows feeds stats +
        // the code build, codes feeds the probe table + the distance scan —
        // left lazy the scan/fanout/explode chain re-evaluates four times
        // (the single-task form of that chain was the 10x-corpus cost; the
        // cache makes the fanout shuffle a one-time cost at any scale).
        val rows = Tables.fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), col("pos").as("dim"), col("col").cast("double").as("v"))
          .persist()
        val stats = rows.groupBy("dim").agg(min("v").as("mn"), max("v").as("mx"))
        val codes = rows.join(broadcast(stats), "dim")
          .withColumn("code",
            when(col("mx") > col("mn"),
              round((col("v") - col("mn")) / (col("mx") - col("mn")) * 255.0))
              .otherwise(lit(0.0)).cast("long"))
          .select("vec_id", "dim", "code")
          .persist()
        val probes = codes.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("dim"), col("code").as("qcode"))
        val d2q = codes.join(broadcast(probes), "dim")
          .filter(col("vec_id") =!= col("probe_id"))
          .withColumn("t", (col("code") - col("qcode")) * (col("code") - col("qcode")))
          .groupBy("probe_id", "vec_id").agg(sum("t").as("d2q"))
        val w = Window.partitionBy("probe_id").orderBy(col("d2q"), col("vec_id"))
        val cand = d2q.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        val e = Tables.embeddings(s, dir)
        val rerank = cand
          .join(e.select(col("vec_id"), col("embedding")), "vec_id")
          .join(broadcast(e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))), "probe_id")
          .withColumn("cos", round(VectorExpr.vecCosine(col("embedding"), col("pe")), 6))
        val w2 = Window.partitionBy("probe_id").orderBy(desc("cos"), col("vec_id"))
        graft.QueryDef.materialized(
          rerank.withColumn("rn2", row_number().over(w2)).filter(col("rn2") <= 5)
            .select(col("probe_id"), col("rn2").as("rn"), col("vec_id").as("neighbor"),
              col("cos"), col("d2q"))
            .orderBy("probe_id", "rn"),
          rows, codes)
      },
      Some(s"""WITH rows_ AS (SELECT vec_id,
             |    generate_subscripts(embedding, 1) - 1 AS dim,
             |    unnest(embedding)::DOUBLE AS v
             |  FROM embeddings),
             |stats AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM rows_ GROUP BY 1),
             |codes AS (SELECT vec_id, r.dim,
             |    CAST(CASE WHEN mx > mn THEN round((v - mn) / (mx - mn) * 255.0)
             |      ELSE 0 END AS BIGINT) AS code
             |  FROM rows_ r JOIN stats USING (dim)),
             |p AS (SELECT vec_id AS probe_id, dim, code AS qcode
             |  FROM codes WHERE vec_id < 5),
             |d2q AS (SELECT p.probe_id, c.vec_id,
             |    CAST(sum((c.code - p.qcode) * (c.code - p.qcode)) AS BIGINT) AS d2q
             |  FROM codes c JOIN p USING (dim) WHERE c.vec_id <> p.probe_id
             |  GROUP BY 1, 2),
             |cand AS (SELECT *, row_number() OVER (PARTITION BY probe_id
             |    ORDER BY d2q, vec_id) AS rn FROM d2q),
             |re AS (SELECT cand.probe_id, cand.vec_id, cand.d2q,
             |    round(${cosineSql("e.embedding", "pe.embedding", Dim)}, 6) AS cos
             |  FROM cand
             |  JOIN embeddings e ON e.vec_id = cand.vec_id
             |  JOIN embeddings pe ON pe.vec_id = cand.probe_id
             |  WHERE cand.rn <= 10),
             |r2 AS (SELECT *, row_number() OVER (PARTITION BY probe_id
             |    ORDER BY cos DESC, vec_id) AS rn FROM re)
             |SELECT probe_id, rn, vec_id AS neighbor, cos, d2q
             |FROM r2 WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin))
  )
}
