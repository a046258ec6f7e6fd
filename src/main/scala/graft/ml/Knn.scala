package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact k-nearest-neighbors via grid bucketing with a correctness fallback
  * (SURVEY.md §2.9 M2/M7/M10 support).
  *
  * Phase A joins each point to candidates in its 3×3 cell neighborhood
  * (equi-join on cell ids — work scales with local density, never n²).
  * A point's 3×3 result is provably exact when its k-th candidate distance
  * is ≤ the cell size (no point outside the neighborhood can be closer).
  * The few points failing that test (sparse corners) go through Phase B, a
  * probes×corpus scan — |fallback| is tiny by construction, so the scan
  * stays linear. Union of the two phases is exact kNN.
  *
  * Dense-data posture (the 100× hardening): Phase A runs over DISTINCT
  * locations, not ids —
  *  1. coincident points collapse to one weighted location (a geocoding
  *     default with 10⁶ rows at one coordinate is ONE grid row);
  *  2. only a location's k+1 smallest ids can appear in ANY top-k result
  *     (same distance to every probe, ties broken by id), so expansion back
  *     to ids is capped at k+1 per candidate location;
  *  3. candidate locations whose strict-closer cumulative weight already
  *     reaches k are pruned before expansion (their points cannot enter a
  *     top-k that k strictly-closer points occupy).
  * Per-probe expansion is therefore O(k²) worst-case regardless of how mass
  * piles onto single coordinates. The loud GridGuard cap applies to distinct
  * locations per cell, where exceeding it is genuine quadratic density.
  */
object Knn {

  /** `points`: (id, x, y). Returns (id, nbr_id, d2, rn) with rn = 1..k by
    * ascending squared distance, ties broken by neighbor id. */
  def neighbors(points: DataFrame, k: Int, cellSize: Double,
                maxCellCount: Int = graft.ops.GridGuard.DefaultMaxCellCount): DataFrame = {
    val locs = points.groupBy("x", "y")
      .agg(min("id").as("lid"), count(lit(1)).as("w"))
      .withColumn("cx", floor(col("x") / cellSize))
      .withColumn("cy", floor(col("y") / cellSize))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // One cell dense in DISTINCT locations makes the candidate join below
    // quadratic — fail loudly first (coincident mass is already collapsed).
    graft.ops.GridGuard.requireBoundedCells(locs, Seq("cx", "cy"), maxCellCount, "grid kNN")

    // The only ids that can reach any top-k: per location, the k+1 smallest
    // (+1 absorbs self-exclusion for probes at the same location).
    val wId = Window.partitionBy("x", "y").orderBy("id")
    val candIdPool = points.select("id", "x", "y")
      .withColumn("lrn", row_number().over(wId)).filter(col("lrn") <= k + 1)
      .drop("lrn")

    // Location-level 3×3 candidates; the self-pair carries weight w−1 (a
    // probe's own location contributes its OTHER points).
    val probesL = locs.select(col("lid").as("la"), col("x").as("ax"), col("y").as("ay"),
        col("w").as("wa"), col("cx"), col("cy"))
      .withColumn("ncx", explode(array(col("cx") - 1, col("cx"), col("cx") + 1)))
      .withColumn("ncy", explode(array(col("cy") - 1, col("cy"), col("cy") + 1)))
    val targetsL = locs.select(col("lid").as("lb"), col("x").as("bx"), col("y").as("by"),
      col("w").as("wb"), col("cx").as("ncx"), col("cy").as("ncy"))
    val candL = probesL.join(targetsL, Seq("ncx", "ncy"))
      .select(col("la"), col("lb"), col("bx"), col("by"),
        (pow(col("ax") - col("bx"), 2) + pow(col("ay") - col("by"), 2)).as("d2"),
        when(col("la") === col("lb"), col("wa") - 1).otherwise(col("wb")).as("cw"))

    // Strict-closer pruning: a candidate location survives iff fewer than k
    // points sit strictly closer to the probe location. Tied-d2 locations
    // share one group, so boundary ties are all kept — the id-level ranking
    // below resolves them exactly.
    val byDist = candL.groupBy("la", "d2").agg(sum("cw").as("gw"))
      .withColumn("cumStrict",
        coalesce(sum("gw").over(Window.partitionBy("la").orderBy("d2")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cumStrict") < k)
      .select("la", "d2")
    val keptL = candL.join(byDist, Seq("la", "d2"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Expand back to ids: probe ids at la × pooled candidate ids at lb.
    val ptl = points.select(col("id").as("aid"), col("x"), col("y"))
      .join(locs.select("x", "y", "lid"), Seq("x", "y"))
      .select(col("aid"), col("lid").as("la"))
    val candIds = candIdPool
      .join(locs.select("x", "y", "lid"), Seq("x", "y"))
      .select(col("id").as("bid"), col("lid").as("lb"))
    val w = Window.partitionBy("aid").orderBy(col("d2"), col("bid"))
    val candA = ptl.join(keptL.select("la", "lb", "d2"), "la")
      .join(candIds, "lb")
      .filter(col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"), col("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Exactness test: k candidates found and the k-th lies within one cell.
    val verdict = candA.groupBy("aid")
      .agg(count(lit(1)).as("n_cand"), max("d2").as("max_d2"))
      .withColumn("exact",
        col("n_cand") >= k && col("max_d2") <= lit(cellSize * cellSize))
    val exactIds = verdict.filter(col("exact")).select("aid")
    val fallbackIds = points.select(col("id").as("aid"))
      .join(exactIds, Seq("aid"), "left_anti")

    val exactPart = candA.join(exactIds, Seq("aid"), "left_semi")

    // Phase B: full scan for the (tiny) fallback set only. The probe side
    // must be spread first: the cross join's parallelism is the left side's
    // partition count, and AQE coalesces the small anti-join output to ONE
    // partition — measured as a single task computing |fallback|×n distances
    // while 31 cores idled.
    val fbProbes = graft.core.Tables.fanout(
      fallbackIds.join(points.select(col("id").as("aid"), col("x").as("ax"),
        col("y").as("ay")), "aid"))
    val fbPart = fbProbes
      .join(points.select(col("id").as("bid"), col("x").as("bx"), col("y").as("by")))
      .filter(col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"),
        (pow(col("ax") - col("bx"), 2) + pow(col("ay") - col("by"), 2)).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)

    // Materialize before releasing the caches (candA feeds both phases and
    // the verdict; a lazy return over unpersisted caches re-runs the pair
    // join, and a still-persisted candA leaks blocks into later queries).
    val out = graft.core.Materialize.cut(exactPart.unionByName(fbPart))
    locs.unpersist(); keptL.unpersist(); candA.unpersist()
    out
  }
}
