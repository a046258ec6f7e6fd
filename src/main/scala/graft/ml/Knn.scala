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
  */
object Knn {

  /** `points`: (id, x, y). Returns (id, nbr_id, d2, rn) with rn = 1..k by
    * ascending squared distance, ties broken by neighbor id. */
  def neighbors(points: DataFrame, k: Int, cellSize: Double,
                maxCellCount: Int = graft.ops.GridGuard.DefaultMaxCellCount): DataFrame = {
    val pts = points.select(col("id"), col("x"), col("y"),
        floor(col("x") / cellSize).as("cx"), floor(col("y") / cellSize).as("cy"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // One dense cell makes the candidate join below quadratic — fail loudly first.
    graft.ops.GridGuard.requireBoundedCells(pts, Seq("cx", "cy"), maxCellCount, "grid kNN")

    val probes = pts.select(col("id").as("aid"), col("x").as("ax"), col("y").as("ay"),
        col("cx"), col("cy"))
      .withColumn("ncx", explode(array(col("cx") - 1, col("cx"), col("cx") + 1)))
      .withColumn("ncy", explode(array(col("cy") - 1, col("cy"), col("cy") + 1)))
    val targets = pts.select(col("id").as("bid"), col("x").as("bx"), col("y").as("by"),
      col("cx").as("ncx"), col("cy").as("ncy"))
    val w = Window.partitionBy("aid").orderBy(col("d2"), col("bid"))
    val candA = probes.join(targets, Seq("ncx", "ncy"))
      .filter(col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"),
        (pow(col("ax") - col("bx"), 2) + pow(col("ay") - col("by"), 2)).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Exactness test: k candidates found and the k-th lies within one cell.
    val verdict = candA.groupBy("aid")
      .agg(count(lit(1)).as("n_cand"), max("d2").as("max_d2"))
      .withColumn("exact",
        col("n_cand") >= k && col("max_d2") <= lit(cellSize * cellSize))
    val exactIds = verdict.filter(col("exact")).select("aid")
    val fallbackIds = pts.select(col("id").as("aid"))
      .join(exactIds, Seq("aid"), "left_anti")

    val exactPart = candA.join(exactIds, Seq("aid"), "left_semi")

    // Phase B: full scan for the (tiny) fallback set only. The probe side
    // must be spread first: the cross join's parallelism is the left side's
    // partition count, and AQE coalesces the small anti-join output to ONE
    // partition — measured as a single task computing |fallback|×n distances
    // while 31 cores idled.
    val fbProbes = graft.core.Tables.fanout(
      fallbackIds.join(pts.withColumnRenamed("id", "aid"), "aid")
        .select(col("aid"), col("x").as("ax"), col("y").as("ay")))
    val fbPart = fbProbes
      .join(pts.select(col("id").as("bid"), col("x").as("bx"), col("y").as("by")))
      .filter(col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"),
        (pow(col("ax") - col("bx"), 2) + pow(col("ay") - col("by"), 2)).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)

    // Materialize before releasing the caches (candA feeds both phases and
    // the verdict; a lazy return over unpersisted caches re-runs the pair
    // join, and a still-persisted candA leaks blocks into later queries).
    val out = graft.core.Materialize.cut(exactPart.unionByName(fbPart))
    pts.unpersist(); candA.unpersist()
    out
  }
}
