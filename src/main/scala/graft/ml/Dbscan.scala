package graft.ml

import graft.graph.GraphOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed DBSCAN (SURVEY.md §2.9 M1; reference sklearn DBSCAN at
  * 实习一/实习一代码/test.py:147-204, eps=500 m, min_samples=5).
  *
  * Algorithm (deterministic — no RNG, no iteration-order dependence):
  *  1. Grid-bucket points at cell size = eps; all ε-neighbors of a point lie
  *     in its 3×3 cell neighborhood, so candidate pairs come from an
  *     equi-join on cell ids (never an n² scan).
  *  2. Core points: ≥ minPts neighbors (self included, sklearn semantics).
  *  3. Clusters: connected components of the core-core ε-graph, computed by
  *     iterative min-label propagation with per-round `localCheckpoint`
  *     (flat lineage — see GraphOps.sssp for why lazy composition is
  *     exponential). The fixpoint label = min core id in the component.
  *  4. Border points: non-core with a core neighbor join the cluster of
  *     their minimum-label core neighbor (deterministic tie-break; sklearn
  *     assigns first-scanned, which is order-dependent — documented
  *     divergence). Everything else is noise, label −1.
  */
object Dbscan {

  /** `points` must have columns (id: long, x: double, y: double).
    * Returns (id, x, y, label, is_core) with label = −1 for noise.
    *
    * Coincident-point collapse (the dense-cell fallback): points sharing an
    * exact coordinate have identical ε-neighborhoods, so DBSCAN over
    * (distinct location, multiplicity) with weighted neighbor counts is
    * EXACTLY the clustering of the original multiset — representative id =
    * min id per location keeps the min-core-id labels unchanged, and every
    * point inherits its location's (label, is_core) on the way out. This
    * removes the realistic quadratic pathology (geocoding defaults, stuck
    * sensors: millions of rows at one coordinate become ONE grid row); the
    * loud GridGuard cap now applies to DISTINCT locations per cell, where
    * exceeding it means the pair join is genuinely quadratic in distinct
    * near-coincident coordinates and the job is better failed. */
  def run(points: DataFrame, eps: Double, minPts: Int, maxIters: Int = 30,
          maxCellCount: Int = graft.ops.GridGuard.DefaultMaxCellCount): DataFrame = {
    val locs = points.groupBy("x", "y")
      .agg(min("id").as("id"), count(lit(1)).as("w"))
    val pts = locs.select(col("id"), col("x"), col("y"), col("w"),
        floor(col("x") / eps).as("cx"), floor(col("y") / eps).as("cy"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // One cell dense in DISTINCT locations makes the pair join quadratic —
    // fail loudly first (coincident mass was already collapsed above).
    graft.ops.GridGuard.requireBoundedCells(pts, Seq("cx", "cy"), maxCellCount, "DBSCAN")

    // 3×3 neighborhood expansion on the left side, equi-join on cells.
    val left = pts.select(col("id").as("aid"), col("x").as("ax"), col("y").as("ay"),
        col("cx"), col("cy"))
      .withColumn("ncx", explode(array(col("cx") - 1, col("cx"), col("cx") + 1)))
      .withColumn("ncy", explode(array(col("cy") - 1, col("cy"), col("cy") + 1)))
    val right = pts.select(col("id").as("bid"), col("x").as("bx"), col("y").as("by"),
      col("w").as("bw"), col("cx").as("ncx"), col("cy").as("ncy"))
    val pairs = left.join(right, Seq("ncx", "ncy"))
      .filter(pow(col("ax") - col("bx"), 2) + pow(col("ay") - col("by"), 2) <= eps * eps)
      .select("aid", "bid", "bw")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Weighted neighbor count: every point at a within-ε location counts
    // (self included via the aid==bid self-pair, whose bw is the full
    // multiplicity — sklearn's self-inclusive semantics).
    val cores = pairs.groupBy("aid").agg(sum("bw").as("n_nbr"))
      .filter(col("n_nbr") >= minPts)
      .select(col("aid").as("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Core-core edges (both directions present since pairs is symmetric).
    val coreEdges = pairs.select("aid", "bid")
      .join(cores.withColumnRenamed("id", "aid"), "aid", "left_semi")
      .join(cores.withColumnRenamed("id", "bid"), "bid", "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Cluster = connected component of the core-core ε-graph (shared
    // star-contraction + pointer-jump implementation; label = min core id).
    // coreEdges includes every core's self-pair, so isolated cores are
    // present as components of their own.
    val labels = GraphOps.connectedComponents(
        coreEdges.select(col("aid").as("src"), col("bid").as("dst")), maxIters)
      .withColumnRenamed("component", "label")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Border points: min core-neighbor label; then assemble full labeling.
    val borderLabels = pairs
      .join(cores.withColumnRenamed("id", "aid"), "aid", "left_anti")
      .join(labels.withColumnRenamed("id", "bid"), "bid")
      .groupBy(col("aid").as("id")).agg(min("label").as("label"))
    val labeled = labels.withColumn("is_core", lit(true))
      .unionByName(borderLabels.withColumn("is_core", lit(false)))
    // Location-level labeling, then expand back to every original point by
    // coordinate (coincident points share their location's label/is_core —
    // exactly the per-id result, since their neighborhoods are identical).
    val locLabeled = pts.select("id", "x", "y")
      .join(labeled, Seq("id"), "left")
      .na.fill(Map("label" -> -1L, "is_core" -> false))
      .select("x", "y", "label", "is_core")
    val out = points.select("id", "x", "y")
      .join(locLabeled, Seq("x", "y"))
      .select("id", "x", "y", "label", "is_core")
      // Materialize BEFORE releasing the intermediates: `out` is lazy, so
      // unpersisting first would silently re-run the grid pair join when the
      // caller evaluates the result (measured as the round-1 m1 bench
      // whale). Materialize.cut also truncates the lineage to a flat scan
      // (reliable checkpoint when a checkpoint dir is configured).
      .transform(graft.core.Materialize.cut)

    pts.unpersist(); pairs.unpersist(); cores.unpersist(); coreEdges.unpersist()
    labels.unpersist()
    out
  }

  /** One-row cluster summary, the shape the reference prints
    * (test.py:172-174: cluster count + noise count). */
  def summary(labeledPoints: DataFrame): DataFrame = {
    val sizes = labeledPoints.groupBy("label").agg(count(lit(1)).as("n"))
    sizes.agg(
      sum(when(col("label") >= 0, lit(1)).otherwise(lit(0))).as("n_clusters"),
      coalesce(sum(when(col("label") === -1, col("n"))), lit(0L)).as("n_noise"),
      sum("n").as("n_points"),
      coalesce(max(when(col("label") >= 0, col("n"))), lit(0L)).as("max_cluster_size"))
  }
}
