package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-density guard for grid-bucketed pair joins (DBSCAN, grid kNN).
  *
  * The 3×3-cell equi-join is Θ(Σ cell²): linear in practice, but ONE
  * pathological cell (all points coincident at grid scale — a geocoding
  * default, a sensor stuck at a fixed coordinate) silently turns the plan
  * quadratic. The guard is an O(n) aggregation against the Θ(Σ cell²) join
  * it protects, and fails loudly with the remediation instead of letting a
  * 100 TB job run n² — the VERDICT-identified last theoretical n² corner.
  */
object GridGuard {

  /** Default cap: 10⁴ points/cell bounds the densest cell's pair fanout at
    * ~10⁸ — heavy but finishable; beyond that the job is better failed. */
  val DefaultMaxCellCount = 10000

  def requireBoundedCells(pts: DataFrame, cellCols: Seq[String], cap: Int,
                          op: String): Unit = {
    val worst = pts.groupBy(cellCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(max("n"), lit(0L)).as("mx")).head().getLong(0)
    require(worst <= cap,
      s"$op: densest grid cell holds $worst points (cap $cap) — the candidate " +
        s"pair join would generate ~$worst² pairs from that cell alone. Shrink " +
        "the cell size (eps), pre-aggregate coincident points, or raise the " +
        "cap explicitly if the quadratic cost is intended.")
  }
}
