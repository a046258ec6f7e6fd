package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Convex-polygon containment as a plan-time-expanded column predicate
  * (SURVEY.md §1.2 geometry model: points + axis-aligned cells + convex
  * polygons; reference `gpd.sjoin(..., predicate='within')` —
  * 实习二/…ipynb:638-653, 实习三/…network_analysis.ipynb:807).
  *
  * The polygon is known when the plan is built, so containment expands to a
  * conjunction of half-plane tests — one cross product per edge, all inside
  * whole-stage codegen, no UDF and no geometry runtime. Boundary points
  * count as inside (≥ 0).
  */
object PointInPolygon {

  /** True when (x, y) lies in the convex polygon given by CCW `vertices`. */
  def containsConvex(x: Column, y: Column, vertices: Seq[(Double, Double)]): Column = {
    require(vertices.size >= 3, "polygon needs >= 3 vertices")
    vertices.indices.map { i =>
      val (ax, ay) = vertices(i)
      val (bx, by) = vertices((i + 1) % vertices.size)
      (lit(bx - ax) * (y - lit(ay)) - lit(by - ay) * (x - lit(ax))) >= 0
    }.reduce(_ && _)
  }

  /** The identical predicate as SQL text for DuckDB oracles. */
  def containsConvexSql(x: String, y: String, vertices: Seq[(Double, Double)]): String =
    vertices.indices.map { i =>
      val (ax, ay) = vertices(i)
      val (bx, by) = vertices((i + 1) % vertices.size)
      s"(${bx - ax} * (($y) - $ay) - ${by - ay} * (($x) - $ax)) >= 0"
    }.mkString("(", " AND ", ")")
}
