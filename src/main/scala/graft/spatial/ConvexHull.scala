package graft.spatial

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Convex hull as a typed Aggregator (SURVEY.md §2.10; reference
  * MultiPoint.convex_hull at 实习三/…urban_road_network_analysis.ipynb:561):
  * Andrew's monotone chain, with the buffer compacted to its own hull
  * whenever it grows past a bound — so per-partition state is O(hull size),
  * not O(points), and merges are cheap at any scale.
  */
object ConvexHull {

  case class Pt(x: Double, y: Double)
  case class HullStats(n_vertices: Int, area: Double, perimeter: Double)

  private val CompactAt = 256

  /** Monotone-chain hull, counter-clockwise, no collinear points kept.
    * Returns the input for < 3 distinct points. */
  def hull(points: Seq[Pt]): Seq[Pt] = {
    val ps = points.distinct.sortBy(p => (p.x, p.y))
    if (ps.size < 3) return ps
    def cross(o: Pt, a: Pt, b: Pt): Double =
      (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
    def half(src: Seq[Pt]): List[Pt] =
      src.foldLeft(List.empty[Pt]) { (acc, p) =>
        var h = acc
        while (h.size >= 2 && cross(h.tail.head, h.head, p) <= 0) h = h.tail
        p :: h
      }
    val lower = half(ps).reverse.dropRight(1)
    val upper = half(ps.reverse).reverse.dropRight(1)
    lower ++ upper
  }

  def shoelaceArea(h: Seq[Pt]): Double =
    if (h.size < 3) 0.0
    else math.abs(h.indices.map { i =>
      val a = h(i); val b = h((i + 1) % h.size)
      a.x * b.y - b.x * a.y
    }.sum) / 2.0

  def perimeter(h: Seq[Pt]): Double =
    if (h.size < 2) 0.0
    else h.indices.map { i =>
      val a = h(i); val b = h((i + 1) % h.size)
      math.hypot(b.x - a.x, b.y - a.y)
    }.sum

  val statsAggregator: Aggregator[Pt, Seq[Pt], HullStats] =
    new Aggregator[Pt, Seq[Pt], HullStats] {
      def zero: Seq[Pt] = Vector.empty
      def reduce(b: Seq[Pt], a: Pt): Seq[Pt] = {
        val nb = b :+ a
        if (nb.size > CompactAt) hull(nb) else nb
      }
      def merge(b1: Seq[Pt], b2: Seq[Pt]): Seq[Pt] = {
        val nb = b1 ++ b2
        if (nb.size > CompactAt) hull(nb) else nb
      }
      def finish(b: Seq[Pt]): HullStats = {
        val h = hull(b)
        HullStats(h.size, shoelaceArea(h), perimeter(h))
      }
      def bufferEncoder: Encoder[Seq[Pt]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pt]]()
      def outputEncoder: Encoder[HullStats] = Encoders.product[HullStats]
    }

  /** Column form: `convexHullStats(x, y)` → struct(n_vertices, area,
    * perimeter). The product input encoder flattens Pt to two double args. */
  def convexHullStats(x: Column, y: Column): Column =
    udaf(statsAggregator, Encoders.product[Pt]).apply(x, y)
}
