package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PNG chart sink (S13 chart parity; VERDICT r11 item 5) — the reference
  * saves matplotlib figures for every lab: the lab-2 feature-importance bar
  * chart (实习二/实习二代码/lx_lightgbmTest.py:190-198 — top-k importances,
  * `plt.bar`, savefig 'feature_importance.png'; ycyLightGBM…py:191 same)
  * and the lab-1 hourly complaint distribution
  * (实习一/实习一代码/visualize_noise.py:61-, savefig via _save_fig_as_png).
  *
  * Split as in StatPanel/MapPanel: chart DATA is engine work (oracle-
  * checked aggregate rows, landed via writeReportJson), the chart DOCUMENT
  * is driver work — here a deterministic pure-JVM rasterizer feeding the
  * repo's own `sources.Png` encoder, so the artifact is a REAL compressed
  * PNG with no imaging library. Every bar's pixel geometry is integer
  * arithmetic over the aggregate values, which is what lets ChartSpec
  * decode the emitted file and assert bar-pixel sums against the
  * oracle-checked numbers exactly.
  */
object Chart {

  /** Bar fill — the stat panel's #4a7fb5. */
  val BarColor: (Int, Int, Int) = (0x4a, 0x7f, 0xb5)
  val AxisColor: (Int, Int, Int) = (0x22, 0x22, 0x22)

  /** Integer bar geometry: `n` slots over the plot width, bars fill 8/10
    * of a slot (matplotlib's default bar width 0.8), centered in the slot.
    * Returns (x0, barWidth) per bar. Exposed so the spec derives expected
    * pixel rectangles from the same arithmetic. */
  def barRects(n: Int, width: Int = 800, height: Int = 600): Seq[(Int, Int)] = {
    val (left, right) = (50, 20)
    val plotW = width - left - right
    val slot = plotW / math.max(1, n)
    val barW = math.max(1, slot * 8 / 10)
    val gap = (slot - barW) / 2
    (0 until n).map(i => (left + i * slot + gap, barW))
  }

  /** Bar height in pixels: value-proportional against the max, over the
    * plot height. Exposed for the same reason as [[barRects]]. */
  def barHeightPx(v: Double, maxV: Double, height: Int = 600): Int = {
    val plotH = height - 30 - 40
    if (maxV <= 0.0 || v <= 0.0) 0 else math.round(v / maxV * plotH).toInt
  }

  /** Deterministic bar-chart raster: white ground, 1-px axes, solid
    * [[BarColor]] bars. RGB, row-major. */
  def barChart(values: Seq[Double], width: Int = 800, height: Int = 600): Png.Image = {
    require(values.nonEmpty, "bar chart needs at least one value")
    require(values.forall(_ >= 0.0), "bar values must be non-negative")
    val (top, bottom) = (30, 40)
    val left = 50
    val plotH = height - top - bottom
    val px = Array.fill[Byte](width * height * 3)(0xff.toByte)
    def set(x: Int, y: Int, c: (Int, Int, Int)): Unit =
      if (x >= 0 && x < width && y >= 0 && y < height) {
        val o = (y * width + x) * 3
        px(o) = c._1.toByte; px(o + 1) = c._2.toByte; px(o + 2) = c._3.toByte
      }
    val maxV = values.max
    val rects = barRects(values.size, width, height)
    values.zip(rects).foreach { case (v, (x0, barW)) =>
      val h = barHeightPx(v, maxV, height)
      var y = top + plotH - h
      while (y < top + plotH) {
        var x = x0
        while (x < x0 + barW) { set(x, y, BarColor); x += 1 }
        y += 1
      }
    }
    // axes last so a full-height bar can't overwrite the baseline
    val xAxisY = top + plotH
    (left - 1 until width - 20).foreach(x => set(x, xAxisY, AxisColor))
    (top until xAxisY + 1).foreach(y => set(left - 1, y, AxisColor))
    Png.Image(width, height, 3, px)
  }

  private def writePng(img: Png.Image, path: String): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), Png.encode(img)): Unit
  }

  /** Lab-1 hourly-distribution chart (visualize_noise.py:61-): the SAME
    * oracle-checked hourly aggregate StatPanel renders, landed as a JSON
    * report and rasterized FROM the re-read rows — ALWAYS 24 bars in hour
    * order. The panel's hourly section is a plain groupBy with no
    * densification, so a corpus with a zero-complaint hour would otherwise
    * silently shift every later bar's position (ADVICE r12): the reader
    * zero-fills against the full 0..23 domain before rendering, and the
    * sink itself asserts the 24-bar invariant rather than leaving it to
    * the spec's corpus. */
  def writeLab1HourlyPng(s: SparkSession, dir: String, outPath: String): Unit = {
    val rows = StatPanel.lab1PanelRows(s, dir).filter(col("section") === "hourly")
    IO.writeReportJson(rows, s"$outPath/hourly_rows")
    val back = s.read.schema("section STRING, key STRING, value DOUBLE")
      .json(s"$outPath/hourly_rows").collect()
      .map(r => r.getString(1).toInt -> r.getDouble(2)).toMap
    require(back.keySet.subsetOf((0 until 24).toSet),
      s"hourly rows outside 0..23: ${back.keySet.filterNot((0 until 24).contains).toSeq.sorted.mkString(",")}")
    val dense = (0 until 24).map(h => back.getOrElse(h, 0.0))
    require(dense.size == 24, s"expected 24 hourly bars, got ${dense.size}")
    writePng(barChart(dense), s"$outPath/hourly.png")
  }

  /** Lab-2 feature-importance chart (lx_lightgbmTest.py:190-198): fit the
    * SAME pipeline the oracle-banded m12 query runs (identical features,
    * target, split — MLModelQueries m12), rank importances descending, top
    * k = min(10, n) like the reference, land them as a JSON report, chart
    * from the re-read rows. */
  def writeLab2ImportancePng(s: SparkSession, dir: String, outPath: String): Unit = {
    import graft.core.Tables
    val li = Tables.lineitem(s, dir)
      .withColumn("y", col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * (lit(1.0) + col("l_tax")))
      .withColumn("is_train", pmod(col("l_orderkey") * lit(2654435761L), lit(100L)) < 70)
    val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val (_, _, _, importances) = graft.ml.MlPipelines.gbtFitHpo(
      li.filter(col("is_train")), li.filter(!col("is_train")), feats, "y")
    val k = math.min(10, feats.size)
    val top = feats.zip(importances).sortBy(-_._2).take(k)
    import s.implicits._
    IO.writeReportJson(top.toDF("feature", "importance"),
      s"$outPath/importance_rows")
    val back = s.read.schema("feature STRING, importance DOUBLE")
      .json(s"$outPath/importance_rows").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).sortBy(-_._2)
    writePng(barChart(back.map(_._2).toSeq), s"$outPath/feature_importance.png")
  }
}
