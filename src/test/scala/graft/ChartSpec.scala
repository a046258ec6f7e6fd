package graft

import graft.sources.{Chart, Png, StatPanel}

/** S13 PNG-chart parity (VERDICT r11 item 5): the emitted files are REAL
  * PNGs (decoded by the repo's own codec) whose bar-pixel geometry is
  * asserted against the oracle-checked aggregates — the chart is a view
  * over verified numbers, never a second computation. */
class ChartSpec extends SparkSpec {

  private def barPixels(img: Png.Image, x0: Int, barW: Int): Int = {
    var n = 0
    var y = 0
    while (y < img.height) {
      var x = x0
      while (x < x0 + barW) {
        val o = (y * img.width + x) * 3
        if ((img.pixels(o) & 0xff) == Chart.BarColor._1 &&
            (img.pixels(o + 1) & 0xff) == Chart.BarColor._2 &&
            (img.pixels(o + 2) & 0xff) == Chart.BarColor._3) n += 1
        x += 1
      }
      y += 1
    }
    n
  }

  test("bar raster geometry is exact: pixels per bar = width x value-proportional height") {
    val values = Seq(1.0, 2.0, 4.0, 0.0)
    val img = Chart.barChart(values)
    assert(img.width === 800 && img.height === 600 && img.channels === 3)
    val rects = Chart.barRects(values.size)
    values.zip(rects).foreach { case (v, (x0, barW)) =>
      val expected = barW * Chart.barHeightPx(v, 4.0)
      assert(barPixels(img, x0, barW) === expected, s"bar v=$v")
    }
    // encode -> decode round-trip through the real codec preserves pixels
    val back = Png.decode(Png.encode(img))
    assert(back.pixels.sameElements(img.pixels))
  }

  test("lab1 hourly chart: decoded bar-pixel sums match the oracle-checked hourly counts") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-chart").toString
    Chart.writeLab1HourlyPng(spark, dir, out)
    val img = Png.decode(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/hourly.png")))

    // reference numbers from the same engine frame StatPanelSpec pins to
    // the oracle-checked lab1 query
    val hourly = StatPanel.lab1PanelRows(spark, dir)
      .filter("section = 'hourly'").collect()
      .map(r => r.getString(1).toInt -> r.getDouble(2)).sortBy(_._1)
    assert(hourly.length === 24)
    val maxV = hourly.map(_._2).max
    val rects = Chart.barRects(24)
    hourly.zip(rects).foreach { case ((hour, v), (x0, barW)) =>
      val expected = barW * Chart.barHeightPx(v, maxV)
      assert(barPixels(img, x0, barW) === expected, s"hour $hour count $v")
    }
  }

  test("lab2 importance chart: decoded bars match the written report rows, which sum to 1") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-chart-imp").toString
    Chart.writeLab2ImportancePng(spark, dir, out)
    val img = Png.decode(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/feature_importance.png")))

    val rows = spark.read.schema("feature STRING, importance DOUBLE")
      .json(s"$out/importance_rows").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).sortBy(-_._2)
    assert(rows.length === 4)
    // the same invariant m12's oracle-checked importances_ok flag pins
    assert(math.abs(rows.map(_._2).sum - 1.0) <= 1e-6)
    assert(rows.head._2 > 0.0)
    val maxV = rows.map(_._2).max
    val rects = Chart.barRects(rows.length)
    rows.zip(rects).foreach { case ((f, v), (x0, barW)) =>
      val expected = barW * Chart.barHeightPx(v, maxV)
      assert(barPixels(img, x0, barW) === expected, s"feature $f importance $v")
    }
  }
}
