package graft

import graft.sources.{ChartHtml, MapDocs}

/** S13 interactive-chart parity (VERDICT r12 item 4): the three lab-4
  * chart documents embed ONLY values derived from the oracle-checked
  * ranked frame, through public arithmetic the spec replays (ChartSpec /
  * MapDocsSpec pattern). */
class ChartHtmlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val rows = MapDocs.lab4MapRows(spark, dir).collect()
    .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
      r.getAs[Double]("avg_polarity"), r.getAs[Double]("positive_rate"),
      r.getAs[Double]("score"), r.getAs[Double]("lon"), r.getAs[Double]("lat"))).toSeq

  private def fmt(v: Double) =
    String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))

  private def selfContained(html: String): Unit = {
    assert(!html.contains("src=") && !html.contains("href="))
    assert(!html.replace("http://www.w3.org/2000/svg", "").contains("http"))
  }

  test("linregress matches the closed form on a known series") {
    // y = 2x + 1 exactly: slope 2, intercept 1, r² = 1
    val (s1, i1, r1) = ChartHtml.linregress(Seq(0.0, 1.0, 2.0), Seq(1.0, 3.0, 5.0))
    assert(math.abs(s1 - 2.0) < 1e-12 && math.abs(i1 - 1.0) < 1e-12 && math.abs(r1 - 1.0) < 1e-12)
    // constant x: flat through the mean, r² = 0
    val (s2, i2, r2) = ChartHtml.linregress(Seq(1.0, 1.0), Seq(3.0, 5.0))
    assert(s2 === 0.0 && i2 === 4.0 && r2 === 0.0)
  }

  test("binCounts covers every value with the top edge in the last bin") {
    val b = ChartHtml.binCounts(Seq(0.0, 0.5, 1.0, 1.0), 2)
    assert(b === Seq((0.0, 1L), (0.5, 3L)))
    assert(b.map(_._2).sum === 4L)
  }

  test("charts embed the ranked frame through the public arithmetic") {
    val out = java.nio.file.Files.createTempDirectory("graft-chtml").toString
    ChartHtml.writeLab4Charts(spark, dir, out)

    // histogram: bins + mean from binCounts/mean over the frame
    val hist = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/sentiment_distribution.html"))
    val vs = rows.map(_._3)
    val nbins = math.min(50, rows.size)
    val binsJs = ChartHtml.binCounts(vs, nbins)
      .map { case (x, c) => s"[${fmt(x)},$c]" }.mkString("[", ",", "]")
    assert(hist.contains(s"const bins = $binsJs;"), "bin array verbatim")
    assert(hist.contains(s"const meanV = ${fmt(vs.sum / vs.size)};"), "mean vline")
    selfContained(hist)

    // scatter: every point with the ramp color + the replayed regression
    val sc = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/rate_vs_polarity.html"))
    val (slope, intercept, r2) = ChartHtml.linregress(rows.map(_._4), rows.map(_._3))
    assert(sc.contains(
      s"const slope = ${fmt(slope)}, intercept = ${fmt(intercept)}, r2 = ${fmt(r2)};"))
    val (minP, maxP) = (vs.min, vs.max)
    val maxN = rows.map(_._2).max.toDouble
    rows.foreach { r =>
      val expect = s"""{"name":"${r._1}","x":${fmt(r._4)},"y":${fmt(r._3)},"n":${r._2},""" +
        s""""color":"${ChartHtml.rdylgn(r._3, minP, maxP)}","s":${fmt(3 + 9 * math.sqrt(r._2 / maxN))}}"""
      assert(sc.contains(expect), s"scatter point ${r._1}")
    }
    selfContained(sc)

    // 3d: every point with lon/lat/z and the same ramp
    val s3 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/scatter_3d.html"))
    rows.foreach { r =>
      assert(s3.contains(s""""lon":${fmt(r._6)},"lat":${fmt(r._7)},"z":${fmt(r._3)},"n":${r._2},"color":"${ChartHtml.rdylgn(r._3, minP, maxP)}""""),
        s"3d point ${r._1}")
    }
    // plotly's 3-D interaction surface: drag-to-rotate redraw
    assert(s3.contains("function onDrag") && s3.contains("drag to rotate"))
    selfContained(s3)

    // the JSON report is the engine-side artifact
    val back = spark.read.schema(
      "source STRING, n_docs LONG, avg_polarity DOUBLE, positive_rate DOUBLE, " +
        "score DOUBLE, lon DOUBLE, lat DOUBLE").json(s"$out/rows")
    assert(back.count() === rows.size.toLong)
  }
}
