package graft

import graft.sources.MapDocs
import org.apache.spark.sql.functions._

/** S13 lab-3/lab-4 map parity (VERDICT r12 items 3–4): every coordinate
  * and number the emitted documents embed must come from the ORACLE-CHECKED
  * frames (g2b/g3/g3b/g6/g7 builders; the lab4 ranked frame) — the maps are
  * views over verified data, never a second computation (MapPanelSpec
  * pattern). */
class MapDocsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("lab3 map embeds the oracle-checked route/isochrone/poi/grid frames") {
    val out = java.nio.file.Files.createTempDirectory("graft-map3").toString
    MapDocs.writeLab3MapPanel(spark, dir, out)
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/map_lab3.html"))
    val fmt = (v: Double) =>
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))

    // route polyline: the g2b frame's vertices, in seq order
    val route = graft.queries.GraphQueries.routeVertices(spark, dir)
      .orderBy("seq").collect()
      .map(r => (r.getAs[Double]("lat"), r.getAs[Double]("lon")))
    val routeJs = route.map { case (la, lo) => s"[${fmt(la)},${fmt(lo)}]" }
      .mkString("[", ",", "]")
    assert(html.contains(s"const routePts = $routeJs;"), "route vertices verbatim")

    // isochrone: every reachable node present with its cost; hull vertex
    // count = the SAME hull function over the same points
    val reach = graft.queries.GraphQueries.reachNodes(spark, dir).collect()
      .map(r => (r.getAs[Double]("lon"), r.getAs[Double]("lat"), r.getAs[Long]("dist")))
    reach.foreach { case (lo, la, d) =>
      assert(html.contains(s"""{"p":[${fmt(la)},${fmt(lo)}],"d":$d}"""), s"reach node $lo,$la")
    }
    val hull = graft.spatial.ConvexHull.hull(
      reach.map(p => graft.spatial.ConvexHull.Pt(p._1, p._2)).toSeq.distinct)
    val hullJs = hull.map(p => s"[${fmt(p.y)},${fmt(p.x)}]").mkString("[", ",", "]")
    assert(html.contains(s"const hullPts = $hullJs;"), "hull ring verbatim")

    // POI stats table: per-tag totals/inside from the g7 frame (the same
    // numbers the oracle-checked g7 aggregate reports)
    val poi = graft.queries.GraphQueries.poiPoints(spark, dir)
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("acc").as("in"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    poi.foreach { case (tag, n, in) =>
      assert(html.contains(s"""{"tag":"$tag","total":$n,"inside":$in}"""), s"poi stats $tag")
    }

    // grid choropleth: every g6 cell with the ramp color derived by the
    // same arithmetic
    val cells = graft.queries.GraphQueries.gridCells(spark, dir).collect()
      .map(r => (r.getAs[Long]("cx"), r.getAs[Long]("cy"),
        r.getAs[Long]("n_nodes"), r.getAs[Double]("degree_density")))
    val (minD, maxD) = (cells.map(_._4).min, cells.map(_._4).max)
    cells.foreach { case (cx, cy, n, d) =>
      val (lon, lat) = (cx * 0.1 - 74.3, cy * 0.1 + 40.5)
      val expect = s"""{"lon":${fmt(lon)},"lat":${fmt(lat)},"n":$n,"d":${fmt(d)},""" +
        s""""color":"${MapDocs.ylgnColor(d, minD, maxD)}"}"""
      assert(html.contains(expect), s"grid cell $cx,$cy")
    }

    // interaction surfaces + self-contained (no external fetches)
    assert(html.contains("layer-grid") && html.contains("layer-iso") &&
      html.contains("layer-route") && html.contains("onwheel"))
    // POI layers exist per tag (ids are JS-concatenated 'layer-poi-<tag>-in')
    // with the reference's default visibility: hospital shown, others hidden
    assert(html.contains("'layer-poi-'") && html.contains("l.tag === 'hospital'"))
    poi.foreach { case (tag, _, _) =>
      assert(html.contains(s""""tag":"$tag","color":""""), s"poi layer $tag")
    }
    assert(!html.contains("src=") && !html.contains("href="))
    assert(!html.replace("http://www.w3.org/2000/svg", "").contains("http"))

    // the JSON report is the engine artifact: row count = union of frames
    val rows = spark.read
      .schema("layer STRING, tag STRING, seq LONG, lon DOUBLE, lat DOUBLE, value DOUBLE")
      .json(s"$out/rows")
    assert(rows.count() === MapDocs.lab3MapRows(spark, dir).count())
  }

  test("lab4 map embeds the oracle-checked ranked frame with reference quantile shading") {
    val out = java.nio.file.Files.createTempDirectory("graft-map4").toString
    MapDocs.writeLab4MapPanel(spark, dir, out)
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/map_lab4.html"))
    val fmt = (v: Double) =>
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))

    val rows = MapDocs.lab4MapRows(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("avg_polarity"), r.getAs[Double]("positive_rate"),
        r.getAs[Double]("score"), r.getAs[Double]("lon"), r.getAs[Double]("lat")))
    assert(rows.nonEmpty)

    // quantile thresholds: pandas-default linear interpolation over scores
    val scores = rows.map(_._5).sorted.toSeq
    val q75 = MapDocs.quantile(scores, 0.75)
    val q25 = MapDocs.quantile(scores, 0.25)
    assert(html.contains(s"positive threshold (q75): ${fmt(q75)}"))
    assert(html.contains(s"negative threshold (q25): ${fmt(q25)}"))

    // heat layer: one [lat, lon, (score+1)/2] triple per source
    rows.foreach { r =>
      assert(html.contains(s"[${fmt(r._7)},${fmt(r._6)},${fmt((r._5 + 1) / 2)}]"),
        s"heat triple for ${r._1}")
    }

    // positive/negative marker sets carry the reference shade rule
    rows.filter(_._5 >= q75).foreach { r =>
      val expect = s"""{"name":"${r._1}","n":${r._2},"pol":${fmt(r._3)},""" +
        s""""posRate":${fmt(r._4)},"score":${fmt(r._5)},"p":[${fmt(r._7)},${fmt(r._6)}],""" +
        s""""color":"${MapDocs.posShade(r._5, q75)}"}"""
      assert(html.contains(expect), s"positive marker ${r._1}")
    }
    rows.filter(_._5 <= q25).foreach { r =>
      assert(html.contains(s""""score":${fmt(r._5)},"p":[${fmt(r._7)},${fmt(r._6)}],"color":"${MapDocs.negShade(r._5, q25)}"""),
        s"negative marker ${r._1}")
    }

    // center = mean coordinates (reference create_sentiment_map)
    val cLat = rows.map(_._7).sum / rows.size
    val cLon = rows.map(_._6).sum / rows.size
    assert(html.contains(s"const center = [${fmt(cLat)}, ${fmt(cLon)}];"))

    // the reference's five layers + self-contained
    assert(html.contains("layer-heat") && html.contains("layer-pos") &&
      html.contains("layer-neg") && html.contains("layer-top") &&
      html.contains("layer-bot") && html.contains("onwheel"))
    assert(!html.contains("src=") && !html.contains("href="))
    assert(!html.replace("http://www.w3.org/2000/svg", "").contains("http"))
  }

  test("quantile matches the pandas linear-interpolation definition") {
    // pandas: [1,2,3,4].quantile(.25) = 1.75, (.75) = 3.25
    assert(MapDocs.quantile(Seq(1.0, 2.0, 3.0, 4.0), 0.25) === 1.75)
    assert(MapDocs.quantile(Seq(1.0, 2.0, 3.0, 4.0), 0.75) === 3.25)
    assert(MapDocs.quantile(Seq(5.0), 0.75) === 5.0)
  }
}
