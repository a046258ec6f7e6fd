package graft

import graft.sources.{MapPanel, StatPanel}

/** S13 interactive-map parity (VERDICT r11 item 3): every number and
  * coordinate in the emitted map HTML must come from the ORACLE-CHECKED
  * lab1 frames — the map is a view over verified data, never a second
  * computation that can drift (StatPanelSpec pattern). */
class MapPanelSpec extends SparkSpec {

  test("lab1 map panel embeds the oracle-checked cluster data, self-contained") {
    // sf0.01: the smallest corpus where DBSCAN finds clusters (at sf0.001
    // all 201 points are noise and the sink refuses, like the reference).
    val dir = "/root/testdata/sf0.01"
    val out = java.nio.file.Files.createTempDirectory("graft-mappanel").toString
    MapPanel.writeLab1MapPanel(spark, dir, out)
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/map_panel.html"))

    // reference numbers from the same labeled frame the oracle-checked
    // lab1/m1 queries aggregate
    val labeled = StatPanel.lab1Labeled(spark, dir)
    val total = labeled.count()
    val noise = labeled.filter("label = -1").count()
    val sizes = labeled.filter("label >= 0").groupBy("label").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // heat layer covers ALL labeled points (test.py:478 heat_data)
    val heatRe = """const heatData = (\[.*?\]);\n""".r
    val heat = heatRe.findFirstMatchIn(html).getOrElse(fail("no heatData")).group(1)
    assert("""\[-?[0-9.]+,-?[0-9.]+\]""".r.findAllIn(heat).size === total.toInt)

    // per-cluster entries: id, n, palette color in sorted-id order
    val clRe = """\{"id":(-?\d+),"n":(\d+),"color":"(#[0-9a-f]{6})"""".r
    val cls = clRe.findAllMatchIn(html)
      .map(m => (m.group(1).toLong, m.group(2).toLong, m.group(3))).toSeq
    assert(cls.map(_._1).toSet === sizes.keySet)
    cls.foreach { case (cid, n, color) =>
      assert(n === sizes(cid), s"cluster $cid size")
    }
    val sortedIds = cls.map(_._1).sorted
    cls.foreach { case (cid, _, color) =>
      val idx = sortedIds.indexOf(cid)
      assert(color === MapPanel.Palette(idx % MapPanel.Palette.length),
        s"cluster $cid palette position")
    }

    // noise layer count
    assert(html.contains(s""""n":$noise,"pts":"""), s"noise n=$noise")

    // center = mean of CLUSTERED points (visualize_noise.py:146-148)
    val pts = MapPanel.lab1MapRows(spark, dir)
      .filter("layer = 'cluster'")
      .agg(org.apache.spark.sql.functions.avg("lat"),
        org.apache.spark.sql.functions.avg("lon")).head()
    val fmt = (v: Double) =>
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    assert(html.contains(s"const center = [${fmt(pts.getDouble(0))}, ${fmt(pts.getDouble(1))}];"))

    // the reference's four interaction surfaces are all present
    assert(html.contains("layer-heat") && html.contains("layer-noise") &&
      html.contains("layer-clusters") && html.contains("onwheel"))
    // self-contained: no external references (the svg xmlns URI is inert
    // markup, not a fetch)
    assert(!html.contains("src=") && !html.contains("href="))
    assert(!html.replace("http://www.w3.org/2000/svg", "").contains("http"))

    // the JSON report is the engine-side artifact: row count = total points
    val rows = spark.read
      .schema("layer STRING, cluster_id LONG, lat DOUBLE, lon DOUBLE")
      .json(s"$out/rows")
    assert(rows.count() === total)
  }

  test("all-noise corpus refuses the map like the reference (visualize_noise.py:141-143)") {
    // sf0.001: DBSCAN labels all 201 points noise — the reference prints
    // "无有效簇" and skips folium; the sink must fail loudly, not render
    // a map centered on nothing.
    val out = java.nio.file.Files.createTempDirectory("graft-mappanel-noise").toString
    val e = intercept[IllegalArgumentException] {
      MapPanel.writeLab1MapPanel(spark, "/root/testdata/sf0.001", out)
    }
    assert(e.getMessage.contains("no clustered points"))
  }
}
