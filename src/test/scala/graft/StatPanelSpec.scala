package graft

import graft.sources.StatPanel

/** S13 stat-panel parity: the rendered lab-1 panel's aggregate numbers must
  * match the ORACLE-CHECKED lab1 pipeline query on the same inputs — the
  * panel is a view over verified aggregates, never a second computation
  * that can drift. */
class StatPanelSpec extends SparkSpec {

  test("lab1 map panel renders every labeled point, noise gray") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-map").toString
    StatPanel.writeLab1Map(spark, dir, out)
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/map.html"))

    val labeled = StatPanel.lab1Labeled(spark, dir)
    val total = labeled.count()
    val noise = labeled.filter("label = -1").count()
    assert("<circle ".r.findAllIn(html).size === total.toInt, s"total=$total")
    assert("class=\"noise\"".r.findAllIn(html).size === noise.toInt, s"noise=$noise")
    // self-contained artifact: inline SVG only, no scripts or external refs
    assert(!html.contains("<script") && !html.contains("http"))
    // bbox mapping puts every point inside the viewport
    val cx = """cx="([0-9.]+)"""".r
    assert(cx.findAllMatchIn(html).forall { m =>
      val v = m.group(1).toDouble; v >= 0.0 && v <= 800.0
    })
  }

  test("lab1 panel renders from report rows and matches the oracle-checked query") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-panel").toString
    StatPanel.writeLab1Panel(spark, dir, out)

    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/panel.html"))
    // oracle-checked reference numbers from the lab1 query itself
    val lab1 = SparkEntry.queries("lab1_noise_hotspots")(spark, dir).head()
    val nClusters = lab1.getAs[Long]("n_clusters")
    val nNoise = lab1.getAs[Long]("n_noise")
    val nPoints = lab1.getAs[Long]("n_points")

    assert(html.contains(s"""<div class="v" id="total_points">$nPoints</div>"""), html.take(800))
    assert(html.contains(s"""<div class="v" id="noise_count">$nNoise</div>"""))
    assert(html.contains(s"""<div class="v" id="cluster_count">$nClusters</div>"""))
    assert(html.contains(s"""<div class="v" id="clustered_count">${nPoints - nNoise}</div>"""))
    // distribution sections render with 24 hour rows summing to the total
    // error-event count (hourly profile is over events, like the reference)
    assert(html.contains("""<div class="chart" id="hourly">"""))
    assert(html.contains("""<div class="chart" id="daily">"""))
    // self-contained: no external scripts, escaped markup only
    assert(!html.contains("<script"))

    // the JSON report itself is the engine-side artifact: hourly counts sum
    // to the deduped error-event count
    val rows = spark.read.schema("section STRING, key STRING, value DOUBLE")
      .json(s"$out/rows")
    val hourlySum = rows.filter("section = 'hourly'")
      .agg(org.apache.spark.sql.functions.sum("value")).head().getDouble(0)
    val dailySum = rows.filter("section = 'daily'")
      .agg(org.apache.spark.sql.functions.sum("value")).head().getDouble(0)
    assert(hourlySum === dailySum) // same event universe, two profiles
  }
}
