package graft.sources

import graft.core.Tables
import graft.ml.Dbscan
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lab-1 statistics panel (S13 chart/stat-panel parity; reference
  * 实习一/实习一代码/stat_html.py:119- renders a jinja2+echarts panel of
  * total/clustered/noise tiles, top-5 cluster distribution, hourly and
  * day-of-week complaint profiles).
  *
  * Split the reference does implicitly: the panel DATA is engine work
  * (aggregations over the full dataset — runs distributed, lands as
  * writeReportJson rows), the panel DOCUMENT is driver work (a self-
  * contained HTML string over ≤40 aggregate rows — no CDN dependency, so
  * the artifact renders offline). The aggregate numbers are the same ones
  * the oracle-checked lab1 query emits, which is what StatPanelSpec pins.
  */
object StatPanel {

  /** Panel rows over the lab-1 inputs: (section, key, value).
    * Sections: `summary` (total_points, clustered_count, clustered_pct,
    * noise_count, noise_pct, cluster_count), `clusters` (top-5 sizes by
    * rank), `hourly` (hour-of-day 0-23 counts), `daily` (day-of-week
    * 0=Monday counts — pandas dayofweek convention). */
  /** The lab-1 DBSCAN-labeled complaint points `(id, x, y, label)` — shared
    * by the stat panel, the map panel, and the report bundle; identical
    * inputs to the oracle-checked lab1 query. Parquet-staged once per
    * (application, dir): the bundle renders three artifacts over this one
    * frame, and re-running the pointer-jump DBSCAN per sink is the kind of
    * cost that triples silently (ops.Staged — same reasoning as the shared
    * shingle index). */
  def lab1Labeled(s: SparkSession, dir: String): DataFrame =
    graft.ops.Staged(s, s"lab1labeled:$dir") {
      val ev = Tables.events(s, dir)
        .filter(col("event_type") === "error")
        .dropDuplicates("event_id")
      val pts = Tables.withSyntheticPoint(ev, "event_id")
        .filter(col("lon").between(-74.3, -73.7) && col("lat").between(40.5, 41.0))
      Dbscan.run(
        pts.select(col("event_id").as("id"), col("lon").as("x"), col("lat").as("y")),
        eps = 0.017, minPts = 5)
    }

  def lab1PanelRows(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .dropDuplicates("event_id")
    val labeled = lab1Labeled(s, dir)
    val sizes = labeled.groupBy("label").agg(count(lit(1)).as("n"))

    val summary = sizes.agg(
        sum("n").as("total_points"),
        coalesce(sum(when(col("label") === -1, col("n"))), lit(0L)).as("noise_count"),
        sum(when(col("label") >= 0, lit(1)).otherwise(lit(0))).as("cluster_count"))
      .withColumn("clustered_count", col("total_points") - col("noise_count"))
      .withColumn("clustered_pct",
        round(col("clustered_count") * 100.0 / col("total_points"), 4))
      .withColumn("noise_pct",
        round(col("noise_count") * 100.0 / col("total_points"), 4))
      .select(explode(map(
        lit("total_points"), col("total_points").cast("double"),
        lit("clustered_count"), col("clustered_count").cast("double"),
        lit("clustered_pct"), col("clustered_pct"),
        lit("noise_count"), col("noise_count").cast("double"),
        lit("noise_pct"), col("noise_pct"),
        lit("cluster_count"), col("cluster_count").cast("double"))).as(Seq("key", "value")))
      .withColumn("section", lit("summary"))

    // top-5 clusters: orderBy.limit keeps this a TakeOrderedAndProject, the
    // 5-row rank comes from a broadcast self-count (no global window)
    val top5 = sizes.filter(col("label") >= 0)
      .orderBy(desc("n"), col("label")).limit(5)
    val clusters = top5
      .join(broadcast(top5.select(col("n").as("n2"), col("label").as("l2"))),
        col("n2") > col("n") || (col("n2") === col("n") && col("l2") <= col("label")))
      .groupBy(col("label"), col("n"))
      .agg(count(lit(1)).as("rank"))
      .select(lit("clusters").as("section"), col("rank").cast("string").as("key"),
        col("n").cast("double").as("value"))

    val hourly = ev
      .groupBy(expr("(ts_ns div 3600000000000) % 24").as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("hourly").as("section"), col("key").cast("string"), col("value"))

    // epoch day 0 = Thursday; +3 mod 7 gives the pandas Monday=0 convention
    val daily = ev
      .groupBy(expr("((ts_ns div 86400000000000) + 3) % 7").as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("daily").as("section"), col("key").cast("string"), col("value"))

    summary.select("section", "key", "value")
      .unionByName(clusters).unionByName(hourly).unionByName(daily)
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Driver-side panel document over the collected aggregate rows: stat
    * tiles for the summary, value-proportional bars for the distributions.
    * Self-contained (inline CSS, no external scripts). */
  def renderHtml(rows: Seq[(String, String, Double)], title: String): String = {
    val bySection = rows.groupBy(_._1)
    def num(v: Double): String =
      if (v == math.rint(v)) f"${v.toLong}%d"
      else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val summary = bySection.getOrElse("summary", Seq.empty).map(r => r._2 -> r._3).toMap
    val tiles = Seq(
      "total_points" -> "Total points", "clustered_count" -> "Clustered",
      "clustered_pct" -> "Clustered %", "noise_count" -> "Noise",
      "noise_pct" -> "Noise %", "cluster_count" -> "Clusters").collect {
      case (k, label) if summary.contains(k) =>
        s"""<div class="tile"><div class="v" id="$k">${num(summary(k))}</div>""" +
          s"""<div class="l">${esc(label)}</div></div>"""
    }.mkString("\n")
    def bars(section: String, heading: String, keyLabel: String => String): String = {
      val data = bySection.getOrElse(section, Seq.empty)
        .map(r => r._2 -> r._3).sortBy { case (k, _) => (k.length, k) }
      if (data.isEmpty) ""
      else {
        val mx = math.max(data.map(_._2).max, 1.0)
        val rows = data.map { case (k, v) =>
          val w = math.max(1, (v / mx * 100).round)
          s"""<div class="row"><span class="k">${esc(keyLabel(k))}</span>""" +
            s"""<span class="bar" style="width:$w%"></span>""" +
            s"""<span class="n">${num(v)}</span></div>"""
        }.mkString("\n")
        s"""<h2>${esc(heading)}</h2><div class="chart" id="$section">\n$rows\n</div>"""
      }
    }
    val dayNames = Array("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
    s"""<!DOCTYPE html><html><head><meta charset="UTF-8"><title>${esc(title)}</title>
       |<style>
       |body{font-family:sans-serif;background:#f8f9fa;margin:20px}
       |.tiles{display:flex;gap:12px;flex-wrap:wrap}
       |.tile{background:#fff;border:1px solid #e0e0e0;border-radius:8px;padding:14px 20px;min-width:110px}
       |.tile .v{font-size:22px;font-weight:600}.tile .l{color:#666;font-size:12px}
       |.chart{max-width:640px}.row{display:flex;align-items:center;gap:8px;margin:2px 0}
       |.row .k{width:60px;color:#444;font-size:12px;text-align:right}
       |.row .bar{background:#4a7fb5;height:12px;border-radius:2px;display:inline-block}
       |.row .n{font-size:12px;color:#222}
       |</style></head><body>
       |<h1>${esc(title)}</h1>
       |<div class="tiles">
       |$tiles
       |</div>
       |${bars("clusters", "Top clusters", k => s"#$k")}
       |${bars("hourly", "Complaints by hour", k => f"${k.toInt}%02d:00")}
       |${bars("daily", "Complaints by weekday", k => dayNames(k.toInt % 7))}
       |</body></html>
       |""".stripMargin
  }

  /** Full sink: panel rows land as a JSON-lines report (the engine-side
    * artifact), then the driver re-reads that report and renders the
    * self-contained HTML document next to it. */
  def writeLab1Panel(s: SparkSession, dir: String, outPath: String,
                     title: String = "Noise complaint statistics"): Unit = {
    val rowsDf = lab1PanelRows(s, dir)
    IO.writeReportJson(rowsDf, s"$outPath/rows")
    // render FROM the written report (proves the JSON artifact carries
    // everything the panel needs, not the in-memory frame)
    val back = s.read.schema("section STRING, key STRING, value DOUBLE")
      .json(s"$outPath/rows").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outPath/panel.html"), renderHtml(back, title))
  }

  /** Cluster map panel (the reference's folium cluster map, 实习一/
    * 实习一代码/test.py:621, rendered dependency-free): the labeled points
    * land as an SVG scatter in bbox coordinates, clusters colored from a
    * fixed palette, noise gray. Single-file exchange artifact like the Shp/
    * GeoTiff exports — capped, loud failure above `maxPoints`. */
  def renderMapSvg(pts: Seq[(Double, Double, Long)],
      bbox: (Double, Double, Double, Double), title: String): String = {
    val (lon0, lat0, lon1, lat1) = bbox
    val (w, h) = (800.0, 600.0)
    val palette = Array("#d62728", "#1f77b4", "#2ca02c", "#ff7f0e", "#9467bd",
      "#8c564b", "#e377c2", "#17becf")
    def fx(lon: Double) = (lon - lon0) / (lon1 - lon0) * w
    def fy(lat: Double) = h - (lat - lat0) / (lat1 - lat0) * h
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val circles = pts.map { case (lon, lat, label) =>
      val cls = if (label < 0) "noise" else s"c${label % palette.length}"
      val fill = if (label < 0) "#9aa0a6" else palette((label % palette.length).toInt)
      s"""<circle class="$cls" cx="${fmt(fx(lon))}" cy="${fmt(fy(lat))}" r="3" fill="$fill" fill-opacity="0.75"/>"""
    }.mkString("\n")
    s"""<!DOCTYPE html><html><head><meta charset="UTF-8"><title>${esc(title)}</title></head>
       |<body><h1>${esc(title)}</h1>
       |<svg viewBox="0 0 ${w.toInt} ${h.toInt}" width="${w.toInt}" height="${h.toInt}"
       |  style="border:1px solid #ccc;background:#fafafa">
       |$circles
       |</svg>
       |<p>bbox [${fmt(lon0)}, ${fmt(lat0)}] – [${fmt(lon1)}, ${fmt(lat1)}];
       |noise gray, clusters colored.</p></body></html>""".stripMargin
  }

  def writeLab1Map(s: SparkSession, dir: String, outPath: String,
      title: String = "Noise complaint clusters", maxPoints: Int = 100000): Unit = {
    val labeled = lab1Labeled(s, dir)
    val n = labeled.count()
    require(n <= maxPoints,
      s"writeLab1Map is a single-file exchange export capped at $maxPoints points; got $n")
    val pts = labeled.join(
        Tables.withSyntheticPoint(labeled.select(col("id")), "id"), "id")
      .select(col("lon"), col("lat"), col("label"))
      .orderBy("lon", "lat", "label")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outPath))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outPath/map.html"),
      renderMapSvg(pts, (-74.3, 40.5, -73.7, 41.0), title)): Unit
  }
}
