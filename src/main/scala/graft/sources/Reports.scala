package graft.sources

import org.apache.spark.sql.SparkSession

/** The complete lab-1 report BUNDLE — the reference's full artifact set in
  * one call, zipped for download the way lab 4 ships its outputs
  * (实习四/实习四代码/yelp_analysis.ipynb:6734-6777):
  *
  *  - `panel/`  — stats panel rows (JSON) + self-contained panel.html
  *                (stat_html.py parity, sources.StatPanel)
  *  - `map/`    — map rows (JSON) + interactive map_panel.html
  *                (folium parity, sources.MapPanel)
  *  - `charts/` — hourly-distribution rows (JSON) + hourly.png
  *                (matplotlib-savefig parity, sources.Chart)
  *  - `report.zip` — every file above, deterministically bundled
  *
  * Every number in every artifact derives from the SAME staged
  * DBSCAN-labeled frame the oracle-checked lab1/m1 queries aggregate
  * (StatPanel.lab1Labeled — staged once, consumed by all three sinks). */
object Reports {

  def writeLab1Bundle(s: SparkSession, dir: String, outPath: String): Unit = {
    StatPanel.writeLab1Panel(s, dir, s"$outPath/panel")
    MapPanel.writeLab1MapPanel(s, dir, s"$outPath/map")
    Chart.writeLab1HourlyPng(s, dir, s"$outPath/charts")
    Chart.writeLab1HeatmapPng(s, dir, s"$outPath/charts")
    IO.writeReportZip(outPath, s"$outPath.zip")
  }

  /** Lab-3 bundle (round 13): the road-network map document — route
    * polyline + isochrone hull + POI accessibility layers + connectivity
    * choropleth — over the oracle-checked g2b/g3/g6/g7 frames, zipped. */
  def writeLab3Bundle(s: SparkSession, dir: String, outPath: String): Unit = {
    MapDocs.writeLab3MapPanel(s, dir, s"$outPath/map")
    IO.writeReportZip(outPath, s"$outPath.zip")
  }

  /** Lab-4 bundle (round 13): the quantile-shaded sentiment map, the three
    * interactive charts (histogram + regression scatter + 3-D scatter),
    * and the word-cloud PNG — every artifact over the oracle-checked lab4
    * ranked frame / t5 term frame, zipped like the reference's download
    * (实习四/…yelp_analysis.ipynb:6734-6777). */
  def writeLab4Bundle(s: SparkSession, dir: String, outPath: String): Unit = {
    MapDocs.writeLab4MapPanel(s, dir, s"$outPath/map")
    ChartHtml.writeLab4Charts(s, dir, s"$outPath/charts")
    Chart.writeLab4KdeContourPng(s, dir, s"$outPath/charts")
    WordCloud.writeWordCloudPng(s, dir, s"$outPath/wordcloud")
    IO.writeReportZip(outPath, s"$outPath.zip")
  }
}
