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
    IO.writeReportZip(outPath, s"$outPath.zip")
  }
}
