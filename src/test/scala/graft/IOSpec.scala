package graft

import graft.sources.IO
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IOSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv round-trip with header, limit, and timestamp parsing") {
    val dir = tmpDir("graft-csv")
    val df = Seq((1L, "a", "2020-01-01 10:00:00"), (2L, "b", "2020-06-15 23:30:00"),
      (3L, "c", "2021-02-28 00:00:01")).toDF("id", "name", "ts")
    IO.writeCsv(df, s"$dir/out")
    val back = IO.readCsv(spark, s"$dir/out", limit = Some(2))
    assert(back.count() === 2)
    assert(back.columns.toSet === Set("id", "name", "ts"))
  }

  test("json-lines scan tolerates malformed lines (PERMISSIVE + corrupt capture)") {
    val dir = tmpDir("graft-jsonl")
    val lines = Seq("""{"id": 1, "v": "x"}""", """{"id": 2, "v": "y"}""",
      """{BROKEN not json""", """{"id": 3, "v": "z"}""")
    Files.write(java.nio.file.Paths.get(s"$dir/data.json"),
      String.join("\n", lines: _*).getBytes)
    // Spark disallows querying ONLY the corrupt column straight off a scan;
    // caching the parsed result first is the documented pattern.
    val df = IO.readJsonLines(spark, s"$dir/data.json").cache()
    df.count()
    assert(df.filter(col("id").isNotNull).count() === 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
    df.unpersist()
  }

  test("orc round-trip preserves schema, types, and values") {
    val dir = tmpDir("graft-orc")
    val df = Seq((1L, "a", 2.5, true), (2L, "b", -0.75, false), (3L, null, 0.0, true))
      .toDF("id", "name", "score", "flag")
    IO.writeOrc(df, s"$dir/out.orc")
    val back = IO.readOrc(spark, s"$dir/out.orc")
    // ORC stores no nullability, so compare names + types (all read nullable)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    // the polymorphic reader dispatches on the .orc extension
    assert(IO.readPoints(spark, s"$dir/out.orc").count() === 3)
  }

  test("polymorphic reader normalizes latitude/longitude column names") {
    val dir = tmpDir("graft-poly")
    Seq((40.7, -74.0, "p1")).toDF("Latitude", "Longitude", "name")
      .write.mode("overwrite").option("header", "true").csv(s"$dir/pts.csv")
    val df = IO.readPoints(spark, s"$dir/pts.csv")
    assert(df.columns.contains("lat") && df.columns.contains("lon"))
  }

  test("geojson feature round-trip preserves coordinates and properties") {
    val pts = Seq((-74.0, 40.7, "cafe"), (-73.9, 40.8, "park")).toDF("lon", "lat", "kind")
    val features = IO.pointsToGeoJsonFeatures(pts)
    val back = IO.geoJsonFeaturesToPoints(features)
    val rows = back.orderBy("lon").collect()
    assert(rows.length === 2)
    assert(rows(0).getDouble(0) === -74.0 && rows(0).getDouble(1) === 40.7)
    assert(rows(0).getMap[String, String](2)("kind") === "cafe")
  }

  test("report sink writes a single json-lines partition") {
    val dir = tmpDir("graft-report")
    IO.writeReportJson(Seq(("total", 42L)).toDF("metric", "value"), s"$dir/report")
    val files = new java.io.File(s"$dir/report").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.length === 1)
    val back = spark.read.json(s"$dir/report")
    assert(back.head().getAs[Long]("value") === 42L)
  }

  test("graphml sink renders node/edge elements distributed + document wrapper") {
    val dir = tmpDir("graft-graphml")
    val nodes = Seq((0L, -74.0, 40.7), (1L, -73.9, 40.8)).toDF("id", "lon", "lat")
    val edges = Seq((0L, 1L, 2.5)).toDF("src", "dst", "w")
    IO.writeGraphMl(nodes, edges, dir)
    val frags = spark.read.text(s"$dir/fragments").collect().map(_.getString(0))
    assert(frags.count(_.contains("<node id=")) === 2)
    assert(frags.exists(f =>
      f.contains("""<edge source="n0" target="n1">""") && f.contains(""""w">2.5""")))
    val head = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/wrapper.head")))
    assert(head.contains("<graphml") && head.contains("edgedefault=\"directed\""))
  }

  test("html report sink renders header and value rows") {
    val dir = tmpDir("graft-html")
    IO.writeReportHtml(Seq(("errors", 42L)).toDF("metric", "value"), dir, "Report")
    val rows = spark.read.text(s"$dir/rows").collect().map(_.getString(0))
    assert(rows.length === 1 && rows(0) === "<tr><td>errors</td><td>42</td></tr>")
    val head = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/wrapper.head")))
    assert(head.contains("<th>metric</th><th>value</th>"))
  }

  test("report zip bundle round-trips entry names and bytes, deterministically") {
    val dir = tmpDir("graft-zip")
    // a miniature report set: json rows + a nested html artifact
    IO.writeReportJson(Seq(("total", 42L)).toDF("metric", "value"), s"$dir/report/rows")
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/report/panel"))
    Files.write(java.nio.file.Paths.get(s"$dir/report/panel/panel.html"),
      "<html>42</html>".getBytes("UTF-8"))
    IO.writeReportZip(s"$dir/report", s"$dir/report.zip")

    val zf = new java.util.zip.ZipFile(s"$dir/report.zip")
    try {
      val entries = {
        val e = zf.entries(); val buf = scala.collection.mutable.ArrayBuffer[String]()
        while (e.hasMoreElements) buf += e.nextElement().getName
        buf.toSeq
      }
      // sorted relative paths; the real report files are all present
      assert(entries === entries.sorted)
      assert(entries.contains("panel/panel.html"))
      assert(entries.exists(n => n.startsWith("rows/") && n.endsWith(".json")))
      // bytes round-trip exactly
      val html = new String(zf.getInputStream(zf.getEntry("panel/panel.html")).readAllBytes, "UTF-8")
      assert(html === "<html>42</html>")
      val rowsEntry = entries.find(n => n.startsWith("rows/") && n.endsWith(".json")).get
      val rows = new String(zf.getInputStream(zf.getEntry(rowsEntry)).readAllBytes, "UTF-8")
      assert(rows.contains(""""value":42"""))
    } finally zf.close()

    // reproducible: zipping the same directory again is byte-identical
    IO.writeReportZip(s"$dir/report", s"$dir/report2.zip")
    assert(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/report.zip")).toSeq ===
      Files.readAllBytes(java.nio.file.Paths.get(s"$dir/report2.zip")).toSeq)
  }

  test("geo-table (GPKG-substitute) round-trip preserves points, attributes, sidecar") {
    val dir = tmpDir("graft-geotable")
    val pts = Seq((-74.05, 40.75, "cafe", 3L), (-73.91, 40.82, "park", 7L))
      .toDF("lon", "lat", "kind", "score")
    IO.writeGeoTable(pts, dir, "pois")
    val meta = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/pois.meta.json")))
    assert(meta.contains(""""geometry_type": "POINT"""") && meta.contains("4326"))
    val back = IO.readGeoTable(spark, dir, "pois").orderBy("lon").collect()
    assert(back.length === 2)
    val r = back(0)
    assert(r.getAs[Double]("lon") === -74.05 && r.getAs[Double]("lat") === 40.75)
    assert(r.getAs[String]("kind") === "cafe" && r.getAs[Long]("score") === 3L)
  }
}
