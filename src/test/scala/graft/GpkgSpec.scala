package graft

import graft.sources.{Gpkg, IO}
import org.apache.spark.sql.functions._

/** Real GeoPackage read path (S6): the committed fixture
  * (fixtures/poi.gpkg, written by tools/make_gpkg_fixture.py via stock
  * sqlite3 — 200 features over 1 KiB pages, so the table b-tree has an
  * interior level) must decode layers, attributes, rowid-aliased fid, and
  * GPB point geometry; and the frame must round-trip through the cluster-
  * native WKT layer format unchanged. */
class GpkgSpec extends SparkSpec {

  test("gpkg_contents lists the feature layer") {
    assert(Gpkg.layers("fixtures/poi.gpkg") === Seq("poi"))
  }

  test("feature table decodes fid/attrs/geometry for all rows") {
    val df = Gpkg.readFeatures(spark, "fixtures/poi.gpkg", "poi")
    assert(df.columns.toSeq === Seq("fid", "name", "category", "score", "lon", "lat"))
    assert(df.count() === 200L)
    // fid is the rowid alias: stored NULL, must surface as the rowid
    val r42 = df.filter(col("fid") === 42).head()
    assert(r42.getString(1) === "poi_042")
    assert(r42.getString(2) === "park")      // cats[42 % 4] = cats[2]
    assert(r42.getDouble(3) === 10.5)
    assert(math.abs(r42.getDouble(4) - (-74.3 + (42 % 60) * 0.01)) < 1e-9)
    assert(math.abs(r42.getDouble(5) - (40.5 + (42 % 50) * 0.01)) < 1e-9)
    // every geometry decodes inside the declared bounds
    assert(df.filter(col("lon") < -74.31 || col("lon") > -73.7 ||
      col("lat") < 40.49 || col("lat") > 41.0).count() === 0L)
  }

  test("9-byte varints (negative and >= 2^56 rowids) decode exactly") {
    val df = Gpkg.readFeatures(spark, "fixtures/edge.gpkg", "pts")
    val fids = df.orderBy("fid").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(fids.toSeq === Seq(-1L -> "neg", 7L -> "plain",
      144115188075855872L -> "huge"))
  }

  test("keyword-prefixed column names survive constraint-clause filtering") {
    // kw table declares columns 'checkin'/'uniqueness'/'checksum' alongside
    // real UNIQUE(...) and CHECK(...) table constraints: the columns must
    // surface with their values un-shifted, the constraints must not.
    val df = Gpkg.readFeatures(spark, "fixtures/edge.gpkg", "kw")
    assert(df.columns.toSeq === Seq("fid", "checkin", "uniqueness", "checksum", "lon", "lat"))
    val rows = df.orderBy("fid").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(11L, 22L))
    assert(rows.map(_.getString(2)).toSeq === Seq("u1", "u2"))
    assert(rows.map(_.getDouble(3)).toSeq === Seq(0.5, 1.5))
    assert(math.abs(rows(0).getDouble(4) - (-74.0)) < 1e-9)
  }

  test("standard single-document GeoJSON FeatureCollection reads to points") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geojson").toString
    val doc =
      """{"type": "FeatureCollection", "features": [
        |  {"type": "Feature",
        |   "geometry": {"type": "Point", "coordinates": [-74.01, 40.71]},
        |   "properties": {"name": "alpha", "kind": "poi"}},
        |  {"type": "Feature",
        |   "geometry": {"type": "LineString", "coordinates": [1.0, 2.0]},
        |   "properties": {"name": "skipme"}},
        |  {"type": "Feature",
        |   "geometry": {"type": "Point", "coordinates": [-73.95, 40.78]},
        |   "properties": {"name": "beta", "kind": "stop"}}
        |]}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/pts.geojson"), doc)
    val df = IO.readGeoJson(spark, s"$dir/pts.geojson")
    val rows = df.orderBy("lon").collect()
    assert(rows.length === 2) // the LineString is filtered
    assert(rows(0).getDouble(0) === -74.01)
    assert(rows(0).getMap[String, String](2)("name") === "alpha")
    assert(rows(1).getMap[String, String](2)("kind") === "stop")
  }

  test("GeoJSON write -> assemble -> read round-trips") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gj-rt").toString
    val df = Seq((-74.01, 40.71, "alpha"), (-73.95, 40.78, "beta"))
      .toDF("lon", "lat", "name")
    IO.writeGeoJson(df, s"$dir/out")
    // assemble single-file form the documented way: head + parts + tail
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/out/features"))
      .toArray.map(_.toString)
      .filter(p => p.contains("part-") && !p.endsWith(".crc")).sorted
    val doc = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/out/wrapper.head")) +
      parts.map(p => java.nio.file.Files.readString(java.nio.file.Paths.get(p))).mkString +
      java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/out/wrapper.tail"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/all.geojson"), doc)
    // strict RFC 7946: every "features" member is a Feature object — no
    // sentinel element, no trailing comma in the assembled document
    assert(!doc.contains("{}"))
    assert(!doc.replaceAll("\\s", "").contains(",]"))
    val back = IO.readGeoJson(spark, s"$dir/all.geojson").orderBy("lon").collect()
    assert(back.length === 2)
    assert(back(0).getDouble(0) === -74.01)
    assert(back(0).getMap[String, String](2)("name") === "alpha")
    assert(back(1).getDouble(1) === 40.78)
  }

  test("writeFeatures emits a real GPKG container that round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gpkg-w").toString
    val df = Gpkg.readFeatures(spark, "fixtures/poi.gpkg", "poi")
    Gpkg.writeFeatures(df, s"$dir/out.gpkg", "poi")
    // the writer's output must parse with the same real-SQLite reader
    assert(Gpkg.layers(s"$dir/out.gpkg") === Seq("poi"))
    val back = Gpkg.readFeatures(spark, s"$dir/out.gpkg", "poi")
    assert(back.columns.toSeq === df.columns.toSeq)
    val a = df.orderBy("fid").collect().toSeq
    val b = back.orderBy("fid").collect().toSeq
    assert(a.size === b.size)
    a.zip(b).foreach { case (x, y) => assert(x === y) } // bit-exact round-trip
  }

  test("writeFeatures b-tree spans interior pages for larger layers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gpkg-big").toString
    // long text payloads force many 4 KiB leaves -> an interior level
    val df = (1 to 3000).map(i =>
        (i.toLong, "x" * 200 + i.toString, -74.0 + i * 1e-4, 40.5 + i * 1e-4))
      .toDF("fid", "payload", "lon", "lat")
    Gpkg.writeFeatures(df, s"$dir/big.gpkg", "big")
    val back = Gpkg.readFeatures(spark, s"$dir/big.gpkg", "big")
    assert(back.count() === 3000L)
    val r = back.filter(col("fid") === 2345L).head()
    assert(r.getString(1).endsWith("2345"))
    assert(math.abs(r.getDouble(2) - (-74.0 + 2345 * 1e-4)) < 1e-12)
  }

  test("multi-layer container: point nodes + LINESTRING edges round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gpkg-ml").toString
    val nodes = Seq((1L, "a", -74.0, 40.7), (2L, "b", -73.9, 40.8))
      .toDF("fid", "name", "lon", "lat")
    val edges = Seq(
      (1L, 12.5, "LINESTRING (-74.0 40.7, -73.95 40.75, -73.9 40.8)"),
      (2L, 3.25, "LINESTRING (-73.9 40.8, -74.0 40.7)"))
      .toDF("fid", "w", "wkt")
    Gpkg.writeLayers(Seq(
      Gpkg.LayerSpec("nodes", nodes),
      Gpkg.LayerSpec("edges", edges, wktCol = Some("wkt"))), s"$dir/net.gpkg")
    assert(Gpkg.layers(s"$dir/net.gpkg").sorted === Seq("edges", "nodes"))
    val n = Gpkg.readFeatures(spark, s"$dir/net.gpkg", "nodes").orderBy("fid").collect()
    assert(n.map(_.getString(1)).toSeq === Seq("a", "b"))
    assert(n(0).getDouble(2) === -74.0 && n(1).getDouble(3) === 40.8)
    val e = Gpkg.readFeaturesWkt(spark, s"$dir/net.gpkg", "edges").orderBy("fid").collect()
    assert(e.map(_.getDouble(1)).toSeq === Seq(12.5, 3.25))
    assert(e(0).getString(2) === "LINESTRING (-74.0 40.7, -73.95 40.75, -73.9 40.8)")
    assert(e(1).getString(2) === "LINESTRING (-73.9 40.8, -74.0 40.7)")
    // point layers read through the WKT surface too
    val nw = Gpkg.readFeaturesWkt(spark, s"$dir/net.gpkg", "nodes").orderBy("fid").collect()
    assert(nw(0).getString(2) === "POINT (-74.0 40.7)")
  }

  test("writeFeatures row cap fails loudly instead of collecting bulk data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gpkg-cap").toString
    val df = (1 to 10).map(i => (i.toLong, -74.0, 40.5)).toDF("fid", "lon", "lat")
    val e = intercept[IllegalArgumentException] {
      Gpkg.writeFeatures(df, s"$dir/cap.gpkg", "cap", maxRows = 5)
    }
    assert(e.getMessage.contains("exchange export"))
  }

  test("gpkg frame round-trips through the WKT geo-table layer format") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gpkg-rt").toString
    val df = Gpkg.readFeatures(spark, "fixtures/poi.gpkg", "poi")
    IO.writeGeoTable(df, dir, "poi")
    // CSV re-read infers int for fid; cast to the gpkg frame's long
    val back = IO.readGeoTable(spark, dir, "poi")
      .select(col("fid").cast("long"), col("name"), col("category"),
        col("score"), col("lon"), col("lat"))
    val a = df.orderBy("fid").collect().toSeq
    val b = back.orderBy("fid").collect().toSeq
    assert(a.size === b.size)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) === y.getLong(0))
      assert(x.getString(1) === y.getString(1))
      assert(math.abs(x.getDouble(4) - y.getDouble(4)) < 1e-12)
      assert(math.abs(x.getDouble(5) - y.getDouble(5)) < 1e-12)
    }
  }
}
