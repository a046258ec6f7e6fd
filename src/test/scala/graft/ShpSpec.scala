package graft

import graft.sources.{Gpkg, Shp}
import org.apache.spark.sql.functions._

/** Shapefile point layer (S6): write→read round-trip, and equivalence with
  * the GPKG reader on the same features. */
class ShpSpec extends SparkSpec {
  import spark.implicits._

  test("point layer round-trips through .shp/.shx/.dbf") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shp").toString
    val df = Seq(
      (-74.01, 40.71, 1L, "alpha", 2.5),
      (-73.95, 40.78, 2L, "beta", -0.75),
      (-74.2, 40.6, 3L, "gamma", 12.0)).toDF("lon", "lat", "fid", "name", "v")
    Shp.writePoints(df, s"$dir/pts")
    val back = Shp.readPoints(spark, s"$dir/pts")
    assert(back.columns.toSeq === Seq("lon", "lat", "fid", "name", "v"))
    val rows = back.orderBy("fid").collect()
    assert(rows.length === 3)
    assert(rows(0).getDouble(0) === -74.01)
    assert(rows(0).getString(3) === "alpha")
    assert(math.abs(rows(1).getDouble(4) - (-0.75)) < 1e-9)
    assert(rows(2).getLong(2) === 3L)
  }

  test("gpkg features written as shapefile read back equivalent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shp2").toString
    val gp = Gpkg.readFeatures(spark, "fixtures/poi.gpkg", "poi")
      .select("lon", "lat", "fid", "name", "score")
    Shp.writePoints(gp, s"$dir/poi")
    val back = Shp.readPoints(spark, s"$dir/poi")
    assert(back.count() === 200L)
    val a = gp.orderBy("fid").collect()
    val b = back.orderBy("fid").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x.getDouble(0) - y.getDouble(0)) < 1e-9)
      assert(math.abs(x.getDouble(1) - y.getDouble(1)) < 1e-9)
      assert(x.getString(3) === y.getString(3))
      assert(math.abs(x.getDouble(4) - y.getDouble(4)) < 1e-6)
    }
  }
}
