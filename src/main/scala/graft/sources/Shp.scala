package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}

/** ESRI Shapefile point layer read/write (SURVEY.md §2.1 S6 — the reference
  * writes `driver='ESRI Shapefile'` layers alongside GPKG/GeoJSON via
  * GeoPandas `to_file`).
  *
  * Scope: shape type 1 (Point) plus the dBase III attribute table — the
  * pair every `gdf.to_file(..., driver='ESRI Shapefile')` of a point frame
  * produces. A shapefile is a fixed-layout single-file-per-part exchange
  * artifact (like GPKG), so parsing happens driver-side and the rows
  * parallelize; bulk vector data lives in parquet once inside the engine.
  *
  * Attribute typing: `N` fields with 0 decimals → long, with decimals →
  * double, `F` → double, everything else → string (the same collapse
  * GeoPandas applies on write).
  */
object Shp {

  /** Write (lon, lat) + attributes as `<path>.shp` + `.shx` + `.dbf`.
    * Single-file exchange export: renders driver-side by format nature,
    * capped by `maxRows` so the boundary fails loudly instead of OOMing
    * the driver — bulk vector data lives in parquet inside the engine. */
  def writePoints(df: DataFrame, path: String,
                  lonCol: String = "lon", latCol: String = "lat",
                  maxRows: Int = 1000000): Unit = {
    val attrs = df.schema.fields.filterNot(f => f.name == lonCol || f.name == latCol)
    val rows = df.select((Seq(lonCol, latCol) ++ attrs.map(_.name))
      .map(org.apache.spark.sql.functions.col): _*).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"writePoints is a single-file exchange export capped at $maxRows rows; " +
        "use writeGeoTable (parquet/WKT layer) for bulk data")
    val n = rows.length

    // --- .shp + .shx ---
    val recContent = 20 // shape type (4) + x (8) + y (8)
    val shpLen = 100 + n * (8 + recContent)
    val shp = ByteBuffer.allocate(shpLen)
    val shx = ByteBuffer.allocate(100 + n * 8)
    def header(b: ByteBuffer, fileLenBytes: Int): Unit = {
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(0, 9994)
      b.putInt(24, fileLenBytes / 2) // length in 16-bit words
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(28, 1000)
      b.putInt(32, 1) // Point
      val lons = rows.map(_.getDouble(0)); val lats = rows.map(_.getDouble(1))
      b.putDouble(36, if (n > 0) lons.min else 0.0)
      b.putDouble(44, if (n > 0) lats.min else 0.0)
      b.putDouble(52, if (n > 0) lons.max else 0.0)
      b.putDouble(60, if (n > 0) lats.max else 0.0)
    }
    header(shp, shpLen)
    header(shx, 100 + n * 8)
    var off = 100
    for (i <- 0 until n) {
      shx.order(ByteOrder.BIG_ENDIAN)
      shx.putInt(100 + i * 8, off / 2)
      shx.putInt(100 + i * 8 + 4, recContent / 2)
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(off, i + 1)
      shp.putInt(off + 4, recContent / 2)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(off + 8, 1)
      shp.putDouble(off + 12, rows(i).getDouble(0))
      shp.putDouble(off + 20, rows(i).getDouble(1))
      off += 8 + recContent
    }

    // --- .dbf (dBase III): numeric N width 18 (dec per type), text C 64 ---
    case class F(name: String, typ: Char, len: Int, dec: Int)
    val fields = attrs.map { f =>
      f.dataType match {
        case LongType | IntegerType | ShortType => F(f.name.take(10), 'N', 18, 0)
        case DoubleType | FloatType => F(f.name.take(10), 'N', 18, 6)
        case _ => F(f.name.take(10), 'C', 64, 0)
      }
    }
    val recSize = 1 + fields.map(_.len).sum
    val hdrSize = 32 + fields.length * 32 + 1
    val dbf = ByteBuffer.allocate(hdrSize + n * recSize + 1).order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 0x03.toByte)
    dbf.put(1, 95.toByte); dbf.put(2, 7.toByte); dbf.put(3, 26.toByte) // ymd
    dbf.putInt(4, n)
    dbf.putShort(8, hdrSize.toShort)
    dbf.putShort(10, recSize.toShort)
    fields.zipWithIndex.foreach { case (f, i) =>
      val base = 32 + i * 32
      f.name.getBytes("ASCII").take(10).zipWithIndex.foreach { case (c, j) => dbf.put(base + j, c) }
      dbf.put(base + 11, f.typ.toByte)
      dbf.put(base + 16, f.len.toByte)
      dbf.put(base + 17, f.dec.toByte)
    }
    dbf.put(hdrSize - 1, 0x0D.toByte)
    var rOff = hdrSize
    for (i <- 0 until n) {
      dbf.put(rOff, ' '.toByte) // not deleted
      var fOff = rOff + 1
      fields.zipWithIndex.foreach { case (f, j) =>
        val v = rows(i).get(2 + j)
        val s = (f.typ, v) match {
          case (_, null) => ""
          case ('N', x) if f.dec == 0 => x.toString
          case ('N', x) => String.format(java.util.Locale.ROOT,
            "%." + f.dec + "f", Double.box(x.asInstanceOf[Number].doubleValue()))
          case (_, x) => x.toString
        }
        // Truncating a NUMERIC silently changes its value — reject instead.
        require(f.typ != 'N' || s.length <= f.len,
          s"dbf field ${f.name}: value '$s' exceeds width ${f.len}")
        val padded = if (f.typ == 'N') (" " * (f.len - s.length)) + s
                     else s.take(f.len).padTo(f.len, ' ')
        padded.getBytes("ASCII").zipWithIndex.foreach { case (c, j2) => dbf.put(fOff + j2, c) }
        fOff += f.len
      }
      rOff += recSize
    }
    dbf.put(hdrSize + n * recSize, 0x1A.toByte) // EOF
    java.nio.file.Files.write(java.nio.file.Paths.get(path + ".shp"), shp.array())
    java.nio.file.Files.write(java.nio.file.Paths.get(path + ".shx"), shx.array())
    java.nio.file.Files.write(java.nio.file.Paths.get(path + ".dbf"), dbf.array())
  }

  /** Read `<path>.shp` (+ `.dbf` if present) into (lon, lat, attrs...). */
  def readPoints(spark: SparkSession, path: String): DataFrame = {
    val shpB = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path + ".shp"))
    val shp = ByteBuffer.wrap(shpB)
    shp.order(ByteOrder.BIG_ENDIAN)
    require(shp.getInt(0) == 9994, s"$path.shp: not a shapefile")
    shp.order(ByteOrder.LITTLE_ENDIAN)
    val shapeType = shp.getInt(32)
    require(shapeType == 1, s"$path.shp: only Point (1) supported, got $shapeType")
    val pts = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var off = 100
    while (off + 8 <= shpB.length) {
      shp.order(ByteOrder.BIG_ENDIAN)
      val contentWords = shp.getInt(off + 4)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      val st = shp.getInt(off + 8)
      require(st == 1, s"$path.shp: record with non-point type $st")
      pts += ((shp.getDouble(off + 12), shp.getDouble(off + 20)))
      off += 8 + contentWords * 2
    }

    val dbfPath = java.nio.file.Paths.get(path + ".dbf")
    val (fields, attrRows): (Seq[StructField], Seq[Seq[Any]]) =
      if (!java.nio.file.Files.exists(dbfPath)) (Seq.empty, pts.toSeq.map(_ => Seq.empty[Any]))
      else {
        val b = ByteBuffer.wrap(java.nio.file.Files.readAllBytes(dbfPath))
          .order(ByteOrder.LITTLE_ENDIAN)
        val nRec = b.getInt(4)
        val hdrSize = b.getShort(8) & 0xffff
        val recSize = b.getShort(10) & 0xffff
        val nFields = (hdrSize - 33) / 32
        case class F(name: String, typ: Char, len: Int, dec: Int)
        val fs = (0 until nFields).map { i =>
          val base = 32 + i * 32
          val nameBytes = (0 until 11).map(j => b.get(base + j)).takeWhile(_ != 0).toArray
          F(new String(nameBytes, "ASCII").trim, b.get(base + 11).toChar,
            b.get(base + 16) & 0xff, b.get(base + 17) & 0xff)
        }
        val sf = fs.map { f =>
          f.typ match {
            case 'N' if f.dec == 0 => StructField(f.name, LongType)
            case 'N' | 'F' => StructField(f.name, DoubleType)
            case _ => StructField(f.name, StringType)
          }
        }
        val rows = (0 until nRec).map { r =>
          var fOff = hdrSize + r * recSize + 1
          fs.map { f =>
            val s = new String((0 until f.len).map(j => b.get(fOff + j)).toArray, "ASCII").trim
            fOff += f.len
            f.typ match {
              case 'N' if f.dec == 0 => if (s.isEmpty) null else s.toLong
              case 'N' | 'F' => if (s.isEmpty) null else s.toDouble
              case _ => s
            }
          }
        }
        (sf, rows)
      }

    val schema = StructType(
      Seq(StructField("lon", DoubleType), StructField("lat", DoubleType)) ++ fields)
    val data = pts.toSeq.zip(attrRows).map { case ((x, y), as) => Row(Seq(x, y) ++ as: _*) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
  }
}
