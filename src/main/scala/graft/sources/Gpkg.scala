package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Real GeoPackage READ path (SURVEY.md §2.1 S6; reference round-trips GPKG
  * at 实习三/实习三代码/urban_road_struct_analysis.ipynb:198-202 and writes it
  * at …bounds_analysis.ipynb:367-371).
  *
  * A GeoPackage is a SQLite database with registered metadata tables
  * (gpkg_contents, gpkg_geometry_columns) and one table per feature layer
  * whose geometry column holds GPB blobs (GeoPackage binary header + WKB).
  * This is a from-scratch reader for the subset an exchange fixture uses:
  * table b-trees (interior + leaf), the SQLite record serial-type format,
  * rowid-aliased INTEGER PRIMARY KEY, and GPB/WKB XY points. No overflow
  * pages, WAL, or write path — a GPKG is a single-machine EXCHANGE artifact,
  * so ingestion parses driver-side and parallelizes the resulting rows;
  * bulk vector data lives in parquet once inside the engine (writeGeoTable/
  * readGeoTable is the cluster-native layer format).
  */
object Gpkg {

  // ---- SQLite low-level ----------------------------------------------------

  private final class Db(val bytes: Array[Byte]) {
    require(bytes.length > 100 &&
      new String(bytes, 0, 15, "UTF-8") == "SQLite format 3",
      "not a SQLite database")
    val pageSize: Int = {
      val v = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
      if (v == 1) 65536 else v
    }
    def u16(off: Int): Int = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)

    /** (value, bytesConsumed) big-endian varint: up to eight 7-bit
      * continuation bytes; the NINTH byte, when reached, contributes all
      * 8 bits (that is how SQLite encodes negatives and values ≥ 2^56). */
    def varint(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(off + i) & 0xff
        if ((b & 0x80) == 0) return ((v << 7) | b, i + 1)
        v = (v << 7) | (b & 0x7f)
        i += 1
      }
      ((v << 8) | (bytes(off + 8) & 0xff), 9)
    }

    /** Walk a table b-tree rooted at `page` (1-based), yielding
      * (rowid, record values). */
    def tableRows(page: Int): Seq[(Long, IndexedSeq[Any])] = {
      val base = (page - 1) * pageSize
      val hdr = if (page == 1) base + 100 else base
      val pageType = bytes(hdr) & 0xff
      val nCells = u16(hdr + 3)
      pageType match {
        case 5 => // interior table: left-child pointers + right-most pointer
          val cellPtrBase = hdr + 12
          val kids = (0 until nCells).map { i =>
            u32(base + u16(cellPtrBase + 2 * i)).toInt
          } :+ u32(hdr + 8).toInt
          kids.flatMap(tableRows)
        case 13 => // leaf table
          val cellPtrBase = hdr + 8
          (0 until nCells).map { i =>
            var off = base + u16(cellPtrBase + 2 * i)
            val (payloadLen, n1) = varint(off); off += n1
            val (rowid, n2) = varint(off); off += n2
            // Overflow guard: usable payload must fit the page entirely.
            val maxLocal = pageSize - 35
            require(payloadLen <= maxLocal,
              s"overflow payload ($payloadLen bytes) not supported")
            rowid -> record(off)
          }
        case other => throw new IllegalArgumentException(s"unexpected page type $other")
      }
    }

    /** Decode one record (SQLite serial-type format). */
    private def record(start: Int): IndexedSeq[Any] = {
      val (hdrLen, n0) = varint(start)
      var hOff = start + n0
      val hEnd = start + hdrLen.toInt
      val types = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (hOff < hEnd) {
        val (t, n) = varint(hOff); hOff += n; types += t
      }
      var dOff = hEnd
      types.map { t =>
        def int(nBytes: Int): Long = {
          var v = if ((bytes(dOff) & 0x80) != 0) -1L else 0L
          for (i <- 0 until nBytes) v = (v << 8) | (bytes(dOff + i) & 0xffL)
          dOff += nBytes
          v
        }
        t match {
          case 0 => null
          case 1 => int(1)
          case 2 => int(2)
          case 3 => int(3)
          case 4 => int(4)
          case 5 => int(6)
          case 6 => int(8)
          case 7 => val v = java.lang.Double.longBitsToDouble(int(8)); v
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = new String(bytes, dOff, len, "UTF-8"); dOff += len; s
          case n if n >= 12 =>
            val len = ((n - 12) / 2).toInt
            val b = java.util.Arrays.copyOfRange(bytes, dOff, dOff + len)
            dOff += len; b
          case other => throw new IllegalArgumentException(s"serial type $other")
        }
      }.toIndexedSeq
    }
  }

  private final case class Master(name: String, rootPage: Int, sql: String)

  private def master(db: Db): Seq[Master] =
    db.tableRows(1).flatMap { case (_, vals) =>
      // sqlite_master: (type, name, tbl_name, rootpage, sql)
      (vals(0), vals(1), vals(3), vals(4)) match {
        case ("table", name: String, root: Long, sql: String) =>
          Some(Master(name, root.toInt, sql))
        case _ => None
      }
    }

  /** Column (name, declaredType, isRowidAlias) parsed from CREATE TABLE. */
  private def columnsOf(sql: String): Seq[(String, String, Boolean)] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    // split on commas at paren depth 0 (types like DECIMAL(10,2))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    parts += cur.toString
    // Table-level constraint clauses start with one of these KEYWORDS followed by
    // whitespace or '(' — a bare startsWith would also swallow columns whose NAME
    // merely begins with the keyword (e.g. "checkin", "uniqueness").
    parts.toSeq.map(_.trim).filterNot(p =>
        p.toUpperCase.matches(
          "(?s)(PRIMARY\\s+KEY|FOREIGN\\s+KEY)\\b.*|(UNIQUE|CHECK)\\s*\\(.*|CONSTRAINT\\s.*"))
      .map { p =>
        val toks = p.split("\\s+")
        val name = toks(0).stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("`").stripSuffix("`").stripPrefix("[").stripSuffix("]")
        val declared = if (toks.length > 1) toks(1).toUpperCase else ""
        val rowidAlias = declared == "INTEGER" &&
          p.toUpperCase.contains("PRIMARY KEY")
        (name, declared, rowidAlias)
      }
  }

  /** GPB blob → (lon, lat): 'GP' magic, version, flags (bit0 endianness of
    * the ENVELOPE+header ints, bits 1-3 envelope shape), srs_id, envelope,
    * then WKB (its own byte-order byte; type 1 = Point XY). */
  private[sources] def gpbPoint(b: Array[Byte]): (Double, Double) = {
    require(b.length >= 2 + 2 + 4 && b(0) == 'G'.toByte && b(1) == 'P'.toByte,
      "not a GPB geometry blob")
    val flags = b(3) & 0xff
    val envCount = ((flags >> 1) & 0x7) match {
      case 0 => 0
      case 1 => 4
      case 2 | 3 => 6
      case 4 => 8
      case other => throw new IllegalArgumentException(s"envelope indicator $other")
    }
    val wkbOff = 8 + envCount * 8
    val bb = java.nio.ByteBuffer.wrap(b, wkbOff, b.length - wkbOff)
    val little = b(wkbOff) == 1.toByte
    bb.order(if (little) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    bb.get() // byte-order byte
    val wkbType = bb.getInt()
    require((wkbType & 0xffff) == 1, s"only WKB Point supported (type $wkbType)")
    val x = bb.getDouble(); val y = bb.getDouble()
    (x, y)
  }

  /** Feature layers registered in gpkg_contents with data_type 'features'. */
  def layers(path: String): Seq[String] = {
    val db = new Db(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val m = master(db)
    m.find(_.name == "gpkg_contents") match {
      case None => Seq.empty
      case Some(contents) =>
        val cols = columnsOf(contents.sql).map(_._1)
        val ti = cols.indexOf("table_name")
        val di = cols.indexOf("data_type")
        db.tableRows(contents.rootPage).flatMap { case (_, vals) =>
          if (vals(di) == "features") Some(vals(ti).asInstanceOf[String]) else None
        }
    }
  }

  /** Read one feature layer into a DataFrame: INTEGER → long, REAL → double,
    * TEXT → string columns under their declared names; the geometry column
    * (declared POINT/GEOMETRY, or holding GPB blobs) becomes lon/lat. */
  def readFeatures(spark: SparkSession, path: String, layer: String): DataFrame = {
    val db = new Db(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val tbl = master(db).find(_.name == layer)
      .getOrElse(throw new IllegalArgumentException(s"no table $layer in $path"))
    val cols = columnsOf(tbl.sql)
    val geomIdx = cols.indexWhere { case (_, t, _) =>
      Set("POINT", "GEOMETRY").contains(t)
    }
    require(geomIdx >= 0, s"$layer: no geometry column found in: ${tbl.sql}")
    val fields = cols.zipWithIndex.flatMap { case ((name, t, _), i) =>
      if (i == geomIdx) Seq(StructField("lon", DoubleType), StructField("lat", DoubleType))
      else t match {
        case "INTEGER" | "INT" | "MEDIUMINT" => Seq(StructField(name, LongType))
        case "REAL" | "DOUBLE" | "FLOAT" => Seq(StructField(name, DoubleType))
        case _ => Seq(StructField(name, StringType))
      }
    }
    val rows = db.tableRows(tbl.rootPage).map { case (rowid, vals) =>
      val cells = cols.zipWithIndex.flatMap { case ((_, t, rowidAlias), i) =>
        val v = vals(i)
        if (i == geomIdx) {
          val (lon, lat) = gpbPoint(v.asInstanceOf[Array[Byte]])
          Seq[Any](lon, lat)
        } else if (rowidAlias && v == null) Seq[Any](rowid)
        else (t, v) match {
          // SQLite stores REAL values losslessly representable as integers
          // in integer encoding — coerce back to the declared type.
          case (("REAL" | "DOUBLE" | "FLOAT"), l: java.lang.Long) =>
            Seq[Any](l.toDouble)
          case _ => Seq[Any](v)
        }
      }
      Row(cells: _*)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(fields))
  }
}
