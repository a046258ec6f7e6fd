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
  * This is a from-scratch reader AND writer for the subset an exchange
  * artifact uses: table b-trees (interior + leaf), the SQLite record
  * serial-type format, rowid-aliased INTEGER PRIMARY KEY, and GPB/WKB XY
  * points ([[writeFeatures]] emits a container stock SQLite verifies with
  * `PRAGMA integrity_check` = ok). No overflow pages or WAL — a GPKG is a
  * single-machine EXCHANGE artifact, so ingestion parses driver-side and
  * parallelizes the resulting rows; bulk vector data lives in parquet once
  * inside the engine (writeGeoTable/readGeoTable is the cluster-native
  * layer format).
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

  // ---- SQLite write path (real GPKG container) -----------------------------
  //
  // From-scratch single-file SQLite writer covering the same subset the
  // reader parses: table b-trees (leaf + interior levels), the record
  // serial-type format, rowid-aliased INTEGER PRIMARY KEY (stored NULL),
  // and GPB XY-point geometry, plus the gpkg_spatial_ref_sys/gpkg_contents/
  // gpkg_geometry_columns registry a conforming consumer expects
  // (reference writes GPKG via to_file(driver='GPKG'),
  // 实习三/实习三代码/bounds_analysis.ipynb:367-371). A GPKG is a
  // single-machine EXCHANGE artifact: rendering is driver-side by format
  // nature (like Shp/GeoTiff export), guarded by `maxRows` so the boundary
  // fails loudly instead of OOMing the driver on bulk data — bulk vector
  // data lives in parquet inside the engine.

  private val PageSize = 4096

  private def varintBytes(v: Long): Array[Byte] =
    if (v >= 0 && v < 128) Array(v.toByte)
    else if (v < 0 || v >= (1L << 56)) {
      // 9-byte form: eight continuation bytes then a full-8-bit ninth
      val out = new Array[Byte](9)
      out(8) = (v & 0xff).toByte
      var x = v >>> 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i -= 1 }
      out
    } else {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = v
      while (x != 0) { buf += (x & 0x7f).toByte; x >>>= 7 }
      val arr = buf.reverse.toArray
      for (i <- 0 until arr.length - 1) arr(i) = (arr(i) | 0x80).toByte
      arr
    }

  private def be(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)

  /** (serialType, bodyBytes) minimal integer encoding. */
  private def intSerial(v: Long): (Long, Array[Byte]) = v match {
    case 0 => (8L, Array.empty[Byte])
    case 1 => (9L, Array.empty[Byte])
    case _ =>
      val n =
        if (v >= -(1L << 7) && v < (1L << 7)) 1
        else if (v >= -(1L << 15) && v < (1L << 15)) 2
        else if (v >= -(1L << 23) && v < (1L << 23)) 3
        else if (v >= -(1L << 31) && v < (1L << 31)) 4
        else if (v >= -(1L << 47) && v < (1L << 47)) 6
        else 8
      val serial = n match { case 1 => 1L; case 2 => 2L; case 3 => 3L
                            case 4 => 4L; case 6 => 5L; case 8 => 6L }
      (serial, be(v, n))
  }

  /** One record in SQLite serial-type format. */
  private def sqliteRecord(values: Seq[Any]): Array[Byte] = {
    val typed = values.map {
      case null => (0L, Array.empty[Byte])
      case l: Long => intSerial(l)
      case i: Int => intSerial(i.toLong)
      case d: Double => (7L, be(java.lang.Double.doubleToLongBits(d), 8))
      case s: String =>
        val b = s.getBytes("UTF-8"); (13L + 2L * b.length, b)
      case b: Array[Byte] => (12L + 2L * b.length, b)
      case other => throw new IllegalArgumentException(
        s"unsupported SQLite value type ${other.getClass}")
    }
    val typeBytes = typed.flatMap(t => varintBytes(t._1)).toArray
    // header length includes its own varint — fixpoint (stable in 2 steps)
    var hdrLen = typeBytes.length + 1
    hdrLen = typeBytes.length + varintBytes(hdrLen.toLong).length
    hdrLen = typeBytes.length + varintBytes(hdrLen.toLong).length
    varintBytes(hdrLen.toLong) ++ typeBytes ++ typed.flatMap(_._2)
  }

  /** Pack (rowid, record) cells into a table b-tree; returns the root page
    * number. Pages append to `pages` (index i = page number i+1). */
  private def buildTableBtree(cells: Seq[(Long, Array[Byte])],
      pages: scala.collection.mutable.ArrayBuffer[Array[Byte]]): Int = {
    val maxLocal = PageSize - 35
    def leafPage(grp: Seq[(Long, Array[Byte])]): Array[Byte] = {
      val page = new Array[Byte](PageSize)
      page(0) = 13
      System.arraycopy(be(grp.size.toLong, 2), 0, page, 3, 2)
      var content = PageSize
      grp.zipWithIndex.foreach { case ((rowid, rec), i) =>
        val cell = varintBytes(rec.length.toLong) ++ varintBytes(rowid) ++ rec
        content -= cell.length
        System.arraycopy(cell, 0, page, content, cell.length)
        System.arraycopy(be(content.toLong, 2), 0, page, 8 + 2 * i, 2)
      }
      System.arraycopy(be(content.toLong, 2), 0, page, 5, 2)
      page
    }
    // greedy fill in rowid order: 8-byte header + 2-byte ptr + cell per row
    val sorted = cells.sortBy(_._1)
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Array[Byte])]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var used = 8
    sorted.foreach { case (rowid, rec) =>
      val cellLen = (varintBytes(rec.length.toLong) ++ varintBytes(rowid)).length + rec.length
      require(cellLen <= maxLocal,
        s"row $rowid record ($cellLen bytes) would need overflow pages — unsupported")
      if (used + 2 + cellLen > PageSize && cur.nonEmpty) {
        leaves += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty; used = 8
      }
      cur += (rowid -> rec); used += 2 + cellLen
    }
    leaves += cur.toSeq // empty table -> one empty leaf
    var level: Seq[(Int, Long)] = leaves.map { grp =>
      pages += leafPage(grp)
      pages.length -> (if (grp.isEmpty) 0L else grp.last._1)
    }.toSeq
    while (level.size > 1) {
      // interior pages: cells (childPtr u32, maxRowid varint), last child as
      // the right-most pointer
      val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, Long)]]
      var g = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      var u = 12
      level.foreach { case (pageNo, key) =>
        val cellLen = 4 + varintBytes(key).length
        if (u + 2 + cellLen > PageSize && g.size >= 2) {
          groups += g.toSeq; g = scala.collection.mutable.ArrayBuffer.empty; u = 12
        }
        g += (pageNo -> key); u += 2 + cellLen
      }
      groups += g.toSeq
      level = groups.map { grp =>
        val page = new Array[Byte](PageSize)
        page(0) = 5
        val body = grp.init
        System.arraycopy(be(body.size.toLong, 2), 0, page, 3, 2)
        System.arraycopy(be(grp.last._1.toLong, 4), 0, page, 8, 4)
        var content = PageSize
        body.zipWithIndex.foreach { case ((child, key), i) =>
          val cell = be(child.toLong, 4) ++ varintBytes(key)
          content -= cell.length
          System.arraycopy(cell, 0, page, content, cell.length)
          System.arraycopy(be(content.toLong, 2), 0, page, 12 + 2 * i, 2)
        }
        System.arraycopy(be(content.toLong, 2), 0, page, 5, 2)
        pages += page
        pages.length -> grp.last._2
      }.toSeq
    }
    level.head._1
  }

  /** GPB blob for an XY point (header + envelope + WKB, little-endian). */
  private[sources] def gpbPointBlob(lon: Double, lat: Double, srsId: Int = 4326): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 32 + 21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('G'.toByte).put('P'.toByte).put(0.toByte)
    bb.put((((1 << 1) | 1)).toByte) // envelope indicator 1 (XY), little-endian
    bb.putInt(srsId)
    bb.putDouble(lon).putDouble(lon).putDouble(lat).putDouble(lat)
    bb.put(1.toByte).putInt(1).putDouble(lon).putDouble(lat)
    bb.array()
  }

  /** WKT (`POINT (x y)` / `LINESTRING (x y, x y, …)`) → GPB blob. */
  private[sources] def wktToGpb(wkt: String, srsId: Int = 4326): Array[Byte] = {
    val t = wkt.trim
    val open = t.indexOf('(')
    require(open > 0 && t.endsWith(")"), s"unparseable WKT: $wkt")
    val kind = t.substring(0, open).trim.toUpperCase
    val coords = t.substring(open + 1, t.length - 1).split(",").map { p =>
      val xy = p.trim.split("\\s+")
      require(xy.length == 2, s"expected XY pair in: $wkt")
      (xy(0).toDouble, xy(1).toDouble)
    }
    val minX = coords.map(_._1).min; val maxX = coords.map(_._1).max
    val minY = coords.map(_._2).min; val maxY = coords.map(_._2).max
    kind match {
      case "POINT" =>
        require(coords.length == 1, s"POINT with ${coords.length} coords")
        gpbPointBlob(coords(0)._1, coords(0)._2, srsId)
      case "LINESTRING" =>
        val bb = java.nio.ByteBuffer.allocate(8 + 32 + 9 + coords.length * 16)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put('G'.toByte).put('P'.toByte).put(0.toByte)
        bb.put((((1 << 1) | 1)).toByte)
        bb.putInt(srsId)
        bb.putDouble(minX).putDouble(maxX).putDouble(minY).putDouble(maxY)
        bb.put(1.toByte).putInt(2).putInt(coords.length)
        coords.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
        bb.array()
      case other => throw new IllegalArgumentException(
        s"unsupported WKT geometry $other (POINT/LINESTRING)")
    }
  }

  /** GPB blob → WKT (Point and LineString XY; either WKB byte order). */
  private[sources] def gpbToWkt(b: Array[Byte]): String = {
    require(b.length >= 8 && b(0) == 'G'.toByte && b(1) == 'P'.toByte,
      "not a GPB geometry blob")
    val flags = b(3) & 0xff
    val envCount = ((flags >> 1) & 0x7) match {
      case 0 => 0; case 1 => 4; case 2 | 3 => 6; case 4 => 8
      case other => throw new IllegalArgumentException(s"envelope indicator $other")
    }
    val wkbOff = 8 + envCount * 8
    val bb = java.nio.ByteBuffer.wrap(b, wkbOff, b.length - wkbOff)
    bb.order(if (b(wkbOff) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    bb.get()
    bb.getInt() & 0xffff match {
      case 1 => s"POINT (${bb.getDouble} ${bb.getDouble})"
      case 2 =>
        val n = bb.getInt()
        val pts = (1 to n).map(_ => s"${bb.getDouble} ${bb.getDouble}")
        s"LINESTRING (${pts.mkString(", ")})"
      case other => throw new IllegalArgumentException(
        s"only WKB Point/LineString supported (type $other)")
    }
  }

  /** Read one feature layer with the geometry surfaced as a `wkt` string
    * column (Point AND LineString layers — the road-network shape the
    * reference round-trips). Attribute handling matches [[readFeatures]]. */
  def readFeaturesWkt(spark: SparkSession, path: String, layer: String): DataFrame = {
    val db = new Db(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val tbl = master(db).find(_.name == layer)
      .getOrElse(throw new IllegalArgumentException(s"no table $layer in $path"))
    val cols = columnsOf(tbl.sql)
    val geomIdx = cols.indexWhere { case (_, t, _) =>
      Set("POINT", "LINESTRING", "GEOMETRY").contains(t)
    }
    require(geomIdx >= 0, s"$layer: no geometry column found in: ${tbl.sql}")
    val fields = cols.zipWithIndex.map { case ((name, t, _), i) =>
      if (i == geomIdx) StructField("wkt", StringType)
      else t match {
        case "INTEGER" | "INT" | "MEDIUMINT" => StructField(name, LongType)
        case "REAL" | "DOUBLE" | "FLOAT" => StructField(name, DoubleType)
        case _ => StructField(name, StringType)
      }
    }
    val rows = db.tableRows(tbl.rootPage).map { case (rowid, vals) =>
      val cells = cols.zipWithIndex.map { case ((_, t, rowidAlias), i) =>
        val v = vals(i)
        if (i == geomIdx) gpbToWkt(v.asInstanceOf[Array[Byte]]): Any
        else if (rowidAlias && v == null) rowid: Any
        else (t, v) match {
          case (("REAL" | "DOUBLE" | "FLOAT"), l: java.lang.Long) => l.toDouble: Any
          case _ => v
        }
      }
      Row(cells: _*)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(fields))
  }

  /** One feature layer of a multi-layer container: geometry comes from
    * `lonCol`/`latCol` point columns, or — when `wktCol` is set — from a
    * WKT string column (POINT / LINESTRING). */
  final case class LayerSpec(name: String, df: DataFrame,
      lonCol: String = "lon", latCol: String = "lat",
      wktCol: Option[String] = None)

  private final case class BuiltLayer(name: String, sql: String, geomType: String,
      cells: Seq[(Long, Array[Byte])],
      minX: Double, minY: Double, maxX: Double, maxY: Double)

  private def buildLayer(spec: LayerSpec, maxRows: Int): BuiltLayer = {
    val LayerSpec(layer, df, lonCol, latCol, wktCol) = spec
    val schema = df.schema
    val geomCols = wktCol.map(Seq(_)).getOrElse(Seq(lonCol, latCol))
    require(geomCols.forall(schema.fieldNames.contains),
      s"layer $layer needs ${geomCols.mkString("/")} columns")
    val attrs = schema.fields.filterNot(f => geomCols.contains(f.name))
    val fidIdx = attrs.indexWhere(f => f.name == "fid" &&
      Seq(LongType, IntegerType).contains(f.dataType))
    val collected = df.limit(maxRows + 1).collect()
    require(collected.length <= maxRows,
      s"writeFeatures is a single-file exchange export capped at $maxRows rows; " +
        "use writeGeoTable (parquet/WKT layer) for bulk data")

    def sqlType(dt: DataType): String = dt match {
      case LongType | IntegerType | ShortType | ByteType => "INTEGER"
      case DoubleType | FloatType => "REAL"
      case _ => "TEXT"
    }
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
    var geomType = if (wktCol.isEmpty) "POINT" else ""
    val cells = collected.zipWithIndex.map { case (row, i) =>
      val blob = wktCol match {
        case None =>
          val lon = row.getAs[Any](lonCol).asInstanceOf[Number].doubleValue()
          val lat = row.getAs[Any](latCol).asInstanceOf[Number].doubleValue()
          minX = math.min(minX, lon); maxX = math.max(maxX, lon)
          minY = math.min(minY, lat); maxY = math.max(maxY, lat)
          gpbPointBlob(lon, lat)
        case Some(wc) =>
          val wkt = row.getAs[String](wc)
          val kind = wkt.trim.takeWhile(_ != '(').trim.toUpperCase
          geomType = if (geomType.isEmpty || geomType == kind) kind else "GEOMETRY"
          val b = wktToGpb(wkt)
          // envelope is bytes 8..40 little-endian: minx maxx miny maxy
          val env = java.nio.ByteBuffer.wrap(b, 8, 32)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val (x0, x1, y0, y1) = (env.getDouble, env.getDouble, env.getDouble, env.getDouble)
          minX = math.min(minX, x0); maxX = math.max(maxX, x1)
          minY = math.min(minY, y0); maxY = math.max(maxY, y1)
          b
      }
      val rowid =
        if (fidIdx >= 0) row.getAs[Any](attrs(fidIdx).name).asInstanceOf[Number].longValue()
        else i + 1L
      val vals: Seq[Any] = attrs.zipWithIndex.map { case (f, ai) =>
        if (ai == fidIdx) null // rowid alias stores NULL; the key carries it
        else row.getAs[Any](f.name) match {
          case null => null
          case n: java.lang.Integer => n.longValue()
          case n: java.lang.Short => n.longValue()
          case n: java.lang.Byte => n.longValue()
          case n: java.lang.Float => n.doubleValue()
          case v @ (_: java.lang.Long | _: java.lang.Double | _: String) => v
          case other => other.toString
        }
      }.toSeq :+ blob
      rowid -> sqliteRecord(vals)
    }.toSeq
    if (collected.isEmpty) { minX = 0; minY = 0; maxX = 0; maxY = 0 }
    if (geomType.isEmpty) geomType = "GEOMETRY"
    val colDefs = attrs.zipWithIndex.map { case (f, i) =>
      if (i == fidIdx) "\"fid\" INTEGER PRIMARY KEY"
      else s""""${f.name}" ${sqlType(f.dataType)}"""
    } :+ s""""geom" $geomType"""
    BuiltLayer(layer, s"""CREATE TABLE "$layer" (${colDefs.mkString(", ")})""",
      geomType, cells, minX, minY, maxX, maxY)
  }

  /** Write `df` as a real single-file GeoPackage: a SQLite container with
    * gpkg_spatial_ref_sys/gpkg_contents/gpkg_geometry_columns and one
    * feature layer of GPB XY points. Columns: `lonCol`/`latCol` become the
    * geometry; a `fid` integer column (if present) becomes the rowid alias;
    * INTEGER/REAL/TEXT attributes keep their declared affinity.
    * Round-trips through [[readFeatures]] and opens in stock sqlite3. */
  def writeFeatures(df: DataFrame, path: String, layer: String,
                    lonCol: String = "lon", latCol: String = "lat",
                    maxRows: Int = 1000000): Unit =
    writeLayers(Seq(LayerSpec(layer, df, lonCol, latCol)), path, maxRows)

  /** Multi-layer container write (the reference's lab-3 shape: a `nodes`
    * point layer + an `edges` LINESTRING layer in one .gpkg). Each layer is
    * a [[LayerSpec]]; WKT layers may hold POINT or LINESTRING geometry. */
  def writeLayers(specs: Seq[LayerSpec], path: String,
                  maxRows: Int = 1000000): Unit = {
    require(specs.nonEmpty, "writeLayers needs at least one layer")
    require(specs.map(_.name).distinct.size == specs.size, "duplicate layer names")
    val built = specs.map(buildLayer(_, maxRows))

    // Registry DDL deliberately avoids non-rowid PRIMARY KEY / UNIQUE
    // constraints: each would imply a sqlite_autoindex b-tree this writer
    // does not emit, and stock SQLite treats the missing index as
    // corruption. INTEGER PRIMARY KEY (a rowid alias) needs no index.
    val srsSql = """CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)"""
    val contentsSql = """CREATE TABLE gpkg_contents (table_name TEXT NOT NULL, data_type TEXT NOT NULL, identifier TEXT, description TEXT DEFAULT '', last_change DATETIME, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"""
    val geomColsSql = """CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL)"""

    val wgs84 = "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\",6378137,298.257223563]],PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]]"
    val srsCells = Seq(
      1L -> sqliteRecord(Seq("WGS 84", 4326L, "EPSG", 4326L, wgs84, null)))
    val contentsCells = built.zipWithIndex.map { case (b, i) =>
      (i + 1L) -> sqliteRecord(Seq(b.name, "features", b.name, "", null,
        b.minX, b.minY, b.maxX, b.maxY, 4326L))
    }
    val geomColsCells = built.zipWithIndex.map { case (b, i) =>
      (i + 1L) -> sqliteRecord(Seq(b.name, "geom", b.geomType, 4326L, 0L, 0L))
    }

    // page 1 (sqlite_master root) is reserved up front; table b-trees append
    // behind it, then the master records point at their allocated roots
    val pages = scala.collection.mutable.ArrayBuffer[Array[Byte]](null)
    val srsRoot = buildTableBtree(srsCells, pages)
    val contentsRoot = buildTableBtree(contentsCells, pages)
    val geomColsRoot = buildTableBtree(geomColsCells, pages)
    val layerRoots = built.map(b => b -> buildTableBtree(b.cells, pages))

    val masterCells = (Seq(
      ("gpkg_spatial_ref_sys", srsRoot, srsSql),
      ("gpkg_contents", contentsRoot, contentsSql),
      ("gpkg_geometry_columns", geomColsRoot, geomColsSql)) ++
      layerRoots.map { case (b, root) => (b.name, root, b.sql) })
      .zipWithIndex.map { case ((name, root, sql), i) =>
        (i + 1L) -> sqliteRecord(Seq("table", name, name, root.toLong, sql))
      }
    // master must fit page 1 (100-byte file header + 8-byte page header)
    val masterSize = 108 + masterCells.map { case (rid, rec) =>
      2 + (varintBytes(rec.length.toLong) ++ varintBytes(rid)).length + rec.length
    }.sum
    require(masterSize <= PageSize, s"sqlite_master overflows page 1 ($masterSize bytes)")
    val master = new Array[Byte](PageSize)
    master(100) = 13
    System.arraycopy(be(masterCells.size.toLong, 2), 0, master, 103, 2)
    var content = PageSize
    masterCells.zipWithIndex.foreach { case ((rowid, rec), i) =>
      val cell = varintBytes(rec.length.toLong) ++ varintBytes(rowid) ++ rec
      content -= cell.length
      System.arraycopy(cell, 0, master, content, cell.length)
      System.arraycopy(be(content.toLong, 2), 0, master, 108 + 2 * i, 2)
    }
    System.arraycopy(be(content.toLong, 2), 0, master, 105, 2)

    // 100-byte file header into page 1
    val hdr = java.nio.ByteBuffer.allocate(100)
    hdr.put("SQLite format 3".getBytes("UTF-8")).put(0.toByte)
    hdr.putShort(PageSize.toShort)
    hdr.put(1.toByte).put(1.toByte) // legacy write/read versions
    hdr.put(0.toByte)               // reserved space per page
    hdr.put(64.toByte).put(32.toByte).put(32.toByte)
    hdr.putInt(1)                   // file change counter
    hdr.putInt(pages.length)        // page count
    hdr.putInt(0).putInt(0)         // freelist head/count
    hdr.putInt(1)                   // schema cookie
    hdr.putInt(1)                   // schema format 1
    hdr.putInt(0)                   // default cache size
    hdr.putInt(0)                   // largest root (non-vacuum)
    hdr.putInt(1)                   // text encoding UTF-8
    hdr.putInt(10300)               // user_version: GPKG 1.3
    hdr.putInt(0)                   // incremental vacuum off
    hdr.putInt(0x47504B47)          // application_id "GPKG"
    hdr.position(92)
    hdr.putInt(1)                   // version-valid-for
    hdr.putInt(3045000)             // sqlite version stamp
    System.arraycopy(hdr.array(), 0, master, 0, 100)
    pages(0) = master

    val out = java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path))
    try pages.foreach(out.write) finally out.close()
  }
}
