package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal pure-JVM GeoTIFF ingestion (SURVEY.md §2.1 S7; reference
  * rasterio open/mask at 实习二/实习二代码/clicp_image.py:8-40).
  *
  * Scope (what a DEM/land-cover ingest actually needs, no codec libs):
  * single-band striped TIFF, uncompressed or LZW, 8/16/32-bit integer or
  * 32/64-bit float samples, little- or big-endian, with the two GeoTIFF tags
  * that define the affine grid→world transform (ModelPixelScale 33550 +
  * ModelTiepoint 33922). Tiled TIFF, palettes, multi-band and JPEG/Deflate
  * compression are out of scope and rejected loudly.
  *
  * Scale posture: the tag directory is a few hundred bytes read driver-side;
  * pixel STRIPS decode distributed — strip metadata becomes a DataFrame and
  * each task reads+decodes its strips via mapPartitions, so a continental
  * raster ingests with parallelism = strip count, not 1. Output is the
  * raster-as-table model the lookup joins already consume:
  * (row, col, value) + the affine transform.
  */
object GeoTiff {

  /** World transform: x = originX + col·scaleX, y = originY − row·scaleY. */
  final case class Affine(originX: Double, originY: Double,
                          scaleX: Double, scaleY: Double)

  final case class Meta(width: Int, height: Int, bitsPerSample: Int,
                        sampleFormat: Int, compression: Int, affine: Affine,
                        stripOffsets: Array[Long], stripByteCounts: Array[Long],
                        rowsPerStrip: Int, bigEndian: Boolean)

  /** Parse header + IFD driver-side (bounded: one directory, tens of tags). */
  def readMeta(path: String): Meta = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bigEndian = (bytes(0) & 0xff, bytes(1) & 0xff) match {
      case (0x4d, 0x4d) => true
      case (0x49, 0x49) => false
      case _ => throw new IllegalArgumentException(s"$path: not a TIFF (bad byte-order mark)")
    }
    def u16(off: Int): Int =
      if (bigEndian) ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
      else ((bytes(off + 1) & 0xff) << 8) | (bytes(off) & 0xff)
    def u32(off: Int): Long = {
      val b = (0 until 4).map(i => (bytes(off + i) & 0xffL))
      if (bigEndian) (b(0) << 24) | (b(1) << 16) | (b(2) << 8) | b(3)
      else (b(3) << 24) | (b(2) << 16) | (b(1) << 8) | b(0)
    }
    def f64(off: Int): Double = {
      var v = 0L
      for (i <- 0 until 8) {
        val b = bytes(off + i) & 0xffL
        v = if (bigEndian) (v << 8) | b else v | (b << (8 * i))
      }
      java.lang.Double.longBitsToDouble(v)
    }
    require(u16(2) == 42, s"$path: not a classic TIFF (magic ${u16(2)})")

    val ifd = u32(4).toInt
    val nTags = u16(ifd)
    // tag -> (type, count, valueOffsetFieldPos)
    val tags = (0 until nTags).map { i =>
      val e = ifd + 2 + i * 12
      (u16(e), (u16(e + 2), u32(e + 4), e + 8))
    }.toMap

    val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 11 -> 4, 12 -> 8)
    /** All values of a tag as longs (SHORT/LONG), reading inline or offset. */
    def longs(tag: Int): Array[Long] = tags.get(tag) match {
      case None => Array.empty
      case Some((tp, cnt, pos)) =>
        val sz = typeSize(tp)
        val base = if (sz * cnt <= 4) pos else u32(pos).toInt
        Array.tabulate(cnt.toInt) { i =>
          tp match {
            case 3 => u16(base + i * 2).toLong
            case 4 => u32(base + i * 4)
            case other => throw new IllegalArgumentException(s"tag $tag: unexpected type $other")
          }
        }
    }
    def doubles(tag: Int): Array[Double] = tags.get(tag) match {
      case None => Array.empty
      case Some((tp, cnt, pos)) =>
        require(tp == 12, s"tag $tag: expected DOUBLE, got type $tp")
        val base = u32(pos).toInt // 8*cnt > 4 always for doubles
        Array.tabulate(cnt.toInt)(i => f64(base + i * 8))
    }
    def one(tag: Int, default: Long = -1): Long =
      longs(tag).headOption.getOrElse {
        require(default >= 0, s"$path: required TIFF tag $tag missing"); default
      }

    val width = one(256).toInt
    val height = one(257).toInt
    val bits = one(258, 8).toInt
    val compression = one(259, 1).toInt
    val samplesPerPixel = one(277, 1).toInt
    val sampleFormat = one(339, 1).toInt
    require(samplesPerPixel == 1, s"$path: only single-band supported (got $samplesPerPixel)")
    require(compression == 1 || compression == 5,
      s"$path: only uncompressed(1)/LZW(5) supported (got $compression)")
    require(Set(8, 16, 32, 64).contains(bits), s"$path: unsupported BitsPerSample $bits")
    require(!tags.contains(322), s"$path: tiled TIFF not supported (strips only)")

    val scale = doubles(33550)
    val tie = doubles(33922)
    require(scale.length >= 2 && tie.length >= 6,
      s"$path: missing GeoTIFF ModelPixelScale/ModelTiepoint tags")
    // Tiepoint (i,j,k, x,y,z) anchors raster (i,j) at world (x,y):
    // originX = x − i·scaleX, originY = y + j·scaleY (row axis points down).
    val affine = Affine(tie(3) - tie(0) * scale(0), tie(4) + tie(1) * scale(1),
      scale(0), scale(1))

    Meta(width, height, bits, sampleFormat, compression, affine,
      longs(273), longs(279), one(278, height.toLong).toInt, bigEndian)
  }

  /** TIFF-flavor LZW decode (MSB-first bit packing, clear=256, EOI=257,
    * "early change" code-width bump — the variant every TIFF writer emits). */
  private[graft] def lzwDecode(in: Array[Byte], expected: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(expected)
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 258
    var codeWidth = 9
    var bitPos = 0
    var prev: Array[Byte] = null
    def nextCode(): Int = {
      if ((bitPos + codeWidth + 7) / 8 > in.length) 257 // ran off the end: EOI
      else {
        var v = 0
        var taken = 0
        while (taken < codeWidth) {
          val byteIdx = (bitPos + taken) / 8
          val bitIdx = (bitPos + taken) % 8
          val avail = math.min(8 - bitIdx, codeWidth - taken)
          val chunk = ((in(byteIdx) & 0xff) >> (8 - bitIdx - avail)) & ((1 << avail) - 1)
          v = (v << avail) | chunk
          taken += avail
        }
        bitPos += codeWidth
        v
      }
    }
    var code = nextCode()
    while (code != 257 && out.size < expected) {
      if (code == 256) {
        dictSize = 258; codeWidth = 9; prev = null
      } else {
        val entry: Array[Byte] =
          if (code < 256) Array(code.toByte)
          else if (code < dictSize && dict(code) != null) dict(code)
          else prev :+ prev(0) // KwKwK case
        out.write(entry)
        if (prev != null && dictSize < 4096) {
          dict(dictSize) = prev :+ entry(0)
          dictSize += 1
        }
        // TIFF "early change": width bumps when the NEXT entry to assign
        // reaches 2^width − 1 (511/1023/2047), one code earlier than plain LZW.
        if (dictSize == (1 << codeWidth) - 1 && codeWidth < 12) codeWidth += 1
        prev = entry
      }
      code = nextCode()
    }
    out.toByteArray
  }

  /** Decode one strip's bytes to doubles in row-major order. */
  private[sources] def decodeSamples(raw: Array[Byte], meta: Meta): Array[Double] = {
    val maxStripBytes = meta.rowsPerStrip * meta.width * (meta.bitsPerSample / 8)
    val bytes = if (meta.compression == 5)
      lzwDecode(raw, maxStripBytes) else raw
    val bpp = meta.bitsPerSample / 8
    val n = bytes.length / bpp
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var v = 0L
      var j = 0
      while (j < bpp) {
        val b = bytes(i * bpp + j) & 0xffL
        v = if (meta.bigEndian) (v << 8) | b else v | (b << (8 * j))
        j += 1
      }
      out(i) = (meta.sampleFormat, meta.bitsPerSample) match {
        case (3, 32) => java.lang.Float.intBitsToFloat(v.toInt).toDouble
        case (3, 64) => java.lang.Double.longBitsToDouble(v)
        case (2, 8) => v.toByte.toDouble
        case (2, 16) => v.toShort.toDouble
        case (2, 32) => v.toInt.toDouble
        case _ => v.toDouble // unsigned int
      }
      i += 1
    }
    out
  }

  /** Window clip (reference rasterio.mask(crop=True),
    * 实习二/实习二代码/clicp_image.py:8-40): keep the cells whose WORLD
    * coordinates fall in the lon/lat bbox, re-origin (row, col) to the
    * clipped window, and return the adjusted affine. A pure projection +
    * filter — pushes down to the raster scan. */
  def clip(raster: DataFrame, affine: Affine,
           lonMin: Double, lonMax: Double, latMin: Double, latMax: Double)
      : (DataFrame, Affine) = {
    import org.apache.spark.sql.functions._
    val colMin = math.max(0, math.ceil((lonMin - affine.originX) / affine.scaleX - 1e-9).toInt)
    val colMax = math.floor((lonMax - affine.originX) / affine.scaleX - 1e-9).toInt
    val rowMin = math.max(0, math.ceil((affine.originY - latMax) / affine.scaleY - 1e-9).toInt)
    val rowMax = math.floor((affine.originY - latMin) / affine.scaleY - 1e-9).toInt
    val clipped = raster
      .filter(col("row").between(rowMin, rowMax) && col("col").between(colMin, colMax))
      .select((col("row") - rowMin).as("row"), (col("col") - colMin).as("col"), col("value"))
    (clipped, Affine(affine.originX + colMin * affine.scaleX,
      affine.originY - rowMin * affine.scaleY, affine.scaleX, affine.scaleY))
  }

  /** Write a raster table back to a single-band GeoTIFF (uncompressed
    * uint16 little-endian, ModelPixelScale + ModelTiepoint carrying the
    * affine). A .tif is a single-file exchange artifact (like GPKG), so the
    * pixels are collected driver-side — bounded by the raster's own size;
    * cluster-resident rasters stay in the (row, col, value) parquet model. */
  def write(raster: DataFrame, affine: Affine, path: String,
            rowsPerStrip: Int = 64, maxCells: Int = 16000000): Unit = {
    import org.apache.spark.sql.functions._
    // Single-file exchange export: driver-side by format nature, capped so
    // the boundary fails loudly instead of OOMing the driver on bulk
    // rasters (16M cells = a 4k x 4k uint16 tile, ~32 MB of pixels).
    val rows = raster.select(col("row").cast("int"), col("col").cast("int"),
      col("value").cast("double")).limit(maxCells + 1).collect()
    require(rows.length <= maxCells,
      s"GeoTiff.write is a single-file exchange export capped at $maxCells cells; " +
        "tile the raster (one write per tile) for bulk export")
    require(rows.nonEmpty, "empty raster")
    val h = rows.iterator.map(_.getInt(0)).max + 1
    val w = rows.iterator.map(_.getInt(1)).max + 1
    val px = new Array[Int](h * w)
    rows.foreach { r =>
      val v = r.getDouble(2)
      require(v >= 0 && v <= 65535 && v == math.floor(v),
        s"value $v not representable as uint16")
      px(r.getInt(0) * w + r.getInt(1)) = v.toInt
    }
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val r0 = s * rowsPerStrip
      val rEnd = math.min(r0 + rowsPerStrip, h)
      val b = java.nio.ByteBuffer.allocate((rEnd - r0) * w * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (r0 until rEnd).foreach(r => (0 until w).foreach(c => b.putShort(px(r * w + c).toShort)))
      b.array()
    }
    val nTags = 13
    val ifdSize = 2 + nTags * 12 + 4
    val offScale = 8 + ifdSize
    val offTie = offScale + 24
    val offSoff = offTie + 48
    val offSbc = offSoff + 4 * nStrips
    var pos = offSbc + 4 * nStrips
    val offsets = strips.map { s => val p = pos; pos += s.length; p }
    val out = java.nio.ByteBuffer.allocate(pos).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    out.putShort(nTags.toShort)
    def tag(t: Int, tp: Int, cnt: Int, v: Int): Unit = {
      out.putShort(t.toShort).putShort(tp.toShort).putInt(cnt)
      if (tp == 3 && cnt == 1) { out.putShort(v.toShort); out.putShort(0) }
      else out.putInt(v)
    }
    tag(256, 3, 1, w); tag(257, 3, 1, h); tag(258, 3, 1, 16)
    tag(259, 3, 1, 1); tag(262, 3, 1, 1)
    // TIFF inlines values that fit 4 bytes: a single-strip offset/count
    // array lives IN the tag field, not behind a pointer
    tag(273, 4, nStrips, if (nStrips == 1) offsets(0) else offSoff)
    tag(277, 3, 1, 1)
    tag(278, 3, 1, rowsPerStrip)
    tag(279, 4, nStrips, if (nStrips == 1) strips(0).length else offSbc)
    tag(284, 3, 1, 1); tag(339, 3, 1, 1)
    tag(33550, 12, 3, offScale); tag(33922, 12, 6, offTie)
    out.putInt(0) // next-IFD terminator
    out.putDouble(affine.scaleX).putDouble(affine.scaleY).putDouble(0.0)
    Seq(0.0, 0.0, 0.0, affine.originX, affine.originY, 0.0).foreach(out.putDouble)
    offsets.foreach(out.putInt)
    strips.foreach(s => out.putInt(s.length))
    strips.foreach(out.put)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.array())
  }

  /** Ingest a GeoTIFF into the raster-as-table model: (row, col, value)
    * rows decoded DISTRIBUTED per strip, plus the affine transform.
    *
    * Strip payloads are read inside tasks (disjoint byte ranges, one
    * RandomAccessFile per task); on a multi-node cluster the path would go
    * through the Hadoop FileSystem API instead of java.io — the strip-
    * parallel shape is identical. */
  def read(spark: SparkSession, path: String): (DataFrame, Affine) = {
    val meta = readMeta(path)
    val w = meta.width
    val strips = meta.stripOffsets.indices.map { i =>
      (i, meta.stripOffsets(i), meta.stripByteCounts(i), i * meta.rowsPerStrip)
    }
    val bMeta = spark.sparkContext.broadcast(meta)
    val rows = spark.sparkContext
      .parallelize(strips, math.min(math.max(1, strips.size),
        spark.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val m = bMeta.value
        // Read this partition's strip payloads eagerly so the handle closes
        // deterministically (leaking it to GC finalization accumulates fds
        // across repeated ingests); decode stays lazy per strip.
        val raf = new java.io.RandomAccessFile(path, "r")
        val strips = try {
          it.map { case (_, off, len, row0) =>
            val raw = new Array[Byte](len.toInt)
            raf.seek(off); raf.readFully(raw)
            (raw, row0)
          }.toVector
        } finally raf.close()
        strips.iterator.flatMap { case (raw, row0) =>
          val vals = decodeSamples(raw, m)
          vals.indices.iterator
            .map(k => Row(row0 + k / w, k % w, vals(k)))
            .filter(_.getInt(0) < m.height)
        }
      }
    val outSchema = StructType(Seq(
      StructField("row", IntegerType, nullable = false),
      StructField("col", IntegerType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    (spark.createDataFrame(rows, outSchema), meta.affine)
  }
}
