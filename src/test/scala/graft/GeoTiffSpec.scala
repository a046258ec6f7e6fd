package graft

import graft.sources.GeoTiff
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** GeoTIFF ingestion (S7): a test-side TIFF writer builds uncompressed
  * little/big-endian variants from scratch; the committed LZW fixture
  * (fixtures/dem50x60.tif, written by tools/make_tiff_fixture.py) pins the
  * compressed path end-to-end. */
class GeoTiffSpec extends SparkSpec {

  /** Known pixel formula shared with the fixture generator and j6b oracle. */
  private def px(r: Int, c: Int): Int = (3 * r + 5 * c + 7) % 97

  /** Minimal uncompressed single-band uint16 striped GeoTIFF writer. */
  private def writeTiff(path: String, w: Int, h: Int, rps: Int,
                        bigEndian: Boolean, f: (Int, Int) => Int): Unit = {
    val bb = new java.io.ByteArrayOutputStream()
    val order = if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN
    def buf(n: Int) = java.nio.ByteBuffer.allocate(n).order(order)
    val nStrips = (h + rps - 1) / rps
    val strips = (0 until nStrips).map { s =>
      val rows = (s * rps) until math.min((s + 1) * rps, h)
      val b = buf(rows.size * w * 2)
      for (r <- rows; c <- 0 until w) b.putShort(f(r, c).toShort)
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

    def tagEntry(t: Int, tp: Int, cnt: Int, value: Int): Array[Byte] = {
      val b = buf(12)
      b.putShort(t.toShort).putShort(tp.toShort).putInt(cnt)
      if (tp == 3 && cnt == 1) b.putShort(value.toShort).putShort(0)
      else b.putInt(value)
      b.array()
    }
    val header = buf(8)
    header.put(if (bigEndian) 'M'.toByte else 'I'.toByte)
    header.put(if (bigEndian) 'M'.toByte else 'I'.toByte)
    header.putShort(42).putInt(8)
    bb.write(header.array())
    val ifd = buf(ifdSize)
    ifd.putShort(nTags.toShort)
    Seq(
      tagEntry(256, 3, 1, w), tagEntry(257, 3, 1, h), tagEntry(258, 3, 1, 16),
      tagEntry(259, 3, 1, 1), tagEntry(262, 3, 1, 1),
      tagEntry(273, 4, nStrips, offSoff), tagEntry(277, 3, 1, 1),
      tagEntry(278, 3, 1, rps), tagEntry(279, 4, nStrips, offSbc),
      tagEntry(284, 3, 1, 1), tagEntry(339, 3, 1, 1),
      tagEntry(33550, 12, 3, offScale), tagEntry(33922, 12, 6, offTie)
    ).foreach(ifd.put)
    ifd.putInt(0)
    bb.write(ifd.array())
    val dbl = buf(24 + 48)
    Seq(0.01, 0.01, 0.0, /* tiepoint */ 0.0, 0.0, 0.0, -74.3, 41.0, 0.0)
      .foreach(dbl.putDouble)
    bb.write(dbl.array())
    val arrs = buf(8 * nStrips)
    offsets.foreach(arrs.putInt)
    strips.foreach(s => arrs.putInt(s.length))
    bb.write(arrs.array())
    strips.foreach(bb.write)
    Files.write(Paths.get(path), bb.toByteArray)
  }

  private def check(df: org.apache.spark.sql.DataFrame, w: Int, h: Int): Unit = {
    assert(df.count() === w.toLong * h)
    val bad = df.filter(col("value") =!=
      (col("row") * 3 + col("col") * 5 + 7) % 97).count()
    assert(bad === 0L)
  }

  test("uncompressed little-endian multi-strip round-trip + affine") {
    val p = Files.createTempDirectory("graft-tif").toString + "/le.tif"
    writeTiff(p, w = 13, h = 10, rps = 3, bigEndian = false, px)
    val (df, aff) = GeoTiff.read(spark, p)
    check(df, 13, 10)
    assert(aff === GeoTiff.Affine(-74.3, 41.0, 0.01, 0.01))
  }

  test("uncompressed big-endian round-trip") {
    val p = Files.createTempDirectory("graft-tif").toString + "/be.tif"
    writeTiff(p, w = 7, h = 5, rps = 2, bigEndian = true, px)
    val (df, _) = GeoTiff.read(spark, p)
    check(df, 7, 5)
  }

  test("committed LZW fixture decodes to the generator formula") {
    val (df, aff) = GeoTiff.read(spark, "fixtures/dem50x60.tif")
    check(df, 60, 50)
    assert(aff === GeoTiff.Affine(-74.3, 41.0, 0.01, 0.01))
    // spot-check one strip-boundary row against the formula
    val v = df.filter(col("row") === 8 && col("col") === 59)
      .select("value").head().getDouble(0)
    assert(v === px(8, 59).toDouble)
  }

  /** Test-side TIFF-LZW encoder (mirrors tools/make_tiff_fixture.py): the
    * decoder's width-bump schedule is simulated from the DECODER's
    * one-behind dictionary growth, so encode∘decode must round-trip. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var width = 9
    var decFree = 258
    var first = true
    def emit(code: Int): Unit = bits += ((code, width))
    def emitData(code: Int): Unit = {
      emit(code)
      if (first) first = false
      else {
        decFree += 1
        if (decFree == (1 << width) - 1 && width < 12) width += 1
      }
    }
    var table = scala.collection.mutable.HashMap.empty[Seq[Byte], Int] ++
      (0 until 256).map(i => Seq(i.toByte) -> i)
    var nxt = 258
    emit(256)
    var w = Vector.empty[Byte]
    for (ch <- data) {
      val wc = w :+ ch
      if (table.contains(wc)) w = wc
      else {
        emitData(table(w))
        table(wc) = nxt; nxt += 1
        w = Vector(ch)
        if (nxt == 4094) {
          emit(256)
          table = scala.collection.mutable.HashMap.empty[Seq[Byte], Int] ++
            (0 until 256).map(i => Seq(i.toByte) -> i)
          nxt = 258; width = 9; decFree = 258; first = true
        }
      }
    }
    if (w.nonEmpty) emitData(table(w))
    emit(257)
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nacc = 0
    for ((code, cw) <- bits) {
      acc = (acc << cw) | code; nacc += cw
      while (nacc >= 8) { nacc -= 8; out.write(((acc >> nacc) & 0xff).toInt) }
    }
    if (nacc > 0) out.write(((acc << (8 - nacc)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZW decode round-trips encode across width bumps and dictionary reset") {
    val rnd = new scala.util.Random(42)
    // Low-entropy repeating data grows the dictionary to the 10/11/12-bit
    // widths and past the 4094-entry reset; high-entropy data stays at 9.
    val cases = Seq(
      Array.tabulate(40000)(i => ((i / 7) % 5).toByte),          // deep dict + reset
      Array.tabulate(5000)(i => (i % 3).toByte),                 // width 10-11
      Array.fill(3000)(rnd.nextInt(256).toByte),                 // near-incompressible
      Array.tabulate(1000)(_ => 0.toByte),                       // degenerate run
      Array.empty[Byte])
    for (data <- cases) {
      val decoded = GeoTiff.lzwDecode(lzwEncode(data), data.length)
      assert(decoded.toSeq === data.toSeq, s"round-trip failed for n=${data.length}")
    }
  }

  test("clip + write + re-read round-trips (reference open->mask->write)") {
    val (full, aff) = GeoTiff.read(spark, "fixtures/dem50x60.tif")
    // window: lon [-74.25, -74.05), lat [40.7, 40.9) -> cols 5..24, rows 10..29
    val (clipped, caff) = GeoTiff.clip(full, aff, -74.25, -74.05, 40.7, 40.9)
    assert(caff === GeoTiff.Affine(-74.25, 40.9, 0.01, 0.01))
    assert(clipped.count() === 20L * 20L)
    val dir = Files.createTempDirectory("graft-tifw").toString
    // rowsPerStrip 8 -> multi-strip; default 64 -> single strip (inline tags)
    for ((rps, name) <- Seq(8 -> "multi.tif", 64 -> "single.tif")) {
      GeoTiff.write(clipped, caff, s"$dir/$name", rowsPerStrip = rps)
      val (back, baff) = GeoTiff.read(spark, s"$dir/$name")
      assert(baff === caff, name)
      assert(back.count() === 400L, name)
      val diff = back.as("b").join(clipped.as("c"), Seq("row", "col"))
        .filter(col("b.value") =!= col("c.value")).count()
      assert(diff === 0L, name)
      // spot value against the generator formula in ORIGINAL grid coords
      val v = back.filter(col("row") === 0 && col("col") === 0)
        .head().getDouble(2)
      assert(v === ((3 * 10 + 5 * 5 + 7) % 97).toDouble, name)
    }
  }

  test("unsupported layouts are rejected loudly") {
    val dir = Files.createTempDirectory("graft-tif").toString
    val p = s"$dir/bad.bin"
    Files.write(Paths.get(p), "not a tiff at all".getBytes)
    intercept[IllegalArgumentException](GeoTiff.readMeta(p))
  }
}
