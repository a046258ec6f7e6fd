package graft.sources

/** Pure-JVM baseline JPEG codec (JFIF, sequential DCT, Huffman, 4:4:4).
  *
  * Like Png, the encoder exists so tests can prove the decoder end to end
  * without any codec library or binary fixture: render deterministic pixels
  * → encode (standard Annex-K quantization + Huffman tables, libjpeg-style
  * quality scaling) → decode → compare within the quantization error bound.
  * Supported subset: 8-bit baseline (SOF0), 1 or 3 components, no
  * subsampling (4:4:4), restart-marker-free — anything else fails loudly,
  * never silently. Reference surface: image columns in a training-data
  * pipeline (builder brief); the geo reference has no compressed-image
  * codec surface at all.
  */
object Jpeg {

  import Png.Image

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  // ---- tables (JPEG spec Annex K) ----

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val StdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)

  private val StdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  // (bits-per-length counts, symbol values) — Annex K.3
  private val DcLumaCounts = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaSyms = (0 to 11).toArray
  private val DcChromaCounts = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaSyms = (0 to 11).toArray
  private val AcLumaCounts = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaSyms = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaCounts = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaSyms = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** libjpeg-style quality → per-entry scaled table, clamped to [1, 255]. */
  private def scaledTable(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality out of [1,100]")
    val sf = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(v => math.min(255, math.max(1, (v * sf + 50) / 100)))
  }

  // ---- canonical Huffman ----

  /** (code, length) per symbol, canonical order (spec C.2). */
  private def buildCodes(counts: Array[Int], syms: Array[Int]): Map[Int, (Int, Int)] = {
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var code = 0; var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < counts(len)) {
        out(syms(k)) = (code, len); code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** Decoder side: (length, code) → symbol. */
  private def buildDecode(counts: Array[Int], syms: Array[Int]): Map[(Int, Int), Int] =
    buildCodes(counts, syms).map { case (sym, (code, len)) => (len, code) -> sym }

  // ---- DCT ----

  private val CosT: Array[Double] = {
    val t = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private def c(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    for (v <- 0 until 8; u <- 0 until 8) {
      var s = 0.0
      for (y <- 0 until 8; x <- 0 until 8)
        s += block(y * 8 + x) * CosT(u * 8 + x) * CosT(v * 8 + y)
      out(v * 8 + u) = 0.25 * c(u) * c(v) * s
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += c(u) * c(v) * coef(v * 8 + u) * CosT(u * 8 + x) * CosT(v * 8 + y)
      out(y * 8 + x) = 0.25 * s
    }
    out
  }

  // ---- bit IO (with 0xFF byte stuffing) ----

  private final class BitWriter {
    val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          buf += acc.toByte
          if ((acc & 0xff) == 0xff) buf += 0x00.toByte
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s (spec F.1.2.3)
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      buf += acc.toByte
      if ((acc & 0xff) == 0xff) buf += 0x00.toByte
      acc = 0; nbits = 0
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0; private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "JPEG: entropy stream truncated")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "JPEG: dangling 0xFF in entropy stream")
          val m = bytes(pos) & 0xff
          require(m == 0x00, f"JPEG: unexpected marker FF$m%02x mid-scan")
          pos += 1
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }
  }

  // DC/AC value coding: category (bit length) + offset bits (spec F.1.2.1.1)
  private def category(v: Int): Int = { var a = math.abs(v); var n = 0; while (a > 0) { a >>= 1; n += 1 }; n }
  private def valueBits(v: Int, cat: Int): Int = if (v >= 0) v else v + (1 << cat) - 1
  private def extend(bitsV: Int, cat: Int): Int =
    if (cat == 0) 0 else if (bitsV < (1 << (cat - 1))) bitsV - (1 << cat) + 1 else bitsV

  // ---- encode ----

  /** Encode an Image (1 or 3 channels) as baseline 4:4:4 JFIF. */
  def encode(img: Image, quality: Int = 85): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"JPEG encoder supports 1 or 3 channels, got ${img.channels}")
    val w = img.width; val h = img.height
    val lumaQ = scaledTable(StdLumaQ, quality)
    val chromaQ = scaledTable(StdChromaQ, quality)
    val nc = img.channels

    // planar YCbCr (BT.601 full-range JFIF), level-shifted later per block
    val planes = Array.fill(nc)(new Array[Double](w * h))
    var i = 0
    while (i < w * h) {
      if (nc == 1) planes(0)(i) = (img.pixels(i) & 0xff).toDouble
      else {
        val r = (img.pixels(i * 3) & 0xff).toDouble
        val g = (img.pixels(i * 3 + 1) & 0xff).toDouble
        val b = (img.pixels(i * 3 + 2) & 0xff).toDouble
        planes(0)(i) = 0.299 * r + 0.587 * g + 0.114 * b
        planes(1)(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        planes(2)(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
      }
      i += 1
    }

    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def u8(v: Int): Unit = out += v.toByte
    def u16(v: Int): Unit = { u8((v >> 8) & 0xff); u8(v & 0xff) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    def segment(m: Int)(body: => Unit): Unit = {
      marker(m)
      val at = out.length; u16(0) // placeholder
      body
      val len = out.length - at
      out(at) = ((len >> 8) & 0xff).toByte; out(at + 1) = (len & 0xff).toByte
    }

    marker(0xd8) // SOI
    segment(0xe0) { // APP0 JFIF
      "JFIF".foreach(ch => u8(ch.toInt)); u8(0)
      u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    }
    segment(0xdb) { u8(0); (0 until 64).foreach(z => u8(lumaQ(ZigZag(z)))) }
    if (nc == 3) segment(0xdb) { u8(1); (0 until 64).foreach(z => u8(chromaQ(ZigZag(z)))) }
    segment(0xc0) { // SOF0
      u8(8); u16(h); u16(w); u8(nc)
      for (comp <- 0 until nc) { u8(comp + 1); u8(0x11); u8(if (comp == 0) 0 else 1) }
    }
    def dht(cls: Int, id: Int, counts: Array[Int], syms: Array[Int]): Unit =
      segment(0xc4) { u8((cls << 4) | id); (1 to 16).foreach(l => u8(counts(l))); syms.foreach(u8) }
    dht(0, 0, DcLumaCounts, DcLumaSyms); dht(1, 0, AcLumaCounts, AcLumaSyms)
    if (nc == 3) { dht(0, 1, DcChromaCounts, DcChromaSyms); dht(1, 1, AcChromaCounts, AcChromaSyms) }
    segment(0xda) { // SOS
      u8(nc)
      for (comp <- 0 until nc) { u8(comp + 1); u8(if (comp == 0) 0x00 else 0x11) }
      u8(0); u8(63); u8(0)
    }

    val dcCodes = Array(buildCodes(DcLumaCounts, DcLumaSyms), buildCodes(DcChromaCounts, DcChromaSyms))
    val acCodes = Array(buildCodes(AcLumaCounts, AcLumaSyms), buildCodes(AcChromaCounts, AcChromaSyms))
    val bw = new BitWriter
    val prevDc = new Array[Int](nc)
    val mcuW = (w + 7) / 8; val mcuH = (h + 7) / 8
    for (by <- 0 until mcuH; bx <- 0 until mcuW; comp <- 0 until nc) {
      val tbl = if (comp == 0) 0 else 1
      val q = if (comp == 0) lumaQ else chromaQ
      val block = new Array[Double](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        val px = math.min(w - 1, bx * 8 + x); val py = math.min(h - 1, by * 8 + y)
        block(y * 8 + x) = planes(comp)(py * w + px) - 128.0
      }
      val coef = fdct(block)
      val zz = new Array[Int](64)
      for (z <- 0 until 64) zz(z) = math.round(coef(ZigZag(z)) / q(ZigZag(z))).toInt
      // DC
      val diff = zz(0) - prevDc(comp); prevDc(comp) = zz(0)
      val dcat = category(diff)
      val (dcode, dlen) = dcCodes(tbl)(dcat)
      bw.put(dcode, dlen); if (dcat > 0) bw.put(valueBits(diff, dcat), dcat)
      // AC: run-length of zeros + category
      var run = 0; var z = 1
      while (z < 64) {
        if (zz(z) == 0) run += 1
        else {
          while (run > 15) { val (zc, zl) = acCodes(tbl)(0xf0); bw.put(zc, zl); run -= 16 }
          val cat = category(zz(z))
          val (ac, al) = acCodes(tbl)((run << 4) | cat)
          bw.put(ac, al); bw.put(valueBits(zz(z), cat), cat)
          run = 0
        }
        z += 1
      }
      if (run > 0) { val (ec, el) = acCodes(tbl)(0x00); bw.put(ec, el) } // EOB
    }
    bw.flush()
    out ++= bw.buf
    marker(0xd9) // EOI
    out.toArray
  }

  // ---- decode ----

  def decode(bytes: Array[Byte]): Image = {
    require(isJpeg(bytes), "not a JPEG (bad SOI)")
    var pos = 2
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v }

    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[Map[(Int, Int), Int]](4)
    val acTabs = new Array[Map[(Int, Int), Int]](4)
    var w = 0; var h = 0; var nc = 0
    // per component: (qTabId, dcTabId, acTabId)
    val compQ = new Array[Int](4); val compDc = new Array[Int](4); val compAc = new Array[Int](4)
    var sos = false

    while (!sos) {
      require(pos + 4 <= bytes.length, "JPEG: truncated before SOS")
      require((u8()) == 0xff, "JPEG: expected marker")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xd9 => throw new IllegalArgumentException("JPEG: EOI before SOS")
        case 0xdb =>
          val dqtLen = u16(); val end = pos + dqtLen - 2
          require(end <= bytes.length, "JPEG: truncated DQT segment")
          while (pos < end) {
            val pq = u8(); require((pq >> 4) == 0, "JPEG: only 8-bit DQT supported")
            val t = new Array[Int](64)
            for (z <- 0 until 64) t(ZigZag(z)) = u8()
            qtabs(pq & 0x0f) = t
          }
        case 0xc0 =>
          u16(); require(u8() == 8, "JPEG: only 8-bit precision supported")
          h = u16(); w = u16(); nc = u8()
          require(nc == 1 || nc == 3, s"JPEG: $nc components unsupported")
          for (_ <- 0 until nc) {
            val id = u8(); val samp = u8(); val tq = u8()
            require(samp == 0x11, "JPEG: only 4:4:4 (no subsampling) supported")
            compQ(id - 1) = tq
          }
        case 0xc4 =>
          val dhtLen = u16(); val end = pos + dhtLen - 2
          require(end <= bytes.length, "JPEG: truncated DHT segment")
          while (pos < end) {
            val tc = u8()
            val counts = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { counts(l) = u8(); total += counts(l) }
            val syms = new Array[Int](total)
            for (i <- 0 until total) syms(i) = u8()
            val tab = buildDecode(counts, syms)
            if ((tc >> 4) == 0) dcTabs(tc & 0x0f) = tab else acTabs(tc & 0x0f) = tab
          }
        case 0xda =>
          u16(); val n = u8()
          require(n == nc, "JPEG: scan component count mismatch")
          for (_ <- 0 until n) {
            val id = u8(); val t = u8()
            compDc(id - 1) = t >> 4; compAc(id - 1) = t & 0x0f
          }
          u8(); u8(); u8() // Ss/Se/Ah-Al (baseline: 0/63/0)
          sos = true
        case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
          throw new IllegalArgumentException(f"JPEG: SOF$x%02x (non-baseline) unsupported")
        case 0xd8 => // stray SOI: ignore
        case _ => val skipLen = u16(); pos += skipLen - 2 // APPn / COM / others: skip
      }
    }
    require(w > 0 && h > 0, "JPEG: missing SOF0 before SOS")

    val br = new BitReader(bytes, pos)
    def readSym(tab: Map[(Int, Int), Int]): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        code = (code << 1) | br.bit(); len += 1
        tab.get((len, code)) match {
          case Some(s) => return s
          case None =>
        }
      }
      throw new IllegalArgumentException("JPEG: invalid Huffman code")
    }

    val mcuW = (w + 7) / 8; val mcuH = (h + 7) / 8
    val planes = Array.fill(nc)(new Array[Double](mcuW * 8 * mcuH * 8))
    val prevDc = new Array[Int](nc)
    for (by <- 0 until mcuH; bx <- 0 until mcuW; comp <- 0 until nc) {
      val q = qtabs(compQ(comp)); require(q != null, "JPEG: missing DQT")
      val zz = new Array[Int](64)
      val dcat = readSym(dcTabs(compDc(comp)))
      prevDc(comp) += extend(br.bits(dcat), dcat)
      zz(0) = prevDc(comp)
      var z = 1
      while (z < 64) {
        val rs = readSym(acTabs(compAc(comp)))
        if (rs == 0x00) z = 64 // EOB
        else if (rs == 0xf0) z += 16 // ZRL
        else {
          z += rs >> 4
          require(z < 64, "JPEG: AC run overflows block")
          zz(z) = extend(br.bits(rs & 0x0f), rs & 0x0f)
          z += 1
        }
      }
      val coef = new Array[Double](64)
      for (z2 <- 0 until 64) coef(ZigZag(z2)) = zz(z2).toDouble * q(ZigZag(z2))
      val pix = idct(coef)
      val stride = mcuW * 8
      for (y <- 0 until 8; x <- 0 until 8)
        planes(comp)((by * 8 + y) * stride + bx * 8 + x) = pix(y * 8 + x) + 128.0
    }

    def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
    val outPix = new Array[Byte](w * h * nc)
    val stride = mcuW * 8
    var p = 0
    for (y <- 0 until h; x <- 0 until w) {
      if (nc == 1) { outPix(p) = clamp(planes(0)(y * stride + x)).toByte; p += 1 }
      else {
        val yv = planes(0)(y * stride + x)
        val cb = planes(1)(y * stride + x) - 128.0
        val cr = planes(2)(y * stride + x) - 128.0
        outPix(p) = clamp(yv + 1.402 * cr).toByte
        outPix(p + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr).toByte
        outPix(p + 2) = clamp(yv + 1.772 * cb).toByte
        p += 3
      }
    }
    Image(w, h, nc, outPix)
  }
}
