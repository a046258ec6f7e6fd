package graft.sources

/** Pure-JVM PNG codec: the REAL compressed-image decode for the multimodal
  * path (closes the former compressed-codec stub). DEFLATE comes from
  * `java.util.zip` (Inflater/Deflater — in the JDK, no codec library
  * needed); scanline unfiltering (None/Sub/Up/Average/Paeth) is implemented
  * here. Supported subset: 8-bit depth, gray/gray+alpha/RGB/RGBA color
  * types, non-interlaced — anything else fails loudly, never silently.
  *
  * The encoder exists so tests and queries can prove the decoder end to
  * end: generate pixels → encode (varying the row filter, so every
  * unfilter branch is exercised) → decode → compare. Reference surface:
  * image columns in a training-data pipeline (builder brief), not the
  * geo reference.
  */
object Png {

  /** Decoded raster: `pixels` is row-major, `channels` bytes per pixel. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == Signature(i))

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  def decode(bytes: Array[Byte]): Image = {
    require(isPng(bytes), "not a PNG (bad signature)")
    var off = 8
    var width = 0; var height = 0; var channels = 0
    var sawIhdr = false; var done = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!done) {
      require(off + 8 <= bytes.length, "truncated PNG (chunk header past EOF)")
      val len = be32(bytes, off)
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val dOff = off + 8
      require(len >= 0 && dOff + len + 4 <= bytes.length,
        s"truncated PNG ($typ chunk of $len bytes past EOF)")
      typ match {
        case "IHDR" =>
          width = be32(bytes, dOff); height = be32(bytes, dOff + 4)
          val bitDepth = bytes(dOff + 8) & 0xff
          val colorType = bytes(dOff + 9) & 0xff
          val interlace = bytes(dOff + 12) & 0xff
          require(bitDepth == 8, s"only 8-bit PNGs supported (bit depth $bitDepth)")
          require(interlace == 0, "interlaced PNGs not supported")
          channels = colorType match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case other => throw new IllegalArgumentException(
              s"unsupported PNG color type $other (palette?)")
          }
          require(width > 0 && height > 0, s"bad PNG dimensions ${width}x$height")
          sawIhdr = true
        case "IDAT" => idat.write(bytes, dOff, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) are skippable
      }
      off = dOff + len + 4 // skip CRC
    }
    require(sawIhdr, "PNG missing IHDR")

    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var n = 0
    try {
      while (n < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, n, raw.length - n)
        require(k > 0 || inf.finished(), "truncated or corrupt IDAT stream")
        n += k
      }
      require(n == raw.length,
        s"IDAT inflated to $n bytes, expected ${raw.length}")
    } finally inf.end()

    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val in0 = y * (stride + 1) + 1
      val o0 = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(in0 + x) & 0xff
        val a = if (x >= channels) out(o0 + x - channels) & 0xff else 0
        val b = if (y > 0) out(o0 - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= channels) out(o0 - stride + x - channels) & 0xff else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + ((a + b) >> 1)
          case 4 => cur + paeth(a, b, c)
          case other => throw new IllegalArgumentException(
            s"bad PNG filter type $other at row $y")
        }
        out(o0 + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, channels, out)
  }

  /** Encode 8-bit non-interlaced PNG. `filterOfRow` picks each row's filter
    * (default cycles 0-4 so a decode round-trip exercises every unfilter
    * branch); DEFLATE level is fixed for determinism within a run. */
  def encode(img: Image, filterOfRow: Int => Int = _ % 5): Array[Byte] = {
    val Image(width, height, channels, px) = img
    require(px.length == width * height * channels,
      s"pixel buffer ${px.length} != ${width}x${height}x$channels")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case other => throw new IllegalArgumentException(s"$other channels")
    }
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val f = filterOfRow(y)
      require(f >= 0 && f <= 4, s"filter $f")
      raw(y * (stride + 1)) = f.toByte
      val in0 = y * stride
      val o0 = y * (stride + 1) + 1
      var x = 0
      while (x < stride) {
        val cur = px(in0 + x) & 0xff
        val a = if (x >= channels) px(in0 + x - channels) & 0xff else 0
        val b = if (y > 0) px(in0 - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= channels) px(in0 - stride + x - channels) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paeth(a, b, c)
        }
        raw(o0 + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
      d.setInput(raw); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end()
      buf.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Int): Unit = {
        out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff)
      }
      w32(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      w32(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", deflated)
    chunk("IEND", Array.empty)
    out.toByteArray
  }
}
