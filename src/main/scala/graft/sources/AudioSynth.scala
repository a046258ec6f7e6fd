package graft.sources

/** Deterministic 16-bit mono PCM synthesis + WAV container round-trip for
  * the audio feature-extraction pipeline (mm4).
  *
  * The sample stream is closed-form integer arithmetic on (mediaId, k), so
  * a SQL oracle reproduces the exact samples WITHOUT parsing the container —
  * which means the container writer/parser pair sits inside the verified
  * path: any header-size, chunk-walk, or byte-order bug shifts the samples
  * and breaks the oracle hash.
  */
object AudioSynth {

  /** Closed-form sample k of media `id`: ((id·31 + k·17) mod 4096) − 2048. */
  def pcm(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(k => (((id * 31 + k.toLong * 17) % 4096) - 2048).toShort)

  /** Samples per media: 1024 + id mod 512 (4–5 full 256-sample windows). */
  def nSamples(id: Long): Int = (1024 + id % 512).toInt

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** A complete, standard RIFF/WAVE container: fmt (PCM, mono, 16-bit) +
    * data. Parseable by any WAV reader, including [[Multimodal.UncompressedCodec]]. */
  def wav(id: Long, rate: Int = 8000): Array[Byte] = {
    val samples = pcm(id, nSamples(id))
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(le32(16))
    out.write(le16(1)); out.write(le16(1)) // PCM, mono
    out.write(le32(rate)); out.write(le32(rate * 2)) // byte rate
    out.write(le16(2)); out.write(le16(16)) // block align, bits
    out.write("data".getBytes); out.write(le32(dataLen))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** Parse a 16-bit mono WAV back to (sampleRate, samples) via the same
    * chunk-walk discipline as the metadata decoder — malformed lengths fail
    * loudly rather than spinning. */
  def pcmSamples(b: Array[Byte]): (Int, Array[Short]) = {
    require(b.length >= 44 && new String(b, 0, 4) == "RIFF" &&
      new String(b, 8, 4) == "WAVE", "not a RIFF/WAVE container")
    def l32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def l16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    var off = 12
    var rate = 0; var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4)
      val len = l32(off + 4)
      require(len >= 0 && off + 8 + len <= b.length,
        s"bad RIFF chunk length $len at offset $off")
      if (id == "fmt ") {
        require(len >= 16, "fmt chunk too short")
        require(l16(off + 8) == 1 && l16(off + 10) == 1 && l16(off + 22) == 16,
          "expected 16-bit mono PCM")
        rate = l32(off + 12)
      } else if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    require(rate > 0 && dataOff >= 0, "missing fmt/data chunk")
    val samples = Array.tabulate(dataLen / 2)(i => l16(dataOff + 2 * i).toShort)
    (rate, samples)
  }
}
