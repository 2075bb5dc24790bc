package graft.operators

/** Pure-JVM decoder for non-interlaced 8-bit PNG (grayscale and truecolor RGB).
  *
  * PNG's compression is zlib DEFLATE — and `java.util.zip.Inflater` ships with
  * the JVM — so, unlike JPEG or compressed audio, a real PNG decode needs no
  * native library: chunk walk (with CRC verification), concatenated-IDAT
  * inflate, then the per-row unfilter pass (None/Sub/Up/Average/Paeth). The
  * decoded raster reuses `PnmCodec.Image`, so resize and feature extraction
  * are shared with the PNM path.
  *
  * Scope is the honest subset a curation pipeline can verify bit-for-bit in
  * this container: bit depth 8, color types 0 (gray) and 2 (RGB), no
  * interlace. Everything else — 16-bit, palette, alpha, Adam7 — returns None,
  * and callers treat undecodable payloads as filtered (the curation
  * semantic). All pure per-row functions, deterministic under any
  * partitioning.
  */
object PngCodec {

  private val Signature =
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

  /** Hard cap on decoded raster bytes — a 4-byte header field must not be able
    * to make one row allocate gigabytes (decompression-bomb guard). */
  private val MaxRasterBytes: Long = 64L << 20

  /** Decode a PNG payload. None for anything outside the supported subset,
    * truncated streams, or corrupt chunks (CRC mismatch). */
  def decode(bytes: Array[Byte]): Option[PnmCodec.Image] = {
    if (bytes == null || bytes.length < Signature.length + 12) return None
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return None
      i += 1
    }
    def be32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    var pos = Signature.length
    var width = 0
    var height = 0
    var channels = 0
    var seenIhdr = false
    var ended = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!ended) {
      if (pos + 12 > bytes.length) return None
      val len = be32(pos)
      if (len > bytes.length || pos + 12 + len > bytes.length) return None
      val dataOff = pos + 8
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      if (crc.getValue != be32(dataOff + len.toInt)) return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          width = be32(dataOff).toInt
          height = be32(dataOff + 4).toInt
          val bitDepth = bytes(dataOff + 8)
          val colorType = bytes(dataOff + 9)
          val compression = bytes(dataOff + 10)
          val filterMethod = bytes(dataOff + 11)
          val interlace = bytes(dataOff + 12)
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
            interlace != 0) return None
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case _ => return None // palette/alpha outside the verified subset
          }
          if (width <= 0 || height <= 0 ||
            (width.toLong * channels + 1) * height > MaxRasterBytes) return None
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, dataOff, len.toInt)
        case "IEND" =>
          ended = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) skipped
      }
      pos += 12 + len.toInt
    }
    if (!seenIhdr || idat.size == 0) return None
    inflateRaster(idat.toByteArray, width, height, channels)
      .flatMap(unfilter(_, width, height, channels))
  }

  /** Inflate the concatenated IDAT zlib stream into exactly
    * height·(1 + width·channels) filtered bytes. */
  private def inflateRaster(z: Array[Byte], width: Int, height: Int,
                            channels: Int): Option[Array[Byte]] = {
    val expected = (width * channels + 1) * height
    val raw = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(z)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(raw, off, expected - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off != expected) None else Some(raw)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Reverse the per-row filter (spec filters 0-4). With 8-bit samples the
    * "byte to the left" distance equals the channel count. */
  private def unfilter(raw: Array[Byte], width: Int, height: Int,
                       channels: Int): Option[PnmCodec.Image] = {
    val stride = width * channels
    val px = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      if (filter > 4) return None
      val rowOff = y * (stride + 1) + 1
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + x) & 0xff
        val left = if (x >= channels) px(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val upLeft =
          if (x >= channels && y > 0) px((y - 1) * stride + x - channels) & 0xff
          else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            cur + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up
                   else upLeft)
        }
        px(y * stride + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(PnmCodec.Image(width, height, channels, px))
  }
}
