package graft.operators

/** Pure-JVM decoder for binary PNM images — PPM (P6, RGB) and PGM (P5, gray).
  *
  * The PNM family is header + raw samples with zero compression, so a real
  * decode/resize/feature pipeline needs no native library — which makes it the
  * honest end of the multimodal story in this environment: PNM (and, via
  * `PngCodec`, non-interlaced 8-bit PNG) payloads get REAL codecs; formats
  * whose codecs genuinely need native libraries (JPEG, compressed
  * audio/video) still go through the documented stub seam
  * (`Multimodal.stubBatchDecoder`). Everything here is per-row pure
  * functions — deterministic under any partitioning.
  */
object PnmCodec {

  /** Decoded raster: `pixels` is row-major, `channels` interleaved, 8-bit. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  /** Decode binary PPM/PGM (maxval <= 255). None for anything else — callers
    * treat undecodable payloads as filtered, the curation semantic. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 10) return None
    if (bytes(0) != 'P' || (bytes(1) != '5' && bytes(1) != '6')) return None
    val channels = if (bytes(1) == '6') 3 else 1
    var pos = 2
    def skipSpace(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipSpace()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (any) v else -1
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    pos += 1 // the single whitespace byte after maxval
    val need = w.toLong * h * channels
    if (need > Int.MaxValue || bytes.length - pos < need) return None
    val px = java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt)
    Some(Image(w, h, channels, px))
  }

  /** Nearest-neighbor resize — the deterministic preprocessing step before a
    * fixed-input-size vision model. Integer source-index arithmetic
    * (floor(i·src/dst)), no float rounding ambiguity. */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    val out = new Array[Byte](tw * th * img.channels)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        var c = 0
        while (c < img.channels) {
          out((y * tw + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(tw, th, img.channels, out)
  }

  /** Per-channel mean and population variance from exact integer sums, plus
    * shape: [w, h, aspect·1e6 as double, mean_c..., var_c...]. Channel count is
    * padded to 3 (gray replicates) so the feature vector is fixed-length. */
  def features(img: Image): Array[Double] = {
    val n = img.width * img.height
    val sums = new Array[Long](img.channels)
    val sqs = new Array[Long](img.channels)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < img.channels) {
        val v = img.pixels(i * img.channels + c) & 0xff
        sums(c) += v; sqs(c) += v.toLong * v
        c += 1
      }
      i += 1
    }
    def mean(c: Int) = sums(c).toDouble / n
    def varc(c: Int) = sqs(c).toDouble / n - mean(c) * mean(c)
    val ch3 = Array.tabulate(3)(c => math.min(c, img.channels - 1))
    Array(img.width.toDouble, img.height.toDouble,
      math.floor(img.width.toDouble * 1e6 / img.height) / 1e6) ++
      ch3.map(mean) ++ ch3.map(varc)
  }

  /** Box-average downsample of the image's LUMA plane to a `tw`×`th` grid —
    * the perceptual-hash preprocessing step. Each target cell is the
    * floor-mean of its source box (exact integer sums; boxes tile the source
    * under the same floor arithmetic as `resizeNearest`, degenerating to
    * nearest-sample when the source is smaller than the grid). Luma is the
    * integer-exact (77·R + 150·G + 29·B) >> 8; gray passes through. */
  def lumaGrid(img: Image, tw: Int, th: Int): Array[Int] = {
    require(img.channels == 1 || img.channels == 3,
      s"lumaGrid expects gray or RGB rasters, got channels=${img.channels}")
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val y0 = (y.toLong * img.height / th).toInt
      val y1 = math.min(img.height,
        math.max(y0 + 1, ((y + 1).toLong * img.height / th).toInt))
      var x = 0
      while (x < tw) {
        val x0 = (x.toLong * img.width / tw).toInt
        val x1 = math.min(img.width,
          math.max(x0 + 1, ((x + 1).toLong * img.width / tw).toInt))
        var sum = 0L
        var sy = y0
        while (sy < y1) {
          var sx = x0
          while (sx < x1) {
            val i = sy * img.width + sx
            sum += (if (img.channels == 1) img.pixels(i) & 0xff
              else {
                val r = img.pixels(i * 3) & 0xff
                val g = img.pixels(i * 3 + 1) & 0xff
                val b = img.pixels(i * 3 + 2) & 0xff
                (77 * r + 150 * g + 29 * b) >> 8
              })
            sx += 1
          }
          sy += 1
        }
        out(y * tw + x) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit perceptual difference-hash (dHash): 9×8 box-averaged luma grid,
    * bit r·8+c set iff grid(r)(c) < grid(r)(c+1). Because only horizontal
    * luma GRADIENTS enter the bits, the hash is invariant to lossless
    * re-encoding and to any resize that preserves the coarse luma field, and
    * a localized edit flips only the bits whose cells it touches — which is
    * what lets `Dedup.simhashBandPairs`' pigeonhole banding find near-dup
    * images within a Hamming radius without a pair scan. */
  def dhash64(img: Image): Long = {
    val g = lumaGrid(img, 9, 8)
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r * 9 + c) < g(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }
}
