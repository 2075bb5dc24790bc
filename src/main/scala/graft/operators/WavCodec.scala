package graft.operators

/** Pure-JVM decoder for RIFF/WAVE audio with integer PCM samples (format 1,
  * 8/16-bit) — like PNM for images, WAV-PCM is header + raw samples, so the
  * multimodal audio path gets a REAL codec with no native dependency.
  * Compressed audio stays behind the stub seam. All feature math is exact
  * integer accumulation — deterministic under any partitioning. */
object WavCodec {

  final case class Audio(sampleRateHz: Int, channels: Int, bitsPerSample: Int,
                         nFrames: Int, samples: Array[Int]) // interleaved

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Decode RIFF/WAVE, PCM format only (audioFormat == 1), 8- or 16-bit.
    * None for anything else — undecodable media is filtered, not faked. */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var pos = 12
    var fmtOk = false
    var rate = 0; var channels = 0; var bits = 0
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = le32(bytes, pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        val audioFormat = le16(bytes, pos + 8)
        channels = le16(bytes, pos + 10)
        rate = le32(bytes, pos + 12)
        bits = le16(bytes, pos + 22)
        fmtOk = audioFormat == 1 && channels > 0 && rate > 0 &&
          (bits == 8 || bits == 16)
      } else if (id == "data") {
        if (!fmtOk) return None
        val bytesPerSample = bits / 8
        val nSamples = size / bytesPerSample
        val nFrames = nSamples / channels
        val out = new Array[Int](nSamples)
        var i = 0
        while (i < nSamples) {
          out(i) =
            if (bits == 8) (bytes(pos + 8 + i) & 0xff) - 128 // 8-bit WAV is unsigned
            else le16(bytes, pos + 8 + i * 2).toShort.toInt
          i += 1
        }
        return Some(Audio(rate, channels, bits, nFrames, out))
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Exact-integer audio features:
    * [sample_rate, channels, duration_ms, rms_scaled, zero_crossings, peak].
    * RMS is sqrt of the exact integer mean-square, zero-crossings counted on
    * channel 0 sign changes — the standard cheap audio-quality signals. */
  def features(a: Audio): Array[Double] = {
    val n = a.samples.length
    var sq = 0L
    var i = 0
    while (i < n) { val v = a.samples(i).toLong; sq += v * v; i += 1 }
    var zc = 0L
    var peak = 0L
    var prev = 0
    i = 0
    while (i < a.nFrames) {
      val v = a.samples(i * a.channels)
      if (i > 0 && ((v < 0 && prev >= 0) || (v >= 0 && prev < 0))) zc += 1
      if (math.abs(v) > peak) peak = math.abs(v)
      prev = v
      i += 1
    }
    val durMs = if (a.sampleRateHz > 0) a.nFrames.toLong * 1000 / a.sampleRateHz else 0L
    val rms = if (n > 0) math.sqrt(sq.toDouble / n) else 0.0
    Array(a.sampleRateHz.toDouble, a.channels.toDouble, durMs.toDouble,
      math.floor(rms * 1e6) / 1e6, zc.toDouble, peak.toDouble)
  }

  /** 64-bit audio fingerprint — `PnmCodec.dhash64`'s acoustic twin: the clip
    * is cut into 65 equal-duration bins (floor tiling, degenerating to
    * per-frame bins on tiny clips), each bin's mono-mix energy is an exact
    * integer sum, and bit i compares the per-frame mean energy of bins i and
    * i+1. Only the energy ENVELOPE's gradients enter the bits, so the hash is
    * invariant to re-containering, uniform gain, and duration (bins are
    * proportional); a localized edit flips only its bins' bits — which lets
    * `Dedup.simhashBandPairs` find near-dup audio within a Hamming radius
    * with no pair scan. Silent/empty clips hash to 0. */
  def afp64(a: Audio): Long = {
    if (a.nFrames <= 0) return 0L
    val bins = 65
    val e = new Array[Double](bins)
    var b = 0
    while (b < bins) {
      val f0 = (b.toLong * a.nFrames / bins).toInt
      val f1 = math.min(a.nFrames,
        math.max(f0 + 1, ((b + 1).toLong * a.nFrames / bins).toInt))
      var sum = 0L
      var f = f0
      while (f < f1) {
        var mono = 0L
        var c = 0
        while (c < a.channels) { mono += a.samples(f * a.channels + c); c += 1 }
        sum += mono * mono
        f += 1
      }
      e(b) = sum.toDouble / (f1 - f0)
      b += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) { if (e(i) < e(i + 1)) h |= 1L << i; i += 1 }
    h
  }
}
