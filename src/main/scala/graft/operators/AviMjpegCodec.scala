package graft.operators

/** Motion-JPEG video in an AVI container — a second REAL compressed-video
  * codec with zero dependencies beyond the JDK: AVI is a RIFF container
  * (the chunk grammar `WavCodec` already walks for WAVE), and every MJPEG
  * frame is a complete baseline JPEG that `javax.imageio` decodes
  * (`ImageIoCodec`). MJPEG/AVI is what cameras, dashcams, and capture
  * cards actually emit — a real slice of a scraped video lake — and it is
  * intra-frame-only, which is exactly the boundary of what a JDK-only
  * engine can decode: with this, the stub seam covers ONLY inter-predicted
  * video (H.264/VP9/AV1) and perceptual audio (MP3/AAC/Opus).
  *
  * Implements `Y4mCodec.decodeFrames`' contract, so every frame consumer
  * (`frameSignatures`, `videoNearDupPairs`, the admission gates,
  * `MediaCurationJob --modality video`) runs unchanged on MJPEG AVIs via
  * the `anyVideoFrameHasher` chain.
  *
  * Structure walked: `RIFF…AVI ` → the `LIST movi` payload → video data
  * chunks `##dc`/`##db` (two-digit stream id + compressed/uncompressed
  * suffix), recursing through `LIST rec ` interleave groups; each chunk's
  * bytes are one JPEG. Frame dims come from the JPEGs themselves (the
  * consumers are resize-invariant), so the `hdrl` header block is not
  * consulted. Strictness matches the other codecs: malformed framing, an
  * undecodable video chunk, or a blown pixel budget → None (the curation
  * gate drops the row; a corrupt clip must not half-decode silently). */
object AviMjpegCodec {

  /** Aggregate materialization bound across frames — same posture as
    * `GifCodec.MaxTotalPixels` (per-frame dims come from untrusted JPEG
    * headers; frameCount × frame must be bounded, not just each frame). */
  val MaxTotalPixels: Long = 128L * 1024 * 1024

  def decodeFrames(bytes: Array[Byte],
                   maxFrames: Int = 1 << 16): Option[Vector[PnmCodec.Image]] = {
    if (bytes == null || bytes.length < 12) return None
    if (!fourcc(bytes, 0, "RIFF") || !fourcc(bytes, 8, "AVI ")) return None
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
    val frames = Vector.newBuilder[PnmCodec.Image]
    var nFrames = 0
    var totalPx = 0L
    var bad = false

    def walk(from: Int, end: Int, inMovi: Boolean): Unit = {
      var off = from
      while (!bad && nFrames < maxFrames && off + 8 <= end) {
        val size = u32(bytes, off + 4)
        val dataStart = off + 8
        val dataEnd = dataStart + size
        if (dataEnd > end) { bad = true; return } // malformed framing
        if (fourcc(bytes, off, "LIST")) {
          if (dataStart + 4 <= dataEnd) {
            val listType = new String(bytes, dataStart, 4, "US-ASCII")
            val movi = listType == "movi" || listType == "rec "
            walk(dataStart + 4, dataEnd.toInt, inMovi || movi)
          }
        } else if (inMovi && isVideoChunk(bytes, off)) {
          val payload = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd.toInt)
          ImageIoCodec.decode(payload) match {
            case Some(img) =>
              totalPx += img.width.toLong * img.height
              if (totalPx > MaxTotalPixels) { bad = true; return }
              frames += img
              nFrames += 1
            case None => bad = true; return // corrupt frame = corrupt clip
          }
        }
        off = (dataEnd + (size & 1)).toInt // chunks are word-aligned
      }
    }

    walk(12, riffEnd, inMovi = false)
    if (bad || nFrames == 0) None else Some(frames.result())
  }

  /** `##dc`/`##db`: two stream-id digits + compressed/uncompressed video. */
  private def isVideoChunk(b: Array[Byte], off: Int): Boolean = {
    def digit(c: Byte) = c >= '0' && c <= '9'
    digit(b(off)) && digit(b(off + 1)) &&
      (b(off + 2) == 'd' && (b(off + 3) == 'c' || b(off + 3) == 'b'))
  }

  private def fourcc(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + 4 && b(off) == s.charAt(0) && b(off + 1) == s.charAt(1) &&
      b(off + 2) == s.charAt(2) && b(off + 3) == s.charAt(3)

  /** Little-endian u32 as Long (RIFF sizes are unsigned). */
  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
}
