package graft.operators

/** Pure-JVM decoder for YUV4MPEG2 (`.y4m`) — the standard UNCOMPRESSED video
  * interchange format (plain-text stream header, `FRAME` markers, raw planar
  * YUV). Like PNM for images and RIFF/WAVE PCM for audio, y4m is the honest
  * end of the video story in this environment: raw video gets a REAL codec
  * with zero native dependencies, and only compressed video (H.264/VP9/AV1,
  * whose decoders no JDK module ships) stays behind the documented stub seam.
  *
  * Only the Y (luma) plane is materialized — per-frame gray
  * [[PnmCodec.Image]]s — because every downstream consumer here (perceptual
  * dHash, luma statistics) is chroma-blind; the chroma planes are skipped by
  * size. Supported chroma tags cover the format's inventory: C420 (+jpeg/
  * mpeg2/paldv siting suffixes), C422, C444, Cmono.
  */
object Y4mCodec {

  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")

  /** Bytes of chroma per frame, given luma size, or -1 for unsupported. */
  private def chromaBytes(tag: String, w: Int, h: Int): Long = tag match {
    case "" | "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
      2L * ((w + 1) / 2) * ((h + 1) / 2)
    case "422" => 2L * ((w + 1) / 2) * h
    case "444" => 2L * w * h
    case "mono" => 0L
    case _ => -1L
  }

  /** Decode a y4m payload to its luma frames (gray images, channels = 1).
    * None for anything that is not well-formed y4m within the supported
    * chroma inventory — callers treat undecodable payloads as filtered.
    * `maxFrames` caps materialization (a byte payload can only hold
    * payload/frameBytes frames, so this is a belt, not a bomb guard). */
  def decodeFrames(bytes: Array[Byte],
                   maxFrames: Int = 1 << 16): Option[Vector[PnmCodec.Image]] = {
    if (bytes == null || bytes.length < Magic.length + 1) return None
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic(i)) return None
      i += 1
    }
    var pos = Magic.length
    def readLine(): Option[String] = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      if (pos >= bytes.length) None
      else { val s = new String(bytes, start, pos - start, "US-ASCII")
             pos += 1; Some(s) }
    }
    val header = readLine().getOrElse(return None)
    var w = -1; var h = -1; var chroma = ""
    for (tok <- header.trim.split("\\s+") if tok.nonEmpty) tok.charAt(0) match {
      case 'W' => w = tok.drop(1).toIntOption.getOrElse(-1)
      case 'H' => h = tok.drop(1).toIntOption.getOrElse(-1)
      case 'C' => chroma = tok.drop(1)
      case _ => () // F/I/A/X params don't affect plane layout
    }
    if (w <= 0 || h <= 0) return None
    val cBytes = chromaBytes(chroma, w, h)
    if (cBytes < 0) return None
    val lumaBytes = w.toLong * h
    if (lumaBytes > Int.MaxValue) return None
    val frames = Vector.newBuilder[PnmCodec.Image]
    var n = 0
    while (pos < bytes.length && n < maxFrames) {
      // each frame: "FRAME" [params] "\n" then the planes
      val marker = readLine().getOrElse(return None)
      if (!marker.startsWith("FRAME")) return None
      if (bytes.length - pos < lumaBytes + cBytes) return None
      val y = java.util.Arrays.copyOfRange(bytes, pos, pos + lumaBytes.toInt)
      frames += PnmCodec.Image(w, h, 1, y)
      pos += (lumaBytes + cBytes).toInt
      n += 1
    }
    if (n == 0) None else Some(frames.result())
  }
}
