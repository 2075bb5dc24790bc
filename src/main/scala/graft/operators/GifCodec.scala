package graft.operators

import java.io.ByteArrayInputStream

import scala.util.control.NonFatal

/** Multi-frame GIF decode via the JDK's own `javax.imageio` GIF reader — a
  * REAL compressed-video codec (LZW frames, palette color, inter-frame
  * disposal) with zero dependencies beyond the `java.desktop` module the
  * JVM already ships. Implements `Y4mCodec.decodeFrames`' exact contract,
  * so every frame consumer (`frameSignatures`, `videoNearDupPairs`, the
  * video admission gates, `MediaCurationJob --modality video`) runs
  * unchanged on animated GIFs; with this, the stub seam shrinks to
  * perceptual audio (MP3/AAC/Opus) and inter-predicted video
  * (H.264/VP9/AV1), whose decoders exist nowhere in the JDK.
  *
  * Animation semantics are honored, not just frame-listed: each frame is
  * composited onto the logical-screen canvas at its (left, top) offset, and
  * the per-frame disposal method is applied afterwards —
  * `restoreToBackgroundColor` clears the frame's rectangle,
  * `restoreToPrevious` reverts the canvas — so a delta-encoded GIF yields
  * the frames a viewer displays, which is what perceptual frame hashing
  * must see. Output frames are RGB rasters (GIF is palette color);
  * transparent pixels read as black, deterministically.
  */
object GifCodec {

  /** Same bomb-guard posture as `ImageIoCodec`: the CANVAS (logical screen)
    * is bounded per frame; payload size says nothing about pixel count. */
  val MaxPixels: Long = 64L * 1024 * 1024

  /** Aggregate materialization bound: every decoded frame is a full-canvas
    * RGB copy, so the per-frame canvas guard alone leaves frameCount ×
    * canvas unbounded — a few-KB LZW payload declaring a large screen and
    * thousands of 1×1 sub-images would build hundreds of GB of rasters and
    * OOM the executor (and OutOfMemoryError is not NonFatal: the row would
    * not drop, the task would die). Y4M needs no such bound — uncompressed
    * frames can never exceed the payload's own byte count. 128M pixels =
    * 384 MB of frames per payload, worst case. */
  val MaxTotalPixels: Long = 128L * 1024 * 1024

  private val Magic87 = "GIF87a".getBytes("US-ASCII")
  private val Magic89 = "GIF89a".getBytes("US-ASCII")

  /** Decode a GIF payload to its displayed frames (RGB images, channels=3).
    * None for anything that is not a decodable GIF — callers treat
    * undecodable payloads as filtered (the curation semantic).
    * `maxFrames` caps materialization like `Y4mCodec.decodeFrames`. */
  def decodeFrames(bytes: Array[Byte],
                   maxFrames: Int = 1 << 16): Option[Vector[PnmCodec.Image]] = {
    if (bytes == null || bytes.length < 6) return None
    if (!(bytes.startsWith(Magic87) || bytes.startsWith(Magic89))) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      reader = readers.next()
      reader.setInput(iis, /* seekForwardOnly = */ false,
        /* ignoreMetadata = */ false)
      val n = math.min(reader.getNumImages(/* allowSearch = */ true), maxFrames)
      if (n <= 0) return None

      // logical screen: prefer the stream descriptor; fall back to frame 0
      val (sw, sh) = streamSize(reader).getOrElse {
        (reader.getWidth(0), reader.getHeight(0))
      }
      if (sw <= 0 || sh <= 0 || sw.toLong * sh > MaxPixels) return None
      // aggregate bomb guard: n full-canvas frames materialize n*sw*sh
      // pixels regardless of payload size — refuse before allocating
      if (n.toLong * sw * sh > MaxTotalPixels) return None
      val canvas = new java.awt.image.BufferedImage(sw, sh,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      var previous: java.awt.image.BufferedImage = null
      val frames = Vector.newBuilder[PnmCodec.Image]
      var i = 0
      while (i < n) {
        val frame = reader.read(i)
        val (left, top, disposal) = frameMeta(reader, i)
        if (disposal == "restoreToPrevious") previous = copyOf(canvas)
        val g = canvas.createGraphics()
        try g.drawImage(frame, left, top, null) finally g.dispose()
        frames += toRgb(canvas)
        disposal match {
          case "restoreToBackgroundColor" =>
            // clear the frame's rectangle to transparent (reads as black)
            val g2 = canvas.createGraphics()
            try {
              g2.setComposite(java.awt.AlphaComposite.Clear)
              g2.fillRect(left, top, frame.getWidth, frame.getHeight)
            } finally g2.dispose()
          case "restoreToPrevious" =>
            val g2 = canvas.createGraphics()
            try {
              g2.setComposite(java.awt.AlphaComposite.Src)
              g2.drawImage(previous, 0, 0, null)
            } finally g2.dispose()
          case _ => () // none / doNotDispose: the canvas accumulates
        }
        i += 1
      }
      Some(frames.result())
    } catch {
      case NonFatal(_) => None
    } finally {
      if (reader != null) reader.dispose()
      if (iis != null) try iis.close() catch { case NonFatal(_) => () }
    }
  }

  private def copyOf(src: java.awt.image.BufferedImage) = {
    val c = new java.awt.image.BufferedImage(src.getWidth, src.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val g = c.createGraphics()
    try { g.setComposite(java.awt.AlphaComposite.Src); g.drawImage(src, 0, 0, null) }
    finally g.dispose()
    c
  }

  private def streamSize(reader: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val sm = reader.getStreamMetadata
      if (sm == null) return None
      val tree = sm.getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val lsd = tree.getElementsByTagName("LogicalScreenDescriptor")
      if (lsd.getLength == 0) return None
      val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
      Some((e.getAttribute("logicalScreenWidth").toInt,
        e.getAttribute("logicalScreenHeight").toInt))
    } catch { case NonFatal(_) => None }

  /** (left, top, disposalMethod) of frame i from the GIF image metadata. */
  private def frameMeta(reader: javax.imageio.ImageReader,
                        i: Int): (Int, Int, String) =
    try {
      val md = reader.getImageMetadata(i)
      val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      def attr(tag: String, name: String): Option[String] = {
        val nodes = tree.getElementsByTagName(tag)
        if (nodes.getLength == 0) None
        else Option(nodes.item(0).asInstanceOf[org.w3c.dom.Element]
          .getAttribute(name)).filter(_.nonEmpty)
      }
      (attr("ImageDescriptor", "imageLeftPosition").flatMap(_.toIntOption)
         .getOrElse(0),
       attr("ImageDescriptor", "imageTopPosition").flatMap(_.toIntOption)
         .getOrElse(0),
       attr("GraphicControlExtension", "disposalMethod").getOrElse("none"))
    } catch { case NonFatal(_) => (0, 0, "none") }

  private def toRgb(canvas: java.awt.image.BufferedImage): PnmCodec.Image = {
    val w = canvas.getWidth
    val h = canvas.getHeight
    val out = new Array[Byte](w * h * 3)
    // the canvas is our own TYPE_INT_ARGB image, so its raster's backing
    // int[] IS the packed ARGB pixels — read it directly instead of
    // per-pixel getRGB (a ColorModel conversion per call, in the hot loop
    // of a decode-bound job)
    val argbs = canvas.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var p = 0
    var i = 0
    val npx = w * h
    while (p < npx) {
      val argb = argbs(p)
      // transparent pixels carry no color — read as black, deterministically
      val opaque = (argb >>> 24) != 0
      out(i) = (if (opaque) (argb >> 16) & 0xff else 0).toByte
      out(i + 1) = (if (opaque) (argb >> 8) & 0xff else 0).toByte
      out(i + 2) = (if (opaque) argb & 0xff else 0).toByte
      i += 3
      p += 1
    }
    PnmCodec.Image(w, h, 3, out)
  }
}
