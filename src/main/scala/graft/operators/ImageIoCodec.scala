package graft.operators

import java.io.ByteArrayInputStream

/** Compressed-image decode (JPEG, plus PNG/BMP/GIF) via the JDK's own
  * `javax.imageio` — the `java.desktop` module ships in this JVM, so JPEG
  * needs NO native or third-party codec. Output is normalized to the same
  * `PnmCodec.Image` raster the pure-JVM codecs produce (8-bit gray or RGB,
  * row-major interleaved), so nearest-neighbor resize and the exact
  * per-channel feature pass are shared across every image route.
  *
  * Curation semantics match the hand-rolled codecs: anything undecodable
  * (truncated, not an image, unsupported color model) returns None and the
  * row is dropped; a decompression-bomb guard bounds the decoded raster, not
  * the payload, since compressed bytes say nothing about pixel count.
  */
object ImageIoCodec {

  /** Decoded rasters above this pixel count are rejected — same bomb-guard
    * posture as `PngCodec` (a few-KB payload can inflate to gigabytes). */
  val MaxPixels: Long = 64L * 1024 * 1024

  def decode(bytes: Array[Byte]): Option[PnmCodec.Image] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return None // no registered reader claimed the bytes
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
      val gray = img.getColorModel.getNumColorComponents == 1
      if (gray) {
        // raw raster samples, NOT getRGB: gray->sRGB conversion is nonlinear
        // and would diverge from the PNG/PNM codecs' raw 8-bit values.
        // Only 8-bit samples qualify: getSample(..).toByte on 16-bit
        // (TYPE_USHORT_GRAY) or 1-bit sources would silently truncate /
        // mis-scale — PngCodec drops 16-bit as out-of-subset, so this route
        // must too, or the two codecs diverge on the same image class.
        if (img.getColorModel.getComponentSize(0) != 8) return None
        val raster = img.getRaster
        val out = new Array[Byte](w * h)
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(i) = raster.getSample(x, y, 0).toByte
            i += 1
            x += 1
          }
          y += 1
        }
        Some(PnmCodec.Image(w, h, 1, out))
      } else {
        // getRGB normalizes every RGB-family layout (BGR order, palette,
        // alpha) to packed sRGB ints — exact 8-bit channels for 8-bit
        // sources; alpha is ignored (the hand-rolled codecs treat alpha as
        // out-of-subset, here the color channels are still meaningful)
        val out = new Array[Byte](w * h * 3)
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val argb = img.getRGB(x, y)
            out(i) = ((argb >> 16) & 0xff).toByte
            out(i + 1) = ((argb >> 8) & 0xff).toByte
            out(i + 2) = (argb & 0xff).toByte
            i += 3
            x += 1
          }
          y += 1
        }
        Some(PnmCodec.Image(w, h, 3, out))
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}
