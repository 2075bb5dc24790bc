package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.{AviMjpegCodec, Multimodal, PnmCodec}
import javax.imageio.ImageIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** MJPEG-in-AVI as a real compressed-video codec: frames JPEG-encoded by
  * the JDK's own writer inside a hand-built (structurally valid) AVI
  * container must decode back through the RIFF walk, survive the lossy
  * round-trip within dHash tolerance of their uncompressed Y4M twins, and
  * drive the clip near-dup engine on a mixed AVI/Y4M lake. Containers
  * sharing identical JPEG bytes decode identically (the re-container /
  * re-order near-dup case is exact). */
class AviMjpegCodecSpec extends SparkSpec {
  import spark.implicits._

  private val W = 32
  private val H = 32

  /** 9x8 cell-block gray pattern (r=g=b) — adjacent cell means spaced far
    * apart, so dHash comparisons are robust to JPEG quantization noise. */
  private def cellFrame(cells: Array[Int]): BufferedImage = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        val v = cells((y * 8 / H) * 9 + x * 9 / W) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** High-contrast deterministic cells: neighbors alternate between the
    * 40/216 bands, so every dHash comparison has >= 60 luma of margin. */
  private def cellsOf(seed: Int): Array[Int] =
    Array.tabulate(72) { i =>
      val r = (seed * 73 + i * 151) ^ (i * seed + 17)
      if ((i + seed) % 2 == 0) 40 + (r & 31) else 216 - (r & 31)
    }

  private def jpeg(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal structurally-valid AVI: RIFF(AVI ) { LIST(hdrl){avih},
    * LIST(movi){ 00dc* } } — stream header detail is not needed by
    * consumers (frame dims ride in the JPEGs). */
  private def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ payload)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def y4m(framesCells: Seq[Array[Int]]): Array[Byte] = {
    val cb = 2 * ((W + 1) / 2) * ((H + 1) / 2)
    val header = s"YUV4MPEG2 W$W H$H F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    header ++ framesCells.flatMap { cells =>
      val y = Array.tabulate[Byte](W * H) { i =>
        val x = i % W; val yy = i / W
        cells((yy * 8 / H) * 9 + x * 9 / W).toByte
      }
      "FRAME\n".getBytes("US-ASCII") ++ y ++ Array.fill[Byte](cb)(-128)
    }
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("AVI round-trip: MJPEG frames decode through the RIFF walk, dHash-stable vs Y4M") {
    val patterns = (1 to 4).map(cellsOf)
    val clip = avi(patterns.map(p => jpeg(cellFrame(p))))
    val frames = AviMjpegCodec.decodeFrames(clip).get
    assert(frames.size == 4)
    assert(frames.forall(f => f.width == W && f.height == H && f.channels == 3))
    // lossy codec: dHash must survive quantization (high-contrast cells ->
    // exact in practice; assert a hard small bound so a real regression
    // trips while JPEG noise cannot)
    val y4mFrames = graft.operators.Y4mCodec.decodeFrames(y4m(patterns)).get
    (frames zip y4mFrames).foreach { case (a, y) =>
      assert(hamming(PnmCodec.dhash64(a), PnmCodec.dhash64(y)) <= 2)
    }
    // identical JPEG bytes in two containers decode identically (exact)
    val re = avi(patterns.map(p => jpeg(cellFrame(p))))
    val reFrames = AviMjpegCodec.decodeFrames(re).get
    (frames zip reFrames).foreach { case (a, b) =>
      assert(PnmCodec.dhash64(a) == PnmCodec.dhash64(b))
    }
  }

  test("malformed and hostile AVIs are rejected, not half-decoded") {
    val good = jpeg(cellFrame(cellsOf(1)))
    assert(AviMjpegCodec.decodeFrames(null).isEmpty)
    assert(AviMjpegCodec.decodeFrames("RIFFxxxxWAVE".getBytes).isEmpty)
    // truncated: movi chunk claims more bytes than exist
    val clip = avi(Seq(good, good))
    assert(AviMjpegCodec.decodeFrames(clip.dropRight(40)).isEmpty)
    // corrupt frame payload -> whole clip rejected (no silent half-clip)
    val broken = avi(Seq(good, good.take(good.length / 2)))
    assert(AviMjpegCodec.decodeFrames(broken).isEmpty)
    // no video chunks at all
    assert(AviMjpegCodec.decodeFrames(avi(Nil)).isEmpty)
  }

  test("mixed AVI/Y4M lake: re-containered/reordered AVIs cluster; cross-format by tolerance") {
    val p = (1 to 3).map(cellsOf)
    val f = p.map(c => jpeg(cellFrame(c)))
    val lake = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "video", avi(Seq(f(0), f(1), f(2)))),
        Row(2L, "video", avi(Seq(f(2), f(0), f(1)))), // reordered twin of 1
        Row(3L, "video", avi(Seq(f(0)))),             // only 1 shared frame
        Row(4L, "video", y4m(p)),                     // same CONTENT, other codec
        Row(5L, "video", Array[Byte](1, 2, 3)))),     // junk
      graft.operators.Multimodal.mediaSchema.copy(fields =
        graft.operators.Multimodal.mediaSchema.fields.dropRight(1)))
    val sigs = Multimodal.frameSignatures(lake, Multimodal.anyVideoFrameHasher())
    assert(sigs.filter($"media_id" === 5L).isEmpty) // junk dropped at decode
    val pairs = Multimodal.videoNearDupPairsFromSigs(sigs, minSharedFrames = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // the exact-signature contract: identical JPEG bytes cluster (1,2);
    // doc 3 shares only one frame; Y4M doc 4 pairs with the AVIs exactly
    // when JPEG quantization cost 0 dHash bits (cross-format is verified
    // by TOLERANCE above, not required here)
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
