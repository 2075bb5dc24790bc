package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synthetic media lake for the media family's DRIVER-ORACLE
  * rows (q115+): every pixel is a closed-form integer function of
  * (doc_id, pixel index, channel), re-derivable bit-for-bit in DuckDB
  * INT128 SQL (`OracleHashSql.synthPix`), so the REAL decode → lumaGrid →
  * dhash64 pipeline gains a red-capable independent oracle — the r11
  * verdict's top ask (the media family was the only first-class operator
  * family verified by specs/probes alone).
  *
  * Lake shape: 9×8 rasters (the dHash grid's own geometry, so `lumaGrid`
  * is the identity sampling and the oracle needs no box-average model),
  * groups of near-identical images (`doc_id % Grp`), even groups binary
  * PGM (P5, gray — pins the 1-channel decode path), odd groups binary PPM
  * (P6, RGB — pins the 3-channel path AND the integer luma fold). Each
  * doc perturbs `doc_id % 3` pixels to a doc-specific pattern, planting
  * within-group dhash distances of ≤ 8 bits (each perturbed cell flips at
  * most 2 adjacent-comparison bits per its two neighboring grid edges ×
  * one row) while cross-group signatures stay effectively random.
  *
  * All arithmetic is Long wraparound (mod 2^64) + low-byte extraction —
  * exactly mirrorable with the oracle's HUGEINT helpers.
  */
object SyntheticMedia {

  /** Number of near-dup groups (doc_id % Grp). */
  val Grp = 40L

  /** Pixel value in [0, 256): two LCG-style mixing rounds over
    * (seed, pixel index, channel), low byte. Mirrored by
    * `OracleHashSql.synthPix` in HUGEINT SQL. */
  def pixel(seed: Long, i: Int, c: Int): Int = {
    val u1 = seed * 2654435761L + i * 40503L + c * 69427L + 98765L
    val u2 = u1 * 6364136223846793005L + 1442695040888963407L
    ((u2 ^ (u2 >>> 31)) & 0xffL).toInt
  }

  /** The doc's perturbed pixel indices: `doc_id % 3` cells at
    * (doc_id·31 + j·29) % 72. */
  def perturbIdx(d: Long): Set[Int] =
    (0 until (d % 3).toInt).map(j => ((d * 31 + j * 29) % 72).toInt).toSet

  /** Binary PNM payload for doc `d`: P5 gray for even groups, P6 RGB for
    * odd, 9×8, maxval 255. */
  def ppm(d: Long): Array[Byte] = {
    val g = d % Grp
    val color = g % 2 == 1
    val pert = perturbIdx(d)
    // every 101st doc is NOVEL — a doc-unique pattern far from every group,
    // so the admission gate (q117) has true positives to admit, not just
    // rejections
    val baseSeed = if (d % 101 == 0) d + 5000011L else g
    val channels = if (color) 3 else 1
    val header = (if (color) "P6" else "P5") + "\n9 8\n255\n"
    val pix = Array.tabulate[Byte](72 * channels) { idx =>
      val i = idx / channels
      val c = idx % channels
      val seed = if (pert(i)) d + 1000003L else baseSeed
      pixel(seed, i, c).toByte
    }
    header.getBytes("US-ASCII") ++ pix
  }

  /** The (media_id, kind, payload) lake over a driver table's id column —
    * a deterministic per-row map, identical under any partitioning. */
  def mediaFrame(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    frameOf(docs, idCol, "image", ppm)

  /** Number of video near-dup groups (doc_id % VGrp). */
  val VGrp = 30L

  /** Binary Y4M clip for doc `d`: ((d % 3) + 1) gray 9×8 frames; frame f's
    * luma plane is the GROUP's pattern `pixel(grp·8 + f, i, 0)`, so
    * same-group clips share their prefix frames — REAL decoded clip
    * near-dups (q119/q120). C420 chroma planes are neutral fill (the
    * consumers are chroma-blind by design). */
  def y4mClip(d: Long): Array[Byte] = {
    val g = d % VGrp
    val nf = (d % 3).toInt + 1
    val header = "YUV4MPEG2 W9 H8 F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val cb = 2 * ((9 + 1) / 2) * ((8 + 1) / 2)
    header ++ (0 until nf).flatMap { f =>
      val y = Array.tabulate[Byte](72)(i => pixel(g * 8 + f, i, 0).toByte)
      "FRAME\n".getBytes("US-ASCII") ++ y ++ Array.fill[Byte](cb)(-128)
    }
  }

  /** RIFF/WAVE mono 16-bit PCM for doc `d`: EXACTLY 65 frames, so
    * `WavCodec.afp64`'s 65 equal-duration bins degenerate to one frame per
    * bin and bit i compares single-sample energies — |s_i|² < |s_{i+1}|²
    * with amplitudes from the pixel function, re-derivable in SQL (q121).
    * Signs alternate (realistic zero-crossing audio); energy is
    * sign-blind. */
  def wav(d: Long): Array[Byte] = {
    val n = 65
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    var b = 0
    while (b < n) {
      val amp = pixel(d, b, 0)
      bb.putShort((if (b % 2 == 0) amp else -amp).toShort)
      b += 1
    }
    bb.array()
  }

  /** The synthetic VIDEO lake (q119/q120). */
  def videoFrame(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    frameOf(docs, idCol, "video", y4mClip)

  /** The synthetic AUDIO lake (q121). */
  def audioFrame(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    frameOf(docs, idCol, "audio", wav)

  private def frameOf(docs: DataFrame, idCol: String, kind: String,
                      make: Long => Array[Byte]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .map(d => (d, kind, make(d)))
      .toDF("media_id", "kind", "payload")
  }
}
