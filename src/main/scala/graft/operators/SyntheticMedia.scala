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

  // ---- compressed-container fixtures (r17 — the q156 census lake) ----
  // Every governable field is a closed-form integer function of doc_id,
  // re-derivable in plain SQL, so the REAL box/EBML walk gains a
  // red-capable independent oracle (the q115 discipline at the container
  // layer). Shared formulas across both containers:
  //   duration_ms = 1000 + (d % 60)·500      (exact at timescale 600)
  //   width  = 320 + 16·(d % 8)   height = 240 + 16·(d % 5)
  //   channels / rate / codec dials key on d/2: parity picks the
  //   CONTAINER (even mp4, odd mkv), so a d-keyed dial would freeze each
  //   container to half its value space
  //   channels = 1 + (d/2 % 2)    sample_rate = 48000 or 44100 by d/2 % 2
  //   video codec index = d/2 % 4   audio codec index = d/2 % 2

  def containerDurMs(d: Long): Long = 1000L + (d % 60) * 500L
  def containerW(d: Long): Int = 320 + 16 * (d % 8).toInt
  def containerH(d: Long): Int = 240 + 16 * (d % 5).toInt
  def containerChans(d: Long): Int = 1 + ((d / 2) % 2).toInt
  def containerRate(d: Long): Int = if ((d / 2) % 2 == 0) 48000 else 44100

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ ascii(typ) ++ payload

  /** Closed-form MP4 for doc `d`: spec-true box layout (ftyp + moov(mvhd,
    * video trak, audio trak) + mdat), full-size mvhd/tkhd/mdhd payloads,
    * version 0/1 alternating on (d/2) % 2 so both box layouts are
    * exercised. No codec-config child boxes (avcC…) — the census walk
    * reads structure, not bitstream. */
  def mp4(d: Long): Array[Byte] = {
    val v1 = (d / 2) % 2 == 1
    val durMs = containerDurMs(d)
    val ts = 600L
    val dur = durMs * ts / 1000L
    val vcodec = Seq("avc1", "hev1", "vp09", "av01")(((d / 2) % 4).toInt)
    val ftyp = box("ftyp", ascii("isom") ++ be32(0x200L))
    val mvhd = box("mvhd",
      if (v1)
        Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(ts) ++
          be64(dur) ++ be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++
          Array.fill[Byte](8)(0) ++ identityMatrix ++
          Array.fill[Byte](24)(0) ++ be32(3)
      else
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(ts) ++
          be32(dur) ++ be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++
          Array.fill[Byte](8)(0) ++ identityMatrix ++
          Array.fill[Byte](24)(0) ++ be32(3))
    def tkhd(trackId: Long, w: Int, h: Int) = box("tkhd",
      Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++ be32(trackId) ++
        be32(0) ++ be32(dur) ++ Array.fill[Byte](8)(0) ++ be16(0) ++
        be16(0) ++ be16(0) ++ be16(0) ++ identityMatrix ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    def mdhd = box("mdhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(1000L) ++
        be32(durMs) ++ be16(0x55c4) ++ be16(0))
    def hdlr(handler: String) = box("hdlr",
      Array.fill[Byte](4)(0) ++ be32(0) ++ ascii(handler) ++
        Array.fill[Byte](12)(0) ++ Array[Byte](0))
    val videoEntry = be32(86L) ++ ascii(vcodec) ++
      Array.fill[Byte](6)(0) ++ be16(1) ++ Array.fill[Byte](16)(0) ++
      be16(containerW(d)) ++ be16(containerH(d)) ++ be32(0x00480000L) ++
      be32(0x00480000L) ++ be32(0) ++ be16(1) ++ Array.fill[Byte](32)(0) ++
      be16(24) ++ be16(0xffff)
    val audioEntry = be32(36L) ++ ascii("mp4a") ++
      Array.fill[Byte](6)(0) ++ be16(1) ++ be16(0) ++ be16(0) ++ be32(0) ++
      be16(containerChans(d)) ++ be16(16) ++ be16(0) ++ be16(0) ++
      be32(containerRate(d).toLong << 16)
    def stbl(entry: Array[Byte]) = box("stbl",
      box("stsd", Array.fill[Byte](4)(0) ++ be32(1) ++ entry))
    def trak(trackId: Long, handler: String, entry: Array[Byte],
             w: Int, h: Int) =
      box("trak", tkhd(trackId, w, h) ++
        box("mdia", mdhd ++ hdlr(handler) ++ box("minf", stbl(entry))))
    val moov = box("moov", mvhd ++
      trak(1, "vide", videoEntry, containerW(d), containerH(d)) ++
      trak(2, "soun", audioEntry, 0, 0))
    val fill = Array.tabulate[Byte]((200 + d % 977).toInt)(i =>
      pixel(d, i, 0).toByte)
    ftyp ++ moov ++ box("mdat", fill)
  }

  private val identityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  // EBML builders: ids write with their wire bytes, sizes as 1- or 2-byte
  // varints (payloads here are tiny)
  private def ebmlId(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (0 until n).reverse.map(i => ((id >> (8 * i)) & 0xff).toByte).toArray
  }
  private def ebmlSize(n: Int): Array[Byte] =
    if (n < 127) Array((0x80 | n).toByte)
    else Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ ebmlSize(payload.length) ++ payload
  private def elUint(id: Long, v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    el(id, (0 until n).reverse.map(i => ((v >> (8 * i)) & 0xff).toByte).toArray)
  }
  private def elFloat(id: Long, v: Double): Array[Byte] =
    el(id, be64(java.lang.Double.doubleToLongBits(v)))
  private def elStr(id: Long, s: String): Array[Byte] = el(id, ascii(s))

  /** Closed-form Matroska/WebM for doc `d`: EBML header (DocType webm when
    * d % 3 == 0, matroska otherwise) + Segment(Info(TimestampScale,
    * Duration float64) + Tracks(video TrackEntry + audio TrackEntry)) +
    * a filler Void element standing in for clusters. */
  def mkv(d: Long): Array[Byte] = {
    val docType = if (d % 3 == 0) "webm" else "matroska"
    val vcodec = Seq("V_MPEG4/ISO/AVC", "V_MPEGH/ISO/HEVC", "V_VP9",
      "V_AV1")(((d / 2) % 4).toInt)
    val acodec = Seq("A_AAC", "A_OPUS")(((d / 2) % 2).toInt)
    val header = el(0x1A45DFA3L, elStr(0x4282L, docType))
    val info = el(0x1549A966L,
      elUint(0x2AD7B1L, 1000000L) ++
        elFloat(0x4489L, containerDurMs(d).toDouble))
    val vtrack = el(0xAEL,
      elUint(0x83L, 1L) ++ elStr(0x86L, vcodec) ++
        el(0xE0L, elUint(0xB0L, containerW(d).toLong) ++
          elUint(0xBAL, containerH(d).toLong)))
    val atrack = el(0xAEL,
      elUint(0x83L, 2L) ++ elStr(0x86L, acodec) ++
        el(0xE1L, elFloat(0xB5L, containerRate(d).toDouble) ++
          elUint(0x9FL, containerChans(d).toLong)))
    val fill = Array.tabulate[Byte]((200 + d % 977).toInt)(i =>
      pixel(d + 7L, i, 0).toByte)
    header ++ el(0x18538067L,
      info ++ el(0x1654AE6BL, vtrack ++ atrack) ++ el(0xECL, fill))
  }

  /** The synthetic COMPRESSED-CONTAINER lake (q156): even docs MP4, odd
    * docs Matroska — one frame covering both walks. */
  def containerFrame(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .map(d => (d, "video", if (d % 2 == 0) mp4(d) else mkv(d)))
      .toDF("media_id", "kind", "payload")
  }
}
