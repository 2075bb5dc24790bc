package graft

import graft.operators.{Dedup, Multimodal, PnmCodec, SyntheticMedia}
import org.apache.spark.sql.functions._

/** In-JVM twin of the q112–q118 DuckDB oracles: an INDEPENDENT model of the
  * synthetic lake's expected dhashes (luma + bit assembly re-derived here
  * from `SyntheticMedia.pixel`, NOT via `PnmCodec.lumaGrid`) pins the real
  * decode chain, and brute-force pair/admission models pin the banding
  * engines — red-capable locally before the driver's DuckDB compare runs. */
class MediaOracleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.range(0, 300).select($"id".cast("long").as("doc_id"))

  /** Independent expected-dhash model: pixel formula → luma → adjacent
    * comparisons, mirroring the DuckDB oracle's math, not the codec's. */
  private def expectedDhash(d: Long): Long = {
    val g = d % SyntheticMedia.Grp
    val pert = SyntheticMedia.perturbIdx(d)
    val base = if (d % 101 == 0) d + 5000011L else g
    def luma(i: Int): Int = {
      val seed = if (pert(i)) d + 1000003L else base
      if (g % 2 == 0) SyntheticMedia.pixel(seed, i, 0)
      else {
        val r = SyntheticMedia.pixel(seed, i, 0)
        val gg = SyntheticMedia.pixel(seed, i, 1)
        val b = SyntheticMedia.pixel(seed, i, 2)
        (77 * r + 150 * gg + 29 * b) >> 8
      }
    }
    (0 until 64).foldLeft(0L) { (h, b) =>
      val i1 = (b / 8) * 9 + (b % 8)
      if (luma(i1) < luma(i1 + 1)) h | (1L << b) else h
    }
  }

  test("real decode chain == independent pixel-model dhash, P5 and P6") {
    val media = SyntheticMedia.mediaFrame(docs)
    // both raster families are present and decode to 9x8 with the right depth
    val sample = media.filter($"media_id".isin(0L, 1L)).collect()
    sample.foreach { r =>
      val img = PnmCodec.decode(r.getAs[Array[Byte]]("payload")).get
      assert(img.width == 9 && img.height == 8)
      assert(img.channels == (if (r.getLong(0) % SyntheticMedia.Grp % 2 == 1) 3 else 1))
    }
    val got = Multimodal.perceptualHashes(media, Multimodal.anyImagePhashHasher())
      .as[(Long, Long)].collect().toMap
    assert(got.size == 300) // every payload decodable
    (0L until 300L).foreach { d =>
      assert(got(d) == expectedDhash(d), s"dhash mismatch for doc $d")
    }
  }

  test("banded near-dup pairs and admission == brute-force models") {
    val dh = (0L until 300L).map(d => d -> expectedDhash(d)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val media = SyntheticMedia.mediaFrame(docs)

    val expectPairs = (for {
      a <- 0L until 300L; b <- (a + 1) until 300L
      if ham(dh(a), dh(b)) <= 8
    } yield (a, b, ham(dh(a), dh(b)))).toSet
    val gotPairs = Multimodal.imageNearDupPairs(media,
        Multimodal.anyImagePhashHasher(), maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(gotPairs == expectPairs)
    assert(expectPairs.nonEmpty)

    val incoming = (0L until 300L).filter(d => (d / 40) % 5 == 0)
    val corpus = (0L until 300L).filterNot(d => (d / 40) % 5 == 0)
    val expectAdmitted = incoming.filter(i =>
      corpus.forall(c => ham(dh(i), dh(c)) > 8)).toSet
    val corpusHashes = Multimodal.perceptualHashes(
      media.filter(expr("media_id div 40") % 5 =!= 0),
      Multimodal.anyImagePhashHasher())
    val gotAdmitted = Multimodal.admitNewMedia(corpusHashes,
        media.filter(expr("media_id div 40") % 5 === 0),
        Multimodal.anyImagePhashHasher(), maxHamming = 8)
      .select($"media_id").as[Long].collect().toSet
    assert(gotAdmitted == expectAdmitted)
    assert(expectAdmitted.nonEmpty, "admission row must have true positives")
  }

  test("real Y4M + WAV decode chains == independent pixel/amplitude models") {
    // video: per-frame dhash from the pixel model, never via the codec
    def expectedFrameDhash(d: Long, f: Int): Long = {
      def luma(i: Int) =
        SyntheticMedia.pixel((d % SyntheticMedia.VGrp) * 8 + f, i, 0)
      (0 until 64).foldLeft(0L) { (h, b) =>
        val i1 = (b / 8) * 9 + (b % 8)
        if (luma(i1) < luma(i1 + 1)) h | (1L << b) else h
      }
    }
    val vids = SyntheticMedia.videoFrame(docs)
    val gotFrames = Multimodal.frameSignatures(vids,
        Multimodal.y4mFrameHasher())
      .as[(Long, Int, Long)].collect().toSet
    val expectFrames = (for {
      d <- 0L until 300L; f <- 0 to (d % 3).toInt
    } yield (d, f, expectedFrameDhash(d, f))).toSet
    assert(gotFrames == expectFrames)
    // audio: afp64 from the amplitude model (65 frames -> per-sample bins)
    def expectedAfp(d: Long): Long =
      (0 until 64).foldLeft(0L) { (h, b) =>
        val a1 = SyntheticMedia.pixel(d, b, 0).toLong
        val a2 = SyntheticMedia.pixel(d, b + 1, 0).toLong
        if (a1 * a1 < a2 * a2) h | (1L << b) else h
      }
    val gotAfp = Multimodal.perceptualHashes(SyntheticMedia.audioFrame(docs),
        Multimodal.anyAudioFpHasher())
      .as[(Long, Long)].collect().toMap
    assert(gotAfp.size == 300)
    (0L until 300L).foreach(d => assert(gotAfp(d) == expectedAfp(d)))
  }

  test("signature banding engines == brute force on the synthetic sig frame") {
    // q112/q113's frame: xxhash64 base + bit flips, built directly (bases
    // fetched once from the engine's own xxhash64 — one tiny job)
    val bases = spark.range(0, 97).select($"id", xxhash64($"id"))
      .as[(Long, Long)].collect().toMap
    def sigOf(d: Long): Long =
      (0 until 3).foldLeft(bases(d % 97)) { (acc, j) =>
        if (d % 4 > j) acc ^ (1L << ((d * 7 + j * 17) % 64).toInt) else acc
      }
    val ids = (0L until 200L).toSeq
    val sigs = ids.map(d => d -> sigOf(d)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val sigDf = ids.map(d => (d, sigs(d))).toDF("media_id", "simhash")
    val got = Dedup.simhashBandPairs(sigDf, "media_id", maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    val expect = (for {
      a <- ids; b <- ids if a < b && ham(sigs(a), sigs(b)) <= 6
    } yield (a, b, ham(sigs(a), sigs(b)))).toSet
    assert(got == expect)
    assert(expect.nonEmpty)
  }
}
