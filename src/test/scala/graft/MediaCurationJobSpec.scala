package graft

import java.nio.file.Files

import graft.jobs.MediaCurationJob
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The media curation tick end-to-end: decode gate, store admission,
  * within-tick clustering, min-id survivorship, store publication, S13
  * idempotence — composed from the spec-pinned multimodal operators. */
class MediaCurationJobSpec extends SparkSpec {
  import spark.implicits._

  private val w = 36; private val h = 32
  private def ppm(pix: Array[Byte]): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ pix
  private def ramp(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i => val px = i / 3; f(px % w, px / w).toByte }
  private def lake(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows),
    graft.operators.Multimodal.mediaSchema.copy(fields =
      graft.operators.Multimodal.mediaSchema.fields.dropRight(1)))

  private def writeCfg(m: Map[String, String]): String = {
    val f = Files.createTempFile("mediacfg", ".json")
    Files.writeString(f,
      m.map { case (k, v) => "\"" + k + "\": " + v }.mkString("{", ",\n", "}"))
    f.toString
  }

  test("tick: decode gate, store admission, clustering, survivors, published " +
       "store, idempotent re-run") {
    val a = ramp((x, _) => x * 7)
    val aEdit = a.clone()
    for (y <- 0 until 4; x <- 0 until 8; c <- 0 until 3)
      aEdit((y * w + x) * 3 + c) = 250.toByte
    val rev = ramp((x, _) => (w - 1 - x) * 7)
    val checker = ramp((x, _) => if ((x / 4) % 2 == 0) 200 else 50)

    val dir = Files.createTempDirectory("mediajob").toString
    // an existing lake already holds the reversed ramp's signature
    graft.operators.Multimodal.perceptualHashes(
        lake(Seq(Row(900L, "image", ppm(rev)))),
        graft.operators.Multimodal.anyImagePhashHasher())
      .write.parquet(s"$dir/store")
    // the tick: a dup-cluster {1, 2}, a store-dup {3}, a novel {4}, junk {5}
    lake(Seq(
      Row(1L, "image", ppm(a)),
      Row(2L, "image", ppm(aEdit)), // near-dup of 1 -> loses to min-id 1
      Row(3L, "image", ppm(rev)),   // already in the store -> rejected
      Row(4L, "image", ppm(checker)),
      Row(5L, "image", Array[Byte](1, 2)))) // undecodable -> dropped
      .write.parquet(s"$dir/tick")
    val cfg = writeCfg(Map(
      "media_path" -> ("\"" + dir + "/tick\""),
      "output_path" -> ("\"" + dir + "/out\""),
      "modality" -> "\"image\"",
      "max_hamming" -> "6",
      "signature_store" -> ("\"" + dir + "/store\"")))

    val stats = MediaCurationJob.run(spark, cfg).get
    assert(stats == MediaCurationJob.Stats(5, 4, 3, 2))
    val out = spark.read.parquet(s"$dir/out/media")
      .select($"media_id").as[Long].collect().toSet
    assert(out == Set(1L, 4L)) // min-id survivor + novel
    // the published store carries exactly the survivors' signatures
    val sigs = spark.read.parquet(s"$dir/out/sigs")
      .select($"media_id").as[Long].collect().toSet
    assert(sigs == Set(1L, 4L))
    // S13: a second run over the COMPLETED output is a no-op skip
    assert(MediaCurationJob.run(spark, cfg).isEmpty)
    // a crash between the two output writes leaves no _DONE marker — the
    // re-run must execute (not skip a store-less output forever) and heal
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmTree); f.delete()
    }
    rmTree(new java.io.File(s"$dir/out/sigs"))
    Files.delete(java.nio.file.Paths.get(s"$dir/out", "_DONE"))
    assert(MediaCurationJob.run(spark, cfg).contains(
      MediaCurationJob.Stats(5, 4, 3, 2)))
    assert(spark.read.parquet(s"$dir/out/sigs")
      .select($"media_id").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("video modality: clip clustering by shared frames, frame-store admission") {
    def y4m(frames: Seq[Array[Byte]]): Array[Byte] = {
      val cb = 2 * ((w + 1) / 2) * ((h + 1) / 2)
      s"YUV4MPEG2 W$w H$h C420jpeg\n".getBytes("US-ASCII") ++
        frames.flatMap(y => "FRAME\n".getBytes("US-ASCII") ++ y ++
          Array.fill[Byte](cb)(0))
    }
    def gray(f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(w * h)(i => f(i % w, i / w).toByte)
    val p1 = gray((x, _) => x * 7)
    val p2 = gray((x, _) => (w - 1 - x) * 7)
    val p3 = gray((x, _) => if ((x / 4) % 2 == 0) 200 else 50)
    val p4 = gray((x, _) => if (x < 18) x * 7 else (35 - x) * 7)

    val dir = Files.createTempDirectory("mediajobv").toString
    // store: a clip holding {p3, p4}
    graft.operators.Multimodal.frameSignatures(
        lake(Seq(Row(900L, "video", y4m(Seq(p3, p4))))),
        graft.operators.Multimodal.y4mFrameHasher())
      .write.parquet(s"$dir/store")
    lake(Seq(
      Row(1L, "video", y4m(Seq(p1, p2))),     // cluster with 2 (shares both)
      Row(2L, "video", y4m(Seq(p2, p1))),     // reordered twin -> loses to 1
      Row(3L, "video", y4m(Seq(p4, p3))),     // 2 frames shared w/ store -> rejected
      Row(4L, "video", y4m(Seq(p1, p4))),     // only 1 frame shared anywhere -> survives
      Row(5L, "video", Array[Byte](9))))      // undecodable
      .write.parquet(s"$dir/tick")
    val cfg = writeCfg(Map(
      "media_path" -> ("\"" + dir + "/tick\""),
      "output_path" -> ("\"" + dir + "/out\""),
      "modality" -> "\"video\"",
      "min_shared_frames" -> "2",
      "signature_store" -> ("\"" + dir + "/store\"")))
    val stats = MediaCurationJob.run(spark, cfg).get
    assert(stats == MediaCurationJob.Stats(5, 4, 3, 2))
    assert(spark.read.parquet(s"$dir/out/media")
      .select($"media_id").as[Long].collect().toSet == Set(1L, 4L))
  }
}
