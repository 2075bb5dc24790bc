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

  test("container_census_path: governance census publishes beside the tick") {
    val dir = Files.createTempDirectory("mediacensus").toString
    // mixed lake: two real containers + one PNM image (census drops it —
    // censusable means MP4/Matroska; the image still dedups below)
    lake(Seq(
      Row(2L, "video", graft.operators.SyntheticMedia.mp4(2L)),
      Row(5L, "video", graft.operators.SyntheticMedia.mkv(5L)),
      Row(7L, "image", ppm(ramp((x, _) => x * 5)))))
      .write.parquet(s"$dir/tick")
    val cfg = writeCfg(Map(
      "media_path" -> ("\"" + dir + "/tick\""),
      "output_path" -> ("\"" + dir + "/out\""),
      "modality" -> "\"image\"",
      "container_census_path" -> ("\"" + dir + "/census\"")))
    MediaCurationJob.run(spark, cfg)
    val census = spark.read.parquet(s"$dir/census")
      .orderBy($"media_id").collect()
    assert(census.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "mp4"), (5L, "mkv")))
    assert(census.forall(r =>
      r.getLong(3) == graft.operators.SyntheticMedia.containerDurMs(
        r.getLong(0))))
  }

  test("maintained store: multi-tick fold, crash-heal replay, compaction") {
    val a = ramp((x, _) => x * 7)
    val aEdit = a.clone()
    for (y <- 0 until 4; x <- 0 until 8; c <- 0 until 3)
      aEdit((y * w + x) * 3 + c) = 250.toByte
    val checker = ramp((x, _) => if ((x / 4) % 2 == 0) 200 else 50)
    val diag = ramp((x, y) => if (((x + y) / 6) % 2 == 0) 230 else 20)

    val dir = Files.createTempDirectory("mediastore").toString
    val store = s"$dir/store"
    def cfgFor(tick: Int): String = writeCfg(Map(
      "media_path" -> ("\"" + dir + s"/tick$tick\""),
      "output_path" -> ("\"" + dir + s"/out$tick\""),
      "modality" -> "\"image\"",
      "max_hamming" -> "6",
      "store_path" -> ("\"" + store + "\""),
      "tick_id" -> ("\"t" + tick + "\"")))

    // tick 1 against the FRESH store: everything admitted, cluster {1,2}
    lake(Seq(Row(1L, "image", ppm(a)), Row(2L, "image", ppm(aEdit)),
      Row(3L, "image", ppm(checker)))).write.parquet(s"$dir/tick1")
    assert(MediaCurationJob.run(spark, cfgFor(1)).contains(
      MediaCurationJob.Stats(3, 3, 3, 2)))
    def storeIds: Set[Long] = graft.io.SignatureStore.read(spark, store)
      .select($"media_id").as[Long].collect().toSet
    assert(storeIds == Set(1L, 3L))

    // tick 2: a re-upload of survivor 1's image (rejected by the store) and
    // a genuinely novel pattern
    lake(Seq(Row(11L, "image", ppm(a)), Row(12L, "image", ppm(diag))))
      .write.parquet(s"$dir/tick2")
    assert(MediaCurationJob.run(spark, cfgFor(2)).contains(
      MediaCurationJob.Stats(2, 2, 1, 1)))
    assert(storeIds == Set(1L, 3L, 12L)) // union of tick survivors

    // marker present: replaying tick 2 is a no-op, store untouched
    assert(MediaCurationJob.run(spark, cfgFor(2)).isEmpty)
    assert(storeIds == Set(1L, 3L, 12L))

    // crash-heal replay: store already appended, marker missing — the rerun
    // must NOT reject its own rows against its own tick partition, and the
    // idempotent dynamic overwrite leaves the store identical
    Files.delete(java.nio.file.Paths.get(s"$dir/out2", "_DONE"))
    assert(MediaCurationJob.run(spark, cfgFor(2)).contains(
      MediaCurationJob.Stats(2, 2, 1, 1)))
    assert(storeIds == Set(1L, 3L, 12L))
    assert(spark.read.parquet(s"$dir/out2/media")
      .select($"media_id").as[Long].collect().toSet == Set(12L))

    // third tick, then compaction folds t1/t2 into the reserved
    // `tick=__folded__` base with the store's rows bit-identical before and
    // after (t3 is the one real tick kept)
    val cross = ramp((x, y) =>
      if (x / 6 == y / 6 || x / 6 == 5 - y / 6) 240 else 15)
    lake(Seq(Row(21L, "image", ppm(cross)))).write.parquet(s"$dir/tick3")
    assert(MediaCurationJob.run(spark, cfgFor(3)).contains(
      MediaCurationJob.Stats(1, 1, 1, 1)))
    val beforeCompact = graft.io.SignatureStore.read(spark, store)
      .as[(Long, Long)].collect().toSet
    val rep = graft.io.SignatureStore.compact(spark, store, keepTicks = 1)
    assert(rep.ticksBefore == 3 && rep.ticksAfter == 1)
    assert(graft.io.SignatureStore.read(spark, store)
      .as[(Long, Long)].collect().toSet == beforeCompact)
    // a compacted store still admits correctly: replaying tick 3's content
    // as a NEW tick gets rejected
    lake(Seq(Row(31L, "image", ppm(cross)))).write.parquet(s"$dir/tick4")
    assert(MediaCurationJob.run(spark, cfgFor(4)).contains(
      MediaCurationJob.Stats(1, 1, 0, 0)))

    // crash-heal replay of an ALREADY-FOLDED tick (the compaction<->replay
    // interaction): tick 2's rows now live under tick=__folded__, not its
    // own partition. The replay must (a) still exclude its OWN signatures
    // (src_tick identity — a partition filter would find them in the fold
    // and self-reject every row, publishing empty outputs), (b) still SEE
    // every other folded tick's rows (a fold-target-partition design hid
    // them), and (c) leave the store set-identical (its re-landed partition
    // duplicates its folded copies — harmless, absorbed by the next
    // compaction's distinct, and no other tick's rows are overwritten).
    Files.delete(java.nio.file.Paths.get(s"$dir/out2", "_DONE"))
    new java.io.File(s"$dir/out2/media").listFiles().foreach(_.delete())
    assert(MediaCurationJob.run(spark, cfgFor(2)).contains(
      MediaCurationJob.Stats(2, 2, 1, 1)))
    assert(spark.read.parquet(s"$dir/out2/media")
      .select($"media_id").as[Long].collect().toSet == Set(12L))
    assert(storeIds == Set(1L, 3L, 12L, 21L))
    // the replay's duplicate rows absorb physically once its re-landed
    // partition itself folds (same src_tick -> one row under distinct):
    // land a newer tick, then compact everything older into the base
    graft.io.SignatureStore.appendTick(
      Seq((99L, 424242L)).toDF("media_id", "phash"), store, "t9")
    graft.io.SignatureStore.compact(spark, store, keepTicks = 1)
    val rows = graft.io.SignatureStore.read(spark, store)
      .as[(Long, Long)].collect()
    assert(rows.length == 5 && // {1,3,12,21} once each + t9's row
      rows.map(_._1).toSet == Set(1L, 3L, 12L, 21L, 99L))
  }

  test("maintained store: in-job compaction (store_keep_ticks) folds, stays admission-correct") {
    val a = ramp((x, _) => x * 7)
    val checker = ramp((x, _) => if ((x / 4) % 2 == 0) 200 else 50)
    val dir = Files.createTempDirectory("mediacompact").toString
    val store = s"$dir/store"
    def cfgFor(tick: Int): String = writeCfg(Map(
      "media_path" -> ("\"" + dir + s"/tick$tick\""),
      "output_path" -> ("\"" + dir + s"/out$tick\""),
      "modality" -> "\"image\"", "max_hamming" -> "6",
      "store_path" -> ("\"" + store + "\""),
      "tick_id" -> ("\"t" + tick + "\""),
      "store_keep_ticks" -> "1"))
    lake(Seq(Row(1L, "image", ppm(a)))).write.parquet(s"$dir/tick1")
    assert(MediaCurationJob.run(spark, cfgFor(1)).contains(
      MediaCurationJob.Stats(1, 1, 1, 1)))
    lake(Seq(Row(11L, "image", ppm(checker)))).write.parquet(s"$dir/tick2")
    assert(MediaCurationJob.run(spark, cfgFor(2)).contains(
      MediaCurationJob.Stats(1, 1, 1, 1)))
    // tick2's run compacted: t1 folded into the reserved base, t2 kept
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).filter(_.startsWith("tick=")).toSet
    assert(parts ==
      Set("tick=t2", s"tick=${graft.io.SignatureStore.FoldedTick}"))
    // the folded signature still rejects a re-upload of tick 1's content
    lake(Seq(Row(21L, "image", ppm(a)))).write.parquet(s"$dir/tick3")
    assert(MediaCurationJob.run(spark, cfgFor(3)).contains(
      MediaCurationJob.Stats(1, 1, 0, 0)))
  }

  test("signature store: mtime tick ordering, reserved fold id refused") {
    import graft.io.SignatureStore
    val dir = Files.createTempDirectory("sigstore").toString
    val store = s"$dir/store"
    // daily tick ids sort WRONG lexicographically: out10 < out2 as strings,
    // but out10 is the newer tick — compaction must keep by mtime, else the
    // newest (still heal-eligible) tick folds away while stale out2 stays
    SignatureStore.appendTick(
      Seq((1L, 100L)).toDF("media_id", "phash"), store, "out2")
    SignatureStore.appendTick(
      Seq((2L, 200L)).toDF("media_id", "phash"), store, "out10")
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // force unambiguous mtimes (same-ms writes would fall back to the
    // lexicographic tie-break and invert the scenario under test)
    fs.setTimes(new org.apache.hadoop.fs.Path(store, "tick=out2"), 1000L, -1)
    fs.setTimes(new org.apache.hadoop.fs.Path(store, "tick=out10"), 2000L, -1)
    val rep = SignatureStore.compact(spark, store, keepTicks = 1)
    assert(rep.ticksBefore == 2 && rep.ticksAfter == 1)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).filter(_.startsWith("tick=")).toSet
    assert(parts == Set("tick=out10", s"tick=${SignatureStore.FoldedTick}"))
    assert(SignatureStore.read(spark, store)
      .as[(Long, Long)].collect().toSet == Set((1L, 100L), (2L, 200L)))
    // provenance survives the fold: out2's row is still excludable
    assert(SignatureStore.readExcluding(spark, store, "out2")
      .as[(Long, Long)].collect().toSet == Set((2L, 200L)))
    // no tick may claim the reserved fold partition
    intercept[IllegalArgumentException] {
      SignatureStore.appendTick(
        Seq((3L, 300L)).toDF("media_id", "phash"), store,
        SignatureStore.FoldedTick)
    }
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
