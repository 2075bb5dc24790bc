package graft

import graft.operators.{MkvCodec, Mp4Codec, Multimodal, SyntheticMedia}

/** The compressed-container walk (q156's machinery): the REAL ISO BMFF box
  * walk and EBML element walk must invert the closed-form builders exactly,
  * survive adversarial/truncated input without throwing, and handle the
  * spec corners the synthetic lake doesn't emit (largesize boxes,
  * unknown-size EBML elements). */
class ContainerCensusSpec extends SparkSpec {
  import spark.implicits._

  test("mp4 walk inverts the builder: both mvhd versions, all codecs") {
    for (d <- 0L until 40L by 2) {
      val info = Mp4Codec.probe(SyntheticMedia.mp4(d))
        .getOrElse(fail(s"unparseable mp4 d=$d"))
      assert(info.brand == "isom")
      assert(info.durationMs == SyntheticMedia.containerDurMs(d), s"d=$d")
      val v = info.tracks.find(_.handler == "vide").get
      val a = info.tracks.find(_.handler == "soun").get
      assert(v.codec ==
        Seq("avc1", "hev1", "vp09", "av01")(((d / 2) % 4).toInt))
      assert(v.width == SyntheticMedia.containerW(d) &&
        v.height == SyntheticMedia.containerH(d))
      assert(a.codec == "mp4a" &&
        a.channels == SyntheticMedia.containerChans(d) &&
        a.sampleRate == SyntheticMedia.containerRate(d))
      assert(info.payloadBytes == SyntheticMedia.mp4(d).length.toLong)
    }
  }

  test("mkv walk inverts the builder: doctype, float duration, track tree") {
    for (d <- 1L until 41L by 2) {
      val info = MkvCodec.probe(SyntheticMedia.mkv(d))
        .getOrElse(fail(s"unparseable mkv d=$d"))
      assert(info.docType == (if (d % 3 == 0) "webm" else "matroska"))
      assert(info.durationMs == SyntheticMedia.containerDurMs(d), s"d=$d")
      val v = info.tracks.find(_.trackType == 1).get
      val a = info.tracks.find(_.trackType == 2).get
      assert(v.codecId == Seq("V_MPEG4/ISO/AVC", "V_MPEGH/ISO/HEVC",
        "V_VP9", "V_AV1")(((d / 2) % 4).toInt))
      assert(v.width == SyntheticMedia.containerW(d) &&
        v.height == SyntheticMedia.containerH(d))
      assert(a.codecId ==
        Seq("A_AAC", "A_OPUS")(((d / 2) % 2).toInt) &&
        a.channels == SyntheticMedia.containerChans(d) &&
        a.sampleRate == SyntheticMedia.containerRate(d))
    }
  }

  test("mp4 walk: largesize (size==1 + 64-bit) and size==0 (to-end) boxes") {
    val base = SyntheticMedia.mp4(2L)
    // re-wrap the trailing mdat as a largesize box
    def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    // find mdat offset: walk top-level sizes
    var o = 0
    while (new String(base, o + 4, 4, "ISO-8859-1") != "mdat")
      o += u32(base, o).toInt
    val mdatSize = u32(base, o).toInt
    val mdatPayload = base.slice(o + 8, o + mdatSize)
    val pre = base.slice(0, o)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val large = pre ++ be32(1L) ++ "mdat".getBytes("ISO-8859-1") ++
      be32(0L) ++ be32(mdatPayload.length + 16L) ++ mdatPayload
    assert(Mp4Codec.probe(large).get.durationMs ==
      SyntheticMedia.containerDurMs(2L))
    val toEnd = pre ++ be32(0L) ++ "mdat".getBytes("ISO-8859-1") ++
      mdatPayload
    assert(Mp4Codec.probe(toEnd).get.durationMs ==
      SyntheticMedia.containerDurMs(2L))
  }

  test("mkv walk: unknown-size segment clamps to the payload end") {
    val base = SyntheticMedia.mkv(1L)
    // the segment element starts right after the EBML header; rewrite its
    // size varint to the 1-byte unknown marker 0xFF (header layout:
    // 4-byte id + 1-byte size + payload)
    val hdrLen = 4 + 1 + (base(4) & 0x7f)
    val segIdEnd = hdrLen + 4
    val szLen = {
      var m = 0x80; var n = 1
      while ((base(segIdEnd) & m) == 0) { m >>= 1; n += 1 }
      n
    }
    val mut = base.slice(0, segIdEnd) ++ Array(0xff.toByte) ++
      base.slice(segIdEnd + szLen, base.length)
    val info = MkvCodec.probe(mut).getOrElse(fail("unknown-size unparsed"))
    assert(info.durationMs == SyntheticMedia.containerDurMs(1L))
    assert(info.tracks.size == 2)
  }

  test("garbage, truncation, null: no throw, clean None") {
    assert(Mp4Codec.probe(null).isEmpty && MkvCodec.probe(null).isEmpty)
    assert(Mp4Codec.probe(Array[Byte](1, 2, 3)).isEmpty)
    assert(MkvCodec.probe(Array[Byte](1, 2, 3)).isEmpty)
    assert(Mp4Codec.probe(SyntheticMedia.wav(5L)).isEmpty)
    assert(MkvCodec.probe(SyntheticMedia.mp4(2L)).isEmpty)
    assert(Mp4Codec.probe(SyntheticMedia.mkv(1L)).isEmpty)
    val mp4 = SyntheticMedia.mp4(6L)
    val mkv = SyntheticMedia.mkv(7L)
    for (cut <- Seq(5, 9, 17, 40, 100)) {
      Mp4Codec.probe(mp4.slice(0, cut)) // must not throw
      MkvCodec.probe(mkv.slice(0, cut))
      Mp4Codec.probe(mp4.map(b => (b ^ 0x5a).toByte))
      MkvCodec.probe(mkv.map(b => (b ^ 0x5a).toByte))
    }
  }

  test("census quota: one deterministic sampleToBudget over the census table") {
    // the governance loop the census exists for: per-(container, codec)
    // byte budgets select a stable survivor set — reproducible under any
    // partitioning, and incremental lake growth never evicts an earlier
    // survivor (sampleToBudget's hash-walk contract)
    val docs = spark.range(0, 40).toDF("doc_id")
    val census = Multimodal.containerCensus(
        SyntheticMedia.containerFrame(docs, "doc_id"))
      .localCheckpoint(true)
    val budget = 2000L
    val kept = graft.operators.DataMix.sampleToBudget(
        census, Seq("container", "video_codec"), budget, "media_id",
        $"payload_bytes")
      .select($"container", $"video_codec", $"media_id", $"payload_bytes")
      .collect()
    assert(kept.nonEmpty && kept.length < 40)
    // every (container, codec) group's surviving bytes respect the budget
    kept.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (g, rows) =>
        assert(rows.map(_.getLong(3)).sum <= budget, s"group $g over budget")
    }
    // monotonic determinism: lake growth can only DEMOTE late-hash rows,
    // never promote new ones — the full walk's survivors among the first
    // half's ids are a subset of what the half-lake walk kept
    val keptIds = kept.map(_.getLong(2)).toSet
    val half = graft.operators.DataMix.sampleToBudget(
        census.filter($"media_id" < 20), Seq("container", "video_codec"),
        budget, "media_id", $"payload_bytes")
      .select($"media_id").as[Long].collect().toSet
    assert(keptIds.filter(_ < 20L).subsetOf(half),
      s"growth promoted a row: full=${keptIds.filter(_ < 20L)} half=$half")
    graft.operators.Dedup.release(census)
  }

  test("containerCensus operator: mixed lake, one governance row per payload") {
    val docs = spark.range(0, 12).toDF("doc_id")
    val lake = SyntheticMedia.containerFrame(docs, "doc_id")
      // plant one unparseable payload: it must DROP, not fail the job
      .union(Seq((99L, "video", Array[Byte](1, 2, 3, 4)))
        .toDF("media_id", "kind", "payload"))
    val out = Multimodal.containerCensus(lake)
      .orderBy($"media_id")
      .collect()
    assert(out.length == 12)
    assert(out.map(_.getString(1)).toSeq ==
      (0 until 12).map(d => if (d % 2 == 0) "mp4" else "mkv"))
    val r5 = out(5) // doc 5: mkv, 5 % 3 != 0 -> matroska, (5/2) % 4 = 2 -> VP9
    assert(r5.getString(2) == "matroska" &&
      r5.getLong(3) == SyntheticMedia.containerDurMs(5L) &&
      r5.getString(4) == "V_VP9" &&
      r5.getLong(10) == SyntheticMedia.mkv(5L).length.toLong)
    val r3 = out(3) // doc 3: 3 % 3 == 0 -> webm
    assert(r3.getString(2) == "webm")
  }
}
