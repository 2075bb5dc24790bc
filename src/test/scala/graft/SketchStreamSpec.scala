package graft

import graft.operators.{Bloom, Cardinality, CountMin}
import graft.streaming.SketchStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sketch maintenance == the batch sketch of the union: folding
  * micro-batch sketches into the store by the merge laws must land on the
  * exact registers/words the batch operator computes over everything the
  * stream ever saw. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("HLL store after N micro-batches == batch registers of the union") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val store = java.nio.file.Files.createTempDirectory("hll-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hll-ckpt").toString
    val q = SketchStream.runHll(input.toDF().toDF("src", "v"),
      Seq("src"), "v", store, p = 8, checkpoint = ckpt)
    val all = (0 until 3000).map(i => (s"s${i % 2}", s"val$i"))
    try {
      all.grouped(1000).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val expected = Cardinality.hllRegisters(
        all.toDF("src", "v"), Seq("src"), col("v"), p = 8)
      .as[(String, Int, Int)].collect().toSet
    val got = spark.read.parquet(store)
      .as[(String, Int, Int)].collect().toSet
    assert(got === expected)
  }

  test("Bloom store after N micro-batches == batch words of the union") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val store = java.nio.file.Files.createTempDirectory("bloom-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bloom-ckpt").toString
    val q = SketchStream.runBloom(input.toDF().toDF("src", "v"),
      Seq("src"), "v", store, bitsLog2 = 16, k = 3, checkpoint = ckpt)
    val all = (0 until 2000).map(i => (s"s${i % 2}", s"item$i"))
    try {
      all.grouped(700).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val expected = Bloom.build(all.toDF("src", "v"), Seq("src"), col("v"))
      .as[(String, Int, Long)].collect().toSet
    val got = spark.read.parquet(store)
      .as[(String, Int, Long)].collect().toSet
    assert(got === expected)
  }

  test("CMS store after N micro-batches == batch sketch of the union") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val store = java.nio.file.Files.createTempDirectory("cms-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cms-ckpt").toString
    val q = SketchStream.runCms(input.toDF().toDF("src", "v"),
      Seq("src"), "v", store, wLog2 = 12, d = 3, checkpoint = ckpt)
    val all = (0 until 3000).map(i => (s"s${i % 2}", s"tok${i % 400}"))
    try {
      all.grouped(1000).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val expected = CountMin.build(all.toDF("src", "v"), Seq("src"), col("v"),
        wLog2 = 12, d = 3)
      .as[(String, Int, Int, Long)].collect().toSet
    val got = SketchStream.currentCms(spark, store).get
      .as[(String, Int, Int, Long)].collect().toSet
    assert(got === expected)
  }

  test("CMS fold: replaying the same batch id is a no-op (versioned merge)") {
    val store = java.nio.file.Files.createTempDirectory("cms-replay").toString
    val b0 = (0 until 500).map(i => ("s0", s"a${i % 50}")).toDF("src", "v")
    val b1 = (0 until 300).map(i => ("s0", s"b${i % 30}")).toDF("src", "v")
    SketchStream.foldCmsBatch(b0, 0L, Seq("src"), "v", store, 12, 3, 2)
    SketchStream.foldCmsBatch(b1, 1L, Seq("src"), "v", store, 12, 3, 2)
    val once = SketchStream.currentCms(spark, store).get
      .as[(String, Int, Int, Long)].collect().toSet
    // at-least-once delivery: batch 1 arrives again after a restart — the
    // fold must re-merge against v=0, not double-count into v=1
    SketchStream.foldCmsBatch(b1, 1L, Seq("src"), "v", store, 12, 3, 2)
    val twice = SketchStream.currentCms(spark, store).get
      .as[(String, Int, Int, Long)].collect().toSet
    assert(twice === once)
    val expected = CountMin.build(b0.unionByName(b1), Seq("src"), col("v"),
        wLog2 = 12, d = 3)
      .as[(String, Int, Int, Long)].collect().toSet
    assert(twice === expected)
  }

  test("report store after N folds == batch data card of the union; replay no-op") {
    import graft.streaming.ReportStream
    import graft.operators.{Cardinality, Reports}
    val store = java.nio.file.Files.createTempDirectory("report").toString
    def doc(id: Long, words: Int, lang: String, src: String) =
      (id, (0 until words).map(i => s"w${(id + i) % 97}").mkString(" "),
        lang, src)
    val b0 = (0L until 40L).map(i => doc(i, 30, "en", s"s${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
    val b1 = (100L until 130L).map(i => doc(i, 25, "zh", s"s${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
    def fold(b: org.apache.spark.sql.DataFrame, id: Long) =
      ReportStream.foldReportBatch(b, id, "text", "source",
        "lang", store, p = 8, keepVersions = 2, entropyFloorE6 = 2000000L)
    fold(b0, 0L); fold(b1, 1L)
    val got = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // every additive column equals the batch report over the union; the
    // vocabulary column equals the HLL estimate over the union's registers
    val union = b0.unionByName(b1)
    val exact = Reports.corpusReport(union, "text", "source", "lang")
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val estVocab = Cardinality.hllEstimate(
        Cardinality.hllRegisters(union.select($"source",
          explode(graft.functions.TextFns.words($"text")).as("t")),
          Seq("source"), col("t"), p = 8), Seq("source"))
      .as[(String, Long)].collect().toMap
    assert(got.map(_._1) === exact.map(_._1))
    got.zip(exact).foreach { case (g, e) =>
      assert((g._2, g._3, g._5, g._6, g._7, g._8) ===
        (e._2, e._3, e._5, e._6, e._7, e._8), s"source ${g._1}")
      assert(g._4 === estVocab(g._1), s"vocab estimate ${g._1}")
    }
    // at-least-once replay of batch 1: snapshot unchanged
    fold(b1, 1L)
    val twice = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(twice === got)
  }

  test("ReportStream.run end to end: live query, snapshot == batch card") {
    import graft.streaming.ReportStream
    import graft.operators.Reports
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String)]
    val store = java.nio.file.Files.createTempDirectory("report-live").toString
    val ckpt = java.nio.file.Files.createTempDirectory("report-ckpt").toString
    val all = (0L until 60L).map(i =>
      (i, (0 until 20).map(j => s"w${(i + j) % 53}").mkString(" "),
        if (i % 3 == 0) "en" else "zh", s"s${i % 2}"))
    val q = ReportStream.run(
      input.toDF().toDF("doc_id", "text", "lang", "source"),
      "text", "source", "lang", store, ckpt)
    try {
      all.grouped(20).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val exact = Reports.corpusReport(
        all.toDF("doc_id", "text", "lang", "source"), "text", "source", "lang")
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // additive columns equal the batch card; vocab is the HLL estimate
    assert(got.map(r => (r._1, r._2, r._3, r._5, r._6, r._7, r._8)) ===
      exact.map(r => (r._1, r._2, r._3, r._5, r._6, r._7, r._8)))
    assert(got.forall(_._4 > 0L))
  }

  test("report store: top_tokens rides the CMS + candidate-pool fold — on a " +
    "skewed vocabulary the stream column equals the batch-exact card's") {
    import graft.streaming.ReportStream
    import graft.operators.Reports
    val store = java.nio.file.Files.createTempDirectory("report-top").toString
    // Zipf-ish head: 'alpha' dominates every doc, then 'beta', 'gamma' — the
    // head tokens are prominent in EVERY batch, so the bounded candidate
    // pool provably contains them and (with a 4096-bucket CMS over a ~60
    // token vocabulary) the estimates are the exact counts
    def doc(id: Long, src: String) =
      (id, ("alpha " * 6 + "beta " * 4 + "gamma " * 2 +
        s"tail${id % 13} tail${id % 7}").trim, "en", src)
    val b0 = (0L until 30L).map(i => doc(i, s"s${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
    val b1 = (100L until 140L).map(i => doc(i, s"s${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
    def fold(b: org.apache.spark.sql.DataFrame, id: Long) =
      ReportStream.foldReportBatch(b, id, "text", "source", "lang", store,
        p = 8, keepVersions = 2, entropyFloorE6 = 2000000L)
    fold(b0, 0L); fold(b1, 1L)
    val got = ReportStream.currentReport(spark, store, "source").get
      .select($"source", $"top_tokens").as[(String, String)]
      .collect().toMap
    val want = Reports.corpusReportFull(b0.unionByName(b1),
        "text", "source", "lang")
      .select($"source", $"top_tokens").as[(String, String)]
      .collect().toMap
    assert(got === want)
    assert(got.values.forall(_.startsWith("alpha:")), got)
    // replay keeps it stable
    fold(b1, 1L)
    val twice = ReportStream.currentReport(spark, store, "source").get
      .select($"source", $"top_tokens").as[(String, String)]
      .collect().toMap
    assert(twice === got)
  }

  // ---------- failure injection: the versioned-fold store contracts ----------

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("report store: a version dir without _SUCCESS is invisible to readers " +
    "AND to the next fold's predecessor lookup") {
    import graft.streaming.ReportStream
    val store = java.nio.file.Files.createTempDirectory("report-crash").toString
    val b0 = Seq((1L, "alpha beta gamma", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    ReportStream.foldReportBatch(b0, 0L, "text", "source", "lang", store,
      p = 8, keepVersions = 2, entropyFloorE6 = 2000000L)
    val before = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // plant a crashed write: a newer version dir with plausible data files
    // but no version-level completeness marker
    val fs = fsOf(store)
    val crashed = s"$store/v=7"
    b0.write.parquet(s"$crashed/carrier") // parquet's own _SUCCESS is INSIDE
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$crashed/_SUCCESS")))
    // reader still serves v=0
    val after = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(after === before, "reader must skip the _SUCCESS-less version")
    // the next fold (batch 9) must merge v=0, not the crashed v=7: its
    // result equals the clean two-batch fold
    val b9 = Seq((2L, "delta epsilon", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    ReportStream.foldReportBatch(b9, 9L, "text", "source", "lang", store,
      p = 8, keepVersions = 2, entropyFloorE6 = 2000000L)
    val gotUnion = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val clean = java.nio.file.Files.createTempDirectory("report-clean").toString
    ReportStream.foldReportBatch(b0, 0L, "text", "source", "lang", clean,
      p = 8, keepVersions = 2, entropyFloorE6 = 2000000L)
    ReportStream.foldReportBatch(b9, 9L, "text", "source", "lang", clean,
      p = 8, keepVersions = 2, entropyFloorE6 = 2000000L)
    val want = ReportStream.currentReport(spark, clean, "source").get.drop("top_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(gotUnion === want, "fold must have merged the complete v=0")
  }

  test("report store: replay after a crash MID-REWRITE converges (marker " +
    "comes down before data, partial version self-heals)") {
    import graft.streaming.ReportStream
    val store = java.nio.file.Files.createTempDirectory("report-replay").toString
    val b0 = Seq((1L, "one two three", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val b1 = Seq((2L, "four five", "zh", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    def fold(b: org.apache.spark.sql.DataFrame, id: Long) =
      ReportStream.foldReportBatch(b, id, "text", "source", "lang", store,
        p = 8, keepVersions = 2, entropyFloorE6 = 2000000L)
    fold(b0, 0L); fold(b1, 1L)
    val healthy = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // crash mid-replay of batch 1: the fold's first step (marker down)
    // happened, then the carrier rewrite died halfway
    val fs = fsOf(store)
    fs.delete(new org.apache.hadoop.fs.Path(s"$store/v=1/_SUCCESS"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$store/v=1/carrier"), true)
    // the store still SERVES (v=0), and replaying batch 1 restores v=1
    assert(ReportStream.currentReport(spark, store, "source").nonEmpty)
    fold(b1, 1L)
    val healed = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(healed === healthy)
  }

  test("report store: keepVersions pruning keeps replay alive across many " +
    "batches; keepVersions < 2 is refused") {
    import graft.streaming.ReportStream
    val store = java.nio.file.Files.createTempDirectory("report-prune").toString
    def doc(id: Long) = (id, s"tok${id % 7} tok${id % 5}", "en", "s0")
    def fold(ids: Range, bid: Long) =
      ReportStream.foldReportBatch(
        ids.map(i => doc(i.toLong)).toDF("doc_id", "text", "lang", "source"),
        bid, "text", "source", "lang", store,
        p = 8, keepVersions = 2, entropyFloorE6 = 2000000L)
    fold(0 until 5, 0L); fold(5 until 9, 1L)
    fold(9 until 12, 2L); fold(12 until 20, 3L)
    val fs = fsOf(store)
    val vs = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).filter(_.startsWith("v=")).sorted.toSeq
    assert(vs === Seq("v=2", "v=3"), s"pruned store: $vs")
    // replay of the newest batch: its predecessor (v=2) survived pruning
    val before = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    fold(12 until 20, 3L)
    val after = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(after === before)
    // a keepVersions that would prune the predecessor is refused loudly
    val err = intercept[IllegalArgumentException] {
      SketchStream.foldCmsBatch(
        Seq(("s0", "x")).toDF("src", "v"), 0L, Seq("src"), "v",
        java.nio.file.Files.createTempDirectory("cms-bad").toString,
        12, 3, keepVersions = 1)
    }
    assert(err.getMessage.contains("keepVersions"))
  }

  test("report store: HLL precision rides the store (p.meta) — render uses " +
    "the folded p, and a different-p fold refuses to merge") {
    import graft.streaming.ReportStream
    import graft.operators.Cardinality
    val store = java.nio.file.Files.createTempDirectory("report-p").toString
    val docs = (0L until 50L).map(i =>
        (i, (0 until 12).map(j => s"w${(i * 31 + j) % 211}").mkString(" "),
          "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    ReportStream.foldReportBatch(docs, 0L, "text", "source", "lang", store,
      p = 12, keepVersions = 2, entropyFloorE6 = 2000000L)
    // currentReport takes NO p — it must read p=12 from the sidecar; the
    // p=12 estimate differs from the p=8 one on this vocabulary, so an
    // assumed-p render would show here
    val got = ReportStream.currentReport(spark, store, "source").get.drop("top_tokens")
      .select($"n_distinct_tokens").as[Long].head()
    val regs12 = Cardinality.hllRegisters(
      docs.select($"source",
        explode(graft.functions.TextFns.words($"text")).as("t")),
      Seq("source"), col("t"), p = 12)
    val want12 = Cardinality.hllEstimate(regs12, Seq("source"), p = 12)
      .select($"estimate").as[Long].head()
    // the test only discriminates if the old assumed-p=8 render would differ
    val want8 = Cardinality.hllEstimate(
        Cardinality.hllRegisters(docs.select($"source",
          explode(graft.functions.TextFns.words($"text")).as("t")),
          Seq("source"), col("t"), p = 8), Seq("source"), p = 8)
      .select($"estimate").as[Long].head()
    assert(want8 !== want12, "vocabulary must separate the two precisions")
    assert(got === want12, "render must estimate at the stored p")
    // merging at a different p would max-merge incompatible register frames
    val err = intercept[IllegalArgumentException] {
      ReportStream.foldReportBatch(docs, 1L, "text", "source", "lang", store,
        p = 8, keepVersions = 2, entropyFloorE6 = 2000000L)
    }
    assert(err.getMessage.contains("cannot merge"))
  }
}
