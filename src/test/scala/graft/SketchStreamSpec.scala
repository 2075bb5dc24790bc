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
    val got = ReportStream.currentReport(spark, store, "source").get
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
    val twice = ReportStream.currentReport(spark, store, "source").get
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
    val got = ReportStream.currentReport(spark, store, "source").get
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
}
