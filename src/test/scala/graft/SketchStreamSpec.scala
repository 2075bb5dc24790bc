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
}
