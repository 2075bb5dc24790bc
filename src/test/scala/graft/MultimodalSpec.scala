package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", Array.fill[Byte](100)(7),
        Row(10, 10, null, null)),
      Row(2L, "audio", Array.fill[Byte](250)(3),
        Row(null, null, 16000, 4000L)),
      Row(3L, "image", null, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("decodeStub: deterministic fixed-length features; null payload -> null-safe") {
    val out = Multimodal.decodeStub(mediaDf)
    val feats = out.filter($"media_id" === 1L)
      .select($"features").as[Seq[Double]].head()
    assert(feats.length == 16)
    assert(feats.forall(f => f >= 0.0 && f < 1.0))
    // deterministic: same payload -> same features on re-evaluation
    val again = Multimodal.decodeStub(mediaDf)
      .filter($"media_id" === 1L).select($"features").as[Seq[Double]].head()
    assert(feats == again)
  }

  test("repartitionBySize packs by total payload bytes") {
    val out = Multimodal.repartitionBySize(mediaDf, targetBytes = 120)
    // 100 + 250 + 0 bytes => ceil(350/120) = 3 partitions
    assert(out.rdd.getNumPartitions == 3)
    assert(out.count() == 3)
  }

  test("sampleFrames: deterministic chunking keeps every Nth frame with lineage") {
    val frames = Multimodal.sampleFrames(mediaDf.filter($"media_id" === 2L),
      frameBytes = 50, everyNth = 2)
    val idx = frames.orderBy($"frame_idx").select($"frame_idx").as[Int].collect()
    assert(idx.toSeq == Seq(0, 2, 4)) // 250 bytes -> 5 frames -> keep 0,2,4
    val f0len = frames.filter($"frame_idx" === 0)
      .select(length($"frame")).as[Int].head()
    assert(f0len == 50)
    // payload stays in-row: no join (= no shuffle of the binary column) in the plan
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in plan:\n$plan")
  }

  test("decodePartitions: per-partition batch decode, deterministic, null-safe") {
    val out = Multimodal.decodePartitions(mediaDf, Multimodal.stubBatchDecoder())
    assert(out.count() == 3)
    val feats = out.filter($"media_id" === 1L)
      .select($"features").as[Seq[Double]].head()
    assert(feats.length == 16 && feats.forall(f => f >= 0.0 && f < 1.0))
    // partition-count independent: same rows regardless of how batches split
    val one = Multimodal.decodePartitions(mediaDf.repartition(1),
      Multimodal.stubBatchDecoder())
      .as[(Long, Seq[Double])].collect().toSet
    val many = Multimodal.decodePartitions(mediaDf.repartition(3),
      Multimodal.stubBatchDecoder())
      .as[(Long, Seq[Double])].collect().toSet
    assert(one == many)
    // null payload (media 3) decodes to the zero vector, not a crash
    assert(out.filter($"media_id" === 3L)
      .select($"features").as[Seq[Double]].head().forall(_ == 0.0))
  }

  test("sampleFrames: empty payload yields zero frames") {
    val empty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, "video", Array.empty[Byte], null))),
      Multimodal.mediaSchema)
    assert(Multimodal.sampleFrames(empty, frameBytes = 50, everyNth = 1).count() == 0)
  }
}
