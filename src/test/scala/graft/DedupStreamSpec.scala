package graft

import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup admission control: stream-static LSH band join + watermarked
  * exact dedup, agreeing with the batch operators on the same data. */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static band join flags docs near-duplicating the corpus") {
    val base = "the quick brown fox jumps over the lazy dog while rain falls " +
      "softly on the quiet grey roofs of the old river town tonight"
    val corpus = Seq(
      (100L, base),
      (101L, "completely different content about databases and query engines"))
      .toDF("doc_id", "text")
    val index = DedupStream.corpusBandIndex(corpus, "doc_id", "text")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val flags = DedupStream.nearDupFlags(
      input.toDF().toDF("doc_id", "text"), index, "doc_id", "text")
    val q = flags.writeStream.outputMode("complete")
      .format("memory").queryName("flags").start()
    try {
      input.addData(
        (1L, base),                          // exact dup of 100
        (2L, base.replace("dog", "cat")),    // near-dup: J ~ 0.88
        (3L, "entirely novel text with no counterpart in the corpus at all"))
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, matched_corpus_id FROM flags")
        .as[(Long, Long)].collect().toMap
      assert(out.get(1L).contains(100L)) // exact copy always shares all bands
      assert(!out.contains(3L))          // novel doc unflagged
      // near-dup at J~0.88: per-band hit 0.77, miss-all-16 odds ~1e-10
      assert(out.get(2L).contains(100L))
    } finally q.stop()
  }

  test("stream-static embedding admission verifies exact cosine in-flight") {
    val corpus = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f, 1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f, 0.0f, 0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val index = DedupStream.corpusBucketIndex(corpus, "vec_id", "embedding",
      lshPlanes = 8, lshBands = 8)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val flags = DedupStream.nearDupEmbeddingFlags(
      input.toDF().toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      index, "vec_id", "embedding", threshold = 0.98,
      lshPlanes = 8, lshBands = 8)
    val q = flags.writeStream.outputMode("complete")
      .format("memory").queryName("eflags").start()
    try {
      input.addData(
        (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f, 1.0f, 0.0f, 0.0f, 0.0f)),  // copy of 100
        (2L, Seq(0.99f, 0.01f, 0.0f, 0.0f, 1.0f, 0.0f, 0.0f, 0.0f)),// near-dup of 100
        (3L, Seq(-1.0f, 0.5f, 0.5f, -0.5f, 0.0f, 0.0f, 1.0f, 0.0f)))// unrelated
      q.processAllAvailable()
      val out = spark.sql(
          "SELECT vec_id, matched_corpus_id, best_cosine FROM eflags")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(out.get(1L).exists { case (m, c) => m == 100L && c > 0.9999 })
      assert(out.get(2L).exists { case (m, c) => m == 100L && c >= 0.98 })
      assert(!out.contains(3L)) // candidate or not, it cannot pass the verify
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark admits only first arrival of same content") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val admitted = DedupStream.exactAdmission(
      input.toDF().toDF("doc_id", "text", "event_time"), "text", "event_time")
    val q = admitted.writeStream.outputMode("append")
      .format("memory").queryName("admitted").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:05:00")
      input.addData((1L, "same doc content", t0), (2L, "same doc content", t1),
        (3L, "other content", t1))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM admitted").as[Long].collect().toSet
      assert(ids.contains(3L))
      assert((ids & Set(1L, 2L)).size == 1) // exactly one arrival of the dup admitted
    } finally q.stop()
  }

  test("stream-static media admission verifies exact hamming in-flight") {
    import graft.operators.Multimodal
    def ppm(pix: Array[Byte], w: Int, h: Int): Array[Byte] =
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ pix
    val w = 36; val h = 32
    def ramp(f: (Int, Int) => Int): Array[Byte] = Array.tabulate(w * h * 3) { i =>
      val px = i / 3; f(px % w, px / w).toByte
    }
    val a = ramp((x, _) => x * 7)
    val edited = a.clone()
    for (y <- 0 until 4; x <- 0 until 8; c <- 0 until 3)
      edited((y * w + x) * 3 + c) = 250.toByte
    val corpus = Seq(
      (100L, "image", ppm(a, w, h)),
      (101L, "image", ppm(ramp((x, _) => (w - 1 - x) * 7), w, h)),
      (102L, "image", ppm(a, w, h))) // identical twin of 100: contracts away
      .toDF("media_id", "kind", "payload")
    // the stream probes the SIGNATURE index, never the corpus blobs
    val index = DedupStream.mediaSignatureIndex(
      Multimodal.perceptualHashes(corpus, Multimodal.anyImagePhashHasher()),
      maxHamming = 6)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Array[Byte])]
    val flags = DedupStream.nearDupMediaFlags(
      input.toDF().toDF("media_id", "kind", "payload"), index,
      Multimodal.anyImagePhashHasher()) // radius rides the index
    val q = flags.writeStream.outputMode("complete")
      .format("memory").queryName("mediaflags").start()
    try {
      input.addData(
        (1L, "image", ppm(a, w, h)),      // exact dup of 100
        (2L, "image", ppm(edited, w, h)), // near-dup of 100
        (3L, "image", ppm(ramp((x, _) => if ((x / 4) % 2 == 0) 200 else 50),
          w, h)),                         // novel
        (4L, "image", Array[Byte](5, 5))) // undecodable
      q.processAllAvailable()
      val out = spark.sql(
          "SELECT media_id, matched_corpus_id, best_hamming, n_corpus_matches " +
          "FROM mediaflags")
        .as[(Long, Long, Int, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      // exact copy: hamming 0, verified in-flight; the identical store twin
      // 102 contracted to its representative, so ONE match, not two
      assert(out(1L) == (100L, 0, 1L))
      assert(out(2L)._1 == 100L && out(2L)._2 > 0 && out(2L)._2 <= 6)
      assert(!out.contains(3L) && !out.contains(4L)) // novel + junk unflagged
    } finally q.stop()
  }
}
