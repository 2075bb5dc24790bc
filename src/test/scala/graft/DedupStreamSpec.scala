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
}
