package graft

import graft.streaming.EventStream

/** T1-T5 end-to-end: file-source stream -> watermarked windowed aggregate ->
  * foreachBatch idempotent JDBC upsert (the reference's cron-extract-upsert loop,
  * SURVEY.md §2.9, as one Structured Streaming query). */
class StreamingUpsertSpec extends SparkSpec {

  test("stream -> windowed agg -> upsert sink lands idempotent, versioned rows") {
    val url = "jdbc:derby:memory:streamup;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute(
      """CREATE TABLE win_facts (window_start TIMESTAMP NOT NULL,
        |  event_type VARCHAR(32) NOT NULL, n BIGINT, value_cents BIGINT,
        |  PRIMARY KEY (window_start, event_type))""".stripMargin)
    c.close()
    val checkpoint = java.nio.file.Files.createTempDirectory("ckpt").toString
    val agg = EventStream.windowedCounts(spark, "/root/testdata/sf0.001")
    val q = EventStream.startUpsertSink(agg, url, "win_facts", checkpoint)
    try q.processAllAvailable() finally q.stop()
    val facts = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "win_facts").load()
    val total = facts.agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
    assert(total == 1000) // every sf0.001 event exactly once
    // re-processing the same data with a fresh checkpoint is a benign overwrite
    val checkpoint2 = java.nio.file.Files.createTempDirectory("ckpt2").toString
    val q2 = EventStream.startUpsertSink(
      EventStream.windowedCounts(spark, "/root/testdata/sf0.001"),
      url, "win_facts", checkpoint2)
    try q2.processAllAvailable() finally q2.stop()
    val total2 = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "win_facts").load()
      .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
    assert(total2 == 1000) // unchanged -> upsert, not append
  }
}
