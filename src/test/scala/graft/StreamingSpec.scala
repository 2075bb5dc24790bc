package graft

import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("windowed streaming agg over the events file source (memory sink)") {
    val agg = EventStream.windowedCounts(spark, "/root/testdata/sf0.001")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("ev_counts")
      .start()
    try {
      q.processAllAvailable()
      val out = spark.sql(
        """SELECT count(*) AS n, sum(n) AS total
          |FROM ev_counts""".stripMargin).collect().head
      assert(out.getLong(0) > 0)     // windows materialized
      assert(out.getLong(1) == 1000) // every sf0.001 event counted exactly once
    } finally q.stop()
  }
}
