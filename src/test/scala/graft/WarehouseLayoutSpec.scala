package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Warehouse layout for scale: facts partitioned by date so time-range queries prune
  * partitions at planning time (SURVEY.md §4 — "partition the engine's warehouse
  * tables by date to enable pruning"). At 100 TB this is the difference between
  * scanning a day and scanning a decade. */
class WarehouseLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned fact write + partition pruning on read") {
    val dir = Files.createTempDirectory("wh").toString
    val facts = graft.io.EventsTs.toNanosLong(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withColumn("event_date", to_date($"event_time"))
    facts.write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val read = spark.read.parquet(dir)
      .filter($"event_date" === "2024-01-05")
    // partition pruning happens at the file index: only one date directory scanned
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_date"))
    val prunedCount = read.count()
    val fullCount = spark.read.parquet(dir).count()
    assert(prunedCount > 0 && prunedCount < fullCount)
    // the pruned scan must read strictly fewer files than exist
    val dates = new java.io.File(dir).listFiles.count(_.getName.startsWith("event_date="))
    assert(dates >= 28) // one directory per day of January data
  }

  test("bucketed fact-fact join is shuffle-free (big-big co-location, SURVEY §4)") {
    // two fact-sized tables bucketed on the join key: the sort-merge join reads
    // co-located buckets directly — NO Exchange on either side. At 100 TB this is
    // the difference between joining in place and shuffling both corpora.
    spark.sql("DROP TABLE IF EXISTS facts_a")
    spark.sql("DROP TABLE IF EXISTS facts_b")
    // stale unregistered locations from a previous JVM block managed-table create
    Seq("facts_a", "facts_b").foreach { t =>
      val p = Paths.get(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.select($"event_id", $"user_id", $"value")
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("facts_a")
    events.select($"event_id".as("eid2"), $"user_id", $"ts")
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("facts_b")
    // test tables are tiny, so the planner would broadcast; disable that to
    // exercise the big-big path the layout exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("facts_a").join(spark.table("facts_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS facts_a")
      spark.sql("DROP TABLE IF EXISTS facts_b")
    }
  }
}
