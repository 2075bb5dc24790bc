package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Warehouse layout for scale: facts partitioned by date so time-range queries prune
  * partitions at planning time (SURVEY.md §4 — "partition the engine's warehouse
  * tables by date to enable pruning"). At 100 TB this is the difference between
  * scanning a day and scanning a decade. */
class WarehouseLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned fact write + partition pruning on read") {
    val dir = Files.createTempDirectory("wh").toString
    val facts = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
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
}
