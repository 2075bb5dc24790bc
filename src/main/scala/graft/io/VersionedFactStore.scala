package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lake-native versioned fact store — the 100 TB analog of the JDBC warehouse
  * (S11/T4/T5 semantics on parquet): a relational upsert sink cannot hold 100 TB
  * of forecast facts, so ticks land as immutable fgt-partitioned parquet deltas
  * and version resolution moves to read time.
  *
  *  - WRITE (T4 idempotent): each tick writes its rows under `fgt=<ts>/`
  *    partitions with DYNAMIC partition overwrite — re-running a tick replaces
  *    exactly its own partitions, never appends duplicates and never touches
  *    other ticks. No coordination, no transaction log needed for this contract.
  *  - READ latest: "highest fgt wins per (tms_id, time)" — one window. The
  *    `asOf` variant filters `fgt <= t` FIRST, so partition pruning drops every
  *    newer tick's files before any row is read (time travel priced at planning
  *    time, like the date-partitioned layout in WarehouseLayoutSpec).
  *  - T5 read pattern: latest fgt per series is a plain aggregate over the
  *    pruned fact files — the run-dim lookup without a run table when the
  *    warehouse is the lake.
  *
  * Compaction (rewriting latest-wins into a base layout) composes from
  * `readLatest` + a partitioned write and is deliberately left to the operator
  * schedule, like the reference's retention cron. */
object VersionedFactStore {

  /** Idempotent tick append: dynamic overwrite of the tick's own fgt partitions. */
  def appendTick(facts: DataFrame, dir: String): Unit =
    facts.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("fgt")
      .parquet(dir)

  private def latestWins(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("tms_id"), col("time"))
      .orderBy(col("fgt").desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest version of every (tms_id, time) fact. */
  def readLatest(spark: SparkSession, dir: String): DataFrame =
    latestWins(spark.read.parquet(dir))

  /** Time travel: the warehouse as it stood when `fgt <= asOfFgt` — the filter
    * sits on the partition column, so newer ticks are pruned at the file index. */
  def readAsOf(spark: SparkSession, dir: String, asOfFgt: String): DataFrame =
    latestWins(spark.read.parquet(dir)
      .filter(col("fgt") <= lit(asOfFgt).cast("timestamp_ntz")))

  /** T5 read pattern: latest forecast-generation time per series. */
  def latestFgtPerSeries(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("tms_id"))
      .agg(max(col("fgt")).as("latest_fgt"))
}
