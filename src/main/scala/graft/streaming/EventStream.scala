package graft.streaming

import graft.ops.TimeSeriesOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming restatement of the reference's cron micro-batch semantics
  * (SURVEY.md §2.9): the reference polls a directory every 30 minutes, gates on file
  * mtime, and upserts late/updated data keyed `(tms_id, time, fgt)`
  * (ref: crontab.txt:5,8; outputs/extract_mike_data_to_db.sh:5-21;
  * outputs/extract_water_level.py:96-97).
  *
  * Spark-native equivalents:
  *  - T3 new-file detection  -> file-source stream (tracks processed files natively)
  *  - T2 freshness watermark -> `withWatermark` on event time
  *  - T1 micro-batch trigger -> `Trigger.ProcessingTime`
  *  - T4 idempotent upsert   -> `foreachBatch` + JdbcUpsert (fgt = version column)
  */
object EventStream {

  /** Reference shape of the events table with the LEGACY nanos-long `ts`. Live
    * streams must NOT assume it for non-empty directories: the testdata's
    * physical encoding has changed across generations, so sources take the
    * schema from the files actually present
    * ([[graft.io.EventsTs.streamSchema]]) and normalize `ts` through the same
    * seam the batch loader uses ([[graft.io.EventsTs.toNanosLong]]). This shape
    * is the startup fallback when the watched directory is still empty (the
    * normal file-source pattern — the reference's cron polls a directory that
    * may not have produced a file yet); `ts` long is canonical, so the seam
    * no-ops on it. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // ns epoch (parquet TIMESTAMP(NANOS) read as long)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over `dir`'s events files, `ts` normalized to the
    * canonical nanos long regardless of the files' physical encoding. */
  def eventSource(spark: SparkSession, dir: String): DataFrame =
    graft.io.EventsTs.toNanosLong(
      spark.readStream.schema(graft.io.EventsTs.streamSchema(spark, dir))
        .option("pathGlobFilter", "events*.parquet") // the sf dirs hold ALL tables
        .parquet(dir))

  /** File-source stream -> watermark -> tumbling-window aggregate. The windowed agg
    * keeps state per (window, event_type); the 1-hour watermark bounds that state so
    * it cannot grow with stream length — the scale guardrail for a continuous run. */
  def windowedCounts(spark: SparkSession, dir: String,
                     windowLen: String = "15 minutes",
                     watermark: String = "1 hour"): DataFrame =
    eventSource(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))

  /** Watermarked STREAM-STREAM interval join: each left event pairs with the
    * right-stream events of the same key whose event time lies within
    * [left - tolerance, left]. Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can expire buffered rows —
    * state is O(key-rate × tolerance), never stream-length. This is the
    * streaming form of the as-of/interval alignment the batch engine does with
    * `TimeSeriesOps.asofJoin`/`RangeJoin` (e.g. correlating a sensor stream
    * with its station's rain-gauge stream while both are in flight). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   timeCol: String, tolerance: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(timeCol, watermark).as("l")
    val r = right.withWatermark(timeCol, watermark).as("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$timeCol") >= col(s"l.$timeCol") - expr(s"interval $tolerance") &&
        col(s"r.$timeCol") <= col(s"l.$timeCol"))
  }

  /** foreachBatch upsert driver: each micro-batch lands via the idempotent JDBC
    * upsert keyed (window_start, event_type) — re-processing a batch is a no-op
    * mutation-wise, replicating T4/T5. */
  def startUpsertSink(agg: DataFrame, url: String, table: String,
                      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    agg.selectExpr("window.start AS window_start", "event_type", "n", "value_cents")
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.io.JdbcUpsert.upsert(batch, url, table,
          Seq("window_start", "event_type"))
        ()
      }
      .start()
}
