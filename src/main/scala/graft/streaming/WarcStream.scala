package graft.streaming

import graft.io.Warc
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming WARC ingestion — the crawl analog of the run-dir gate (T3):
  * a file-source stream WATCHES a landing directory of `.warc` /
  * `.warc.gz` captures; each micro-batch's newly-arrived files run through
  * the production record parser and HTTP-envelope extraction
  * (`Warc.records` → `Warc.textDocs`) and the resulting documents are
  * handed to the sink — where the existing foreachBatch seams (exact/LSH
  * admission against a seen-store, quality gates, upsert sinks) compose
  * exactly as they do for any other document stream.
  *
  * Memory posture: the streaming source is used ONLY as a file WATCHER —
  * the batch carries (path, length), never `content` (the binaryFile
  * source prunes unread columns, so the bytes are not materialized into a
  * row). The paths — bounded by `maxFilesPerTrigger` — are re-read through
  * `sc.binaryFiles` + the one-record-at-a-time streaming parse, the same
  * bounded-memory path batch ingestion uses; a 1 GB capture never becomes
  * a 1 GB cell. Exactly-once lands on the checkpoint (file-source offsets
  * are file names) + idempotent-sink contract, same as every other stream
  * here: a replayed micro-batch re-parses the same files into the same
  * rows. */
object WarcStream {

  /** Watch `landingDir` and hand each micro-batch's parsed text documents
    * (url, warc_date, http_status, mime, text — see [[Warc.textDocs]]) to
    * `sink`. The sink decides admission/persistence; it runs on a BATCH
    * frame, so every batch operator composes. */
  def run(spark: SparkSession, landingDir: String, checkpoint: String,
          maxFilesPerTrigger: Int = 32,
          maxPayloadBytes: Long = Warc.DefaultMaxPayloadBytes)
         (sink: DataFrame => Unit): StreamingQuery =
    spark.readStream.format("binaryFile")
      // file streams require an explicit schema; binaryFile's is fixed
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(landingDir)
      .select(col("path"), col("length")) // watcher only: content pruned
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // bounded: at most maxFilesPerTrigger paths per batch. Re-read via
        // the EXACT-path route — `records`' binaryFiles argument is
        // comma-split and glob-expanded, so a landing file named
        // `a,b.warc.gz` (or carrying {}[]*?) would mis-resolve through
        // paths.mkString(",") (r13 advice)
        val paths = batch.select(col("path"))
          .as(Encoders.STRING).collect()
        if (paths.nonEmpty)
          sink(Warc.textDocs(
            Warc.recordsFromPaths(spark, paths.toSeq,
              maxPayloadBytes)).toDF())
        ()
      }
      .start()
}
