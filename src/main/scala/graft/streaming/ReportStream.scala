package graft.streaming

import graft.operators.{Cardinality, Reports}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DATA-CARD upkeep — the live twin of the batch `Reports
  * .corpusReport` (q108): every micro-batch folds its slice of arriving
  * documents into a per-source report store, and `currentReport` renders the
  * same presentation frame the batch job publishes, at any moment, without
  * rescanning history.
  *
  * Mergeability decides the mechanics (the SketchStream lesson):
  *  - the carrier columns (doc/token/entropy/lang SUMS) merge by exact
  *    addition — NOT idempotent under at-least-once replay, so the fold is
  *    VERSIONED: each batch writes `v=<batchId>` by merging the newest
  *    complete version STRICTLY older than itself; replaying a batch re-reads
  *    the same predecessor and rewrites the same version, idempotent by
  *    construction;
  *  - the vocabulary column cannot be an exact distinct (unmergeable without
  *    the full token history) — the store carries the q93 HLL REGISTER frame
  *    instead (max-merge), and the render surfaces its estimate as
  *    `n_distinct_tokens`, the documented estimate-for-exact swap the batch
  *    report's scaladoc promises. Both frames ride the same version so a
  *    snapshot is always internally consistent. */
object ReportStream {

  /** Render the newest complete report snapshot, if any fold has landed. */
  def currentReport(spark: SparkSession, storePath: String,
                    strataCol: String, p: Int = 8): Option[DataFrame] =
    SketchStream.latestVersion(spark, storePath, None).map { case (_, pth) =>
      val carrier = spark.read.parquet(s"$pth/carrier")
      val est = Cardinality.hllEstimate(
          spark.read.parquet(s"$pth/registers"), Seq(strataCol), p)
        .select(col(strataCol), col("estimate").as("n_distinct_tokens"))
      Reports.render(carrier, est, strataCol)
    }

  /** One fold: batch carrier + registers merged with the newest version
    * older than `batchId`, written as `v=<batchId>`, old versions pruned.
    * Factored out so the replay-idempotence contract is spec-testable. */
  private[graft] def foldReportBatch(batch: DataFrame, batchId: Long,
      textCol: String, strataCol: String, langCol: String,
      storePath: String, p: Int, keepVersions: Int,
      entropyFloorE6: Long): Unit = {
    val spark = batch.sparkSession
    val bCarrier = Reports.reportCarrier(batch, textCol, strataCol,
      langCol, entropyFloorE6)
    val bRegs = Cardinality.hllRegisters(
      batch.select(col(strataCol),
        explode(graft.functions.TextFns.words(col(textCol))).as("__t")),
      Seq(strataCol), col("__t"), p)
    val (carrier, regs) =
      SketchStream.latestVersion(spark, storePath, Some(batchId)) match {
        case Some((_, prev)) =>
          (Reports.mergeCarriers(spark.read.parquet(s"$prev/carrier"),
            bCarrier, strataCol),
            Cardinality.mergeRegisters(
              spark.read.parquet(s"$prev/registers"), bRegs, Seq(strataCol)))
        case None => (bCarrier, bRegs)
      }
    // strata-bounded frames: materialize before the write in case the
    // predecessor version is being re-read
    val cRows = carrier.localCheckpoint(true)
    val rRows = regs.localCheckpoint(true)
    val dir = s"$storePath/v=$batchId"
    // the version is complete only once its own _SUCCESS lands (the parquet
    // writes mark their subdirs; the version-level marker gates
    // latestVersion). A REPLAY rewrites this same version, so the marker
    // from the previous attempt must come DOWN before the data writes —
    // otherwise a crash mid-rewrite (or a concurrent currentReport) sees a
    // "complete" version with partial/deleted data, and the next batch
    // would merge the corrupt predecessor forever.
    val root = new org.apache.hadoop.fs.Path(storePath)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), false)
    cRows.write.mode("overwrite").parquet(s"$dir/carrier")
    rRows.write.mode("overwrite").parquet(s"$dir/registers")
    hfs.create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
    SketchStream.pruneVersions(spark, storePath, keepVersions)
  }

  /** Maintain the report store over the arriving document stream. */
  def run(stream: DataFrame, textCol: String,
          strataCol: String, langCol: String, storePath: String,
          checkpoint: String, p: Int = 8, keepVersions: Int = 2,
          entropyFloorE6: Long = 2000000L): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          foldReportBatch(batch, batchId, textCol, strataCol,
            langCol, storePath, p, keepVersions, entropyFloorE6)
        ()
      }
      .start()
}
