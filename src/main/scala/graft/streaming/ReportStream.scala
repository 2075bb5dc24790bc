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

  /** Render the newest complete report snapshot, if any fold has landed.
    * The HLL precision is read from the version's `p.meta` sidecar — the
    * register frame alone does not determine p, and estimating at a p other
    * than the one the stream folded with is silently wrong (r9 ADVICE), so
    * callers cannot supply one. */
  def currentReport(spark: SparkSession, storePath: String,
                    strataCol: String): Option[DataFrame] =
    SketchStream.latestVersion(spark, storePath, None).map { case (_, pth) =>
      val carrier = spark.read.parquet(s"$pth/carrier")
      val est = Cardinality.hllEstimate(
          spark.read.parquet(s"$pth/registers"), Seq(strataCol),
          readP(spark, pth))
        .select(col(strataCol), col("estimate").as("n_distinct_tokens"))
      Reports.render(carrier, est, strataCol)
    }

  /** The fold precision recorded beside a version's register frame. */
  private def readP(spark: SparkSession, versionDir: String): Int = {
    val pPath = new org.apache.hadoop.fs.Path(s"$versionDir/p.meta")
    val hfs = pPath.getFileSystem(spark.sessionState.newHadoopConf())
    require(hfs.exists(pPath),
      s"report store version $versionDir carries no p.meta — the store " +
        "predates the precision sidecar; re-fold it (the registers alone " +
        "cannot be estimated at an assumed p)")
    val in = hfs.open(pPath)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    finally in.close()
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
          // register frames only max-merge at EQUAL p — a precision change
          // mid-stream must start a fresh store, not silently corrupt this one
          val prevP = readP(spark, prev)
          require(prevP == p,
            s"report store was folded at p=$prevP but this run uses p=$p — " +
              "registers at different precisions cannot merge; point the " +
              "stream at a fresh storePath (or keep p)")
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
    // precision sidecar: the registers don't determine p, and the renderer
    // must never estimate at an assumed one — written before the version's
    // completeness marker so a complete version always carries it
    val pOut = hfs.create(new org.apache.hadoop.fs.Path(s"$dir/p.meta"), true)
    try pOut.write(p.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally pOut.close()
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
