package graft.streaming

import graft.operators.{Cardinality, CountMin, Reports}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DATA-CARD upkeep — the live twin of the batch `Reports
  * .corpusReportFull` (q108/q111): every micro-batch folds its slice of
  * arriving documents into a per-source report store, and `currentReport`
  * renders the presentation frame the batch job publishes, at any moment,
  * without rescanning history.
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
  *    report's scaladoc promises;
  *  - the `top_tokens` column cannot ride an exact count table (at web scale
  *    a per-stratum vocabulary count store is GBs per version, rewritten
  *    every batch) — the store carries a Count-Min sketch (sum-merge, the
  *    q100 frame) plus a BOUNDED per-stratum candidate token pool
  *    (yesterday's candidates ∪ today's batch-local top tokens, re-ranked by
  *    sketch estimate and truncated each fold). The render estimates the
  *    pool against the sketch — counts are one-sided CMS estimates, the same
  *    estimate-for-exact swap as the vocabulary column. A true heavy hitter
  *    is only missing from the pool if it was never prominent in ANY batch —
  *    the standard sketch+candidates trade.
  *  All frames ride the same version so a snapshot is always internally
  *  consistent. Per-stratum KL-vs-mix stays a BATCH diagnostic
  *  (`corpusReportFull`): its sum runs over the full token support, which no
  *  constant-size mergeable frame carries — the documented boundary between
  *  the live card and the batch card. */
object ReportStream {

  /** Fold parameters recorded in the version's meta sidecar — the register
    * frame doesn't determine p, and the CMS frame doesn't determine its
    * geometry, so render/merge must never assume them (r9 ADVICE). */
  private final case class Meta(p: Int, wLog2: Int, d: Int)

  /** Render the newest complete report snapshot, if any fold has landed:
    * the q108 card columns + `top_tokens` ("tok:est,…", estimate DESC then
    * signed-FNV ASC — the batch card's exact-count column served from the
    * CMS store over the candidate pool). Sketch parameters are read from the
    * version's meta sidecar; callers cannot supply (and mismatch) them.
    *
    * SOURCE-COMPATIBLE BUT BEHAVIOR-CHANGING signature note (r10 ADVICE):
    * before r10 the 4th positional parameter was `p` (HLL precision); it is
    * now `topK` — both Int, so a pre-r10 positional caller like
    * `currentReport(spark, store, col, 8)` compiles silently and requests 8
    * top tokens instead of precision 8. `p` is no longer a parameter at all
    * (it rides the meta sidecar), so pass `topK` by name when upgrading. */
  def currentReport(spark: SparkSession, storePath: String,
                    strataCol: String, topK: Int = 5): Option[DataFrame] =
    SketchStream.latestVersion(spark, storePath, None).map { case (_, pth) =>
      val meta = readMeta(spark, pth)
      val carrier = spark.read.parquet(s"$pth/carrier")
      val est = Cardinality.hllEstimate(
          spark.read.parquet(s"$pth/registers"), Seq(strataCol), meta.p)
        .select(col(strataCol), col("estimate").as("n_distinct_tokens"))
      val hitters = CountMin.estimate(
          spark.read.parquet(s"$pth/cands"), col("__t"),
          spark.read.parquet(s"$pth/cms"), Seq(strataCol),
          meta.wLog2, meta.d)
        .select(col(strataCol), col("__t"), col("est").as("cnt"))
      Reports.render(carrier, est, strataCol)
        .join(Reports.topTokens(hitters, strataCol, topK),
          Seq(strataCol), "left")
        .withColumn("top_tokens", coalesce(col("top_tokens"), lit("")))
    }

  /** Parse the version's meta sidecar (`p=<n>` / `wLog2=<n>` / `d=<n>`). */
  private def readMeta(spark: SparkSession, versionDir: String): Meta = {
    val pPath = new org.apache.hadoop.fs.Path(s"$versionDir/p.meta")
    val hfs = pPath.getFileSystem(spark.sessionState.newHadoopConf())
    require(hfs.exists(pPath),
      s"report store version $versionDir carries no p.meta — the store " +
        "predates the parameter sidecar; re-fold it (registers/sketches " +
        "cannot be read back at assumed parameters)")
    val in = hfs.open(pPath)
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val kv = text.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map { l => val Array(k, v) = l.split("=", 2); k -> v.toInt }.toMap
    Meta(kv("p"), kv("wLog2"), kv("d"))
  }

  /** One fold: batch carrier + HLL registers + CMS + candidate pool merged
    * with the newest version older than `batchId`, written as `v=<batchId>`,
    * old versions pruned. Factored out so the replay-idempotence contract is
    * spec-testable. `candPerStratum` bounds the token pool per stratum
    * (store size: strata × candPerStratum rows — constant, not vocab). */
  private[graft] def foldReportBatch(batch: DataFrame, batchId: Long,
      textCol: String, strataCol: String, langCol: String,
      storePath: String, p: Int, keepVersions: Int,
      entropyFloorE6: Long, wLog2: Int = 12, d: Int = 3,
      candPerStratum: Int = 20): Unit = {
    val spark = batch.sparkSession
    val bCarrier = Reports.reportCarrier(batch, textCol, strataCol,
      langCol, entropyFloorE6)
    val toks = batch.select(col(strataCol),
      explode(graft.functions.TextFns.words(col(textCol))).as("__t"))
    val bRegs = Cardinality.hllRegisters(toks, Seq(strataCol), col("__t"), p)
    val bCms = CountMin.build(toks, Seq(strataCol), col("__t"), wLog2, d)
    // batch-local candidates: the batch's own heaviest tokens, exact within
    // the batch (batch-sized aggregate, heap top-k — never vocab-global)
    val bCands = graft.ops.TopK.topKPerGroup(
        toks.groupBy(col(strataCol), col("__t")).agg(count(lit(1)).as("cnt")),
        Seq(strataCol), col("cnt"),
        graft.functions.RollingHash64(col("__t")),
        Seq(col("__t")), candPerStratum)
      .select(col(strataCol), col("__t"))
    val prev = SketchStream.latestVersion(spark, storePath, Some(batchId))
    val (carrier, regs, cms, candPool) = prev match {
      case Some((_, prevDir)) =>
        // frames at different fold parameters must never merge — a p or
        // geometry change mid-stream starts a fresh store, loudly
        val m = readMeta(spark, prevDir)
        require(m == Meta(p, wLog2, d),
          s"report store was folded at $m but this run uses " +
            s"${Meta(p, wLog2, d)} — register/sketch frames at different " +
            "parameters cannot merge; point the stream at a fresh storePath")
        (Reports.mergeCarriers(spark.read.parquet(s"$prevDir/carrier"),
          bCarrier, strataCol),
          Cardinality.mergeRegisters(
            spark.read.parquet(s"$prevDir/registers"), bRegs, Seq(strataCol)),
          CountMin.merge(spark.read.parquet(s"$prevDir/cms"), bCms,
            Seq(strataCol)),
          spark.read.parquet(s"$prevDir/cands").unionByName(bCands))
      case None => (bCarrier, bRegs, bCms, bCands)
    }
    // re-rank the merged pool by CURRENT estimates and truncate — the pool
    // stays candPerStratum rows per stratum no matter how many batches fold
    val cands = graft.ops.TopK.topKPerGroup(
        CountMin.estimate(candPool.distinct(), col("__t"), cms,
          Seq(strataCol), wLog2, d),
        Seq(strataCol), col("est"),
        graft.functions.RollingHash64(col("__t")),
        Seq(col("__t")), candPerStratum)
      .select(col(strataCol), col("__t"))
    // strata-bounded frames: materialize before the write in case the
    // predecessor version is being re-read
    val cRows = carrier.localCheckpoint(true)
    val rRows = regs.localCheckpoint(true)
    val mRows = cms.localCheckpoint(true)
    val candRows = cands.localCheckpoint(true)
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
    mRows.write.mode("overwrite").parquet(s"$dir/cms")
    candRows.write.mode("overwrite").parquet(s"$dir/cands")
    // parameter sidecar: registers/sketches don't carry their own p/geometry,
    // and the renderer must never assume them — written before the version's
    // completeness marker so a complete version always carries it
    val pOut = hfs.create(new org.apache.hadoop.fs.Path(s"$dir/p.meta"), true)
    try pOut.write(s"p=$p\nwLog2=$wLog2\nd=$d\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally pOut.close()
    hfs.create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
    SketchStream.pruneVersions(spark, storePath, keepVersions)
  }

  /** Maintain the report store over the arriving document stream. */
  def run(stream: DataFrame, textCol: String,
          strataCol: String, langCol: String, storePath: String,
          checkpoint: String, p: Int = 8, keepVersions: Int = 2,
          entropyFloorE6: Long = 2000000L, wLog2: Int = 12, d: Int = 3,
          candPerStratum: Int = 20): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          foldReportBatch(batch, batchId, textCol, strataCol,
            langCol, storePath, p, keepVersions, entropyFloorE6,
            wLog2, d, candPerStratum)
        ()
      }
      .start()
}
