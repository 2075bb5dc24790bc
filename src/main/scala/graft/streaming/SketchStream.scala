package graft.streaming

import graft.operators.{Bloom, Cardinality, CountMin}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sketch maintenance: keep a corpus-wide HLL register store and a
  * Bloom word store current against a continuous document stream — the
  * "how many distinct tokens have we ever ingested / have we seen this
  * value before" dashboards at 100 TB, paid for one micro-batch at a time.
  *
  * Each micro-batch computes its OWN batch-local sketch (linear in the
  * batch, shuffle bounded by the sketch geometry — never corpus-shaped) and
  * folds it into the persisted store by the sketches' merge laws (max for
  * HLL registers, bitwise OR for Bloom words). The store IS the state: no
  * Spark state store, no watermark, nothing grows with stream length —
  * sketch frames are `strata × geometry`-bounded forever. Restart safety is
  * the checkpoint + idempotent-merge contract: re-merging an already-folded
  * batch is a no-op under max/OR (both are idempotent), so at-least-once
  * delivery still converges to the exact union sketch. */
object SketchStream {

  /** Read the current register store (empty frame if absent). */
  private def loadOrEmpty(spark: SparkSession, path: String,
                          schema: String): DataFrame =
    try spark.read.parquet(path)
    catch { case _: Throwable =>
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    }

  /** Maintain an HLL register store at `storePath` over `value` of the
    * arriving docs, per `strata`. Each batch: sketch the batch, max-merge
    * with the store, overwrite atomically (the store is geometry-bounded —
    * the rewrite is O(strata × 2ᵖ), not O(corpus)). */
  def runHll(stream: DataFrame, strata: Seq[String], valueCol: String,
             storePath: String, p: Int, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val schema = (strata.map(s => s"$s STRING") ++
            Seq("bucket INT", "rho INT")).mkString(", ")
          val batchRegs =
            Cardinality.hllRegisters(batch, strata, col(valueCol), p)
          val merged = Cardinality.mergeRegisters(
            loadOrEmpty(spark, storePath, schema), batchRegs, strata)
          // geometry-bounded frame: collect-free, but must materialize
          // BEFORE the overwrite reads-then-writes the same path
          val rows = merged.localCheckpoint(true)
          rows.write.mode("overwrite").parquet(storePath)
        }
        ()
      }
      .start()

  /** Maintain a Bloom word store at `storePath` over `value` of the
    * arriving docs — same fold shape, OR for max. */
  def runBloom(stream: DataFrame, strata: Seq[String], valueCol: String,
               storePath: String, bitsLog2: Int, k: Int,
               checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val schema = (strata.map(s => s"$s STRING") ++
            Seq("word_idx INT", "bits BIGINT")).mkString(", ")
          val batchWords =
            Bloom.build(batch, strata, col(valueCol), bitsLog2, k)
          val merged = Bloom.merge(
            loadOrEmpty(spark, storePath, schema), batchWords, strata)
          val rows = merged.localCheckpoint(true)
          rows.write.mode("overwrite").parquet(storePath)
        }
        ()
      }
      .start()

  // ------------------------- Count-Min (sum-merge) -------------------------
  //
  // The CMS merge law is counter SUM — NOT idempotent, unlike HLL max and
  // Bloom OR. Re-folding an already-applied batch into an overwritten store
  // would double-count, so at-least-once replay needs a different shape: each
  // fold writes a NEW store version keyed by the micro-batch id, merging the
  // newest complete version STRICTLY OLDER than the batch. Replaying batch N
  // re-reads the same predecessor and rewrites the same `v=N` — idempotent by
  // construction, no batch-ledger bookkeeping. Readers take the newest
  // `_SUCCESS`-complete version; a crash mid-write leaves an incomplete dir
  // that both readers and the replay's predecessor lookup ignore.

  /** Newest `_SUCCESS`-complete `v=<id>` version under `storePath` with id
    * strictly below `below` (None = unbounded). */
  private[streaming] def latestVersion(spark: SparkSession, storePath: String,
                            below: Option[Long]): Option[(Long, String)] = {
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (!n.startsWith("v=")) None
        else scala.util.Try(n.drop(2).toLong).toOption
          .filter(v => below.forall(v < _))
          .filter(_ => fs.exists(new Path(st.getPath, "_SUCCESS")))
          .map(v => (v, st.getPath.toString))
      }
      .sortBy(-_._1).headOption
  }

  /** The current Count-Min counter store (newest complete version), if any
    * fold has completed yet — the read side for serving / heavy-hitter
    * probes. */
  def currentCms(spark: SparkSession, storePath: String): Option[DataFrame] =
    latestVersion(spark, storePath, None)
      .map { case (_, p) => spark.read.parquet(p) }

  /** One CMS fold: batch-local sketch, merged with the newest version older
    * than `batchId`, written as `v=<batchId>`, old versions pruned down to
    * `keepVersions`. Factored out of the stream so the replay-idempotence
    * contract is directly spec-testable. */
  private[graft] def foldCmsBatch(batch: DataFrame, batchId: Long,
      strata: Seq[String], valueCol: String, storePath: String,
      wLog2: Int, d: Int, keepVersions: Int): Unit = {
    val spark = batch.sparkSession
    val batchSketch = CountMin.build(batch, strata, col(valueCol), wLog2, d)
    val merged = latestVersion(spark, storePath, Some(batchId)) match {
      case Some((_, p)) =>
        CountMin.merge(spark.read.parquet(p), batchSketch, strata)
      case None => batchSketch
    }
    // geometry-bounded frame (strata × d × 2^wLog2): collect-free, but must
    // materialize before the write in case the predecessor is re-read
    val rows = merged.localCheckpoint(true)
    rows.write.mode("overwrite").parquet(s"$storePath/v=$batchId")
    pruneVersions(spark, storePath, keepVersions)
  }

  /** Keep the newest `keepVersions` versions under `storePath` — the direct
    * predecessor must survive so a replay of the NEXT batch can re-merge.
    * Shared by every versioned-fold store (CMS, report). */
  private[streaming] def pruneVersions(spark: SparkSession, storePath: String,
                                       keepVersions: Int): Unit = {
    // < 2 would silently break replay idempotence: pruned to one version, a
    // replay of that same batch finds no strictly-older predecessor and
    // resets the store to just the batch's own data (r9 ADVICE)
    require(keepVersions >= 2,
      s"keepVersions must be >= 2 (the direct predecessor must survive for " +
        s"replay re-merge), got $keepVersions")
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (!n.startsWith("v=")) None
        else scala.util.Try(n.drop(2).toLong).toOption.map((_, st.getPath))
      }
      .sortBy(-_._1).drop(keepVersions)
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Maintain a Count-Min counter store over `value` of the arriving docs,
    * per `strata` — the frequency third of the streaming sketch upkeep
    * (HLL counts distincts, Bloom answers membership, CMS answers "how
    * often"). Versioned folds, not in-place overwrites: see the section
    * note on the non-idempotent sum merge. */
  def runCms(stream: DataFrame, strata: Seq[String], valueCol: String,
             storePath: String, wLog2: Int, d: Int, checkpoint: String,
             keepVersions: Int = 2): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          foldCmsBatch(batch, batchId, strata, valueCol, storePath,
            wLog2, d, keepVersions)
        ()
      }
      .start()
}
