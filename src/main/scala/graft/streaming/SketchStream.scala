package graft.streaming

import graft.operators.{Bloom, Cardinality}
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
}
