package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN serving: a continuous stream of query vectors is answered
  * per micro-batch against a STATIC persisted IVF+PQ index — the
  * continuous-ingest twin of the q77 serving path, composed from the very
  * same operator (`ivfPqSearch`, asymmetric-distance over broadcast
  * codebooks, probing only `nProbe` cells of the cell-partitioned corpus
  * under dynamic partition pruning).
  *
  * Shape: `foreachBatch` reuses the batch search verbatim — queries are
  * row-complete (a vector arrives whole), so no cross-batch state exists:
  * no state store, no watermark, nothing grows with stream length. The
  * index frames stay static for the stream's lifetime; each micro-batch
  * pays query-batch-sized work (cell argmax + probed-cell ADC), never
  * corpus-sized. Exactly-once lands on the checkpoint + idempotent-sink
  * contract (S11/T4), like every sink in this engine. */
object AnnServeStream {

  def run(queries: DataFrame, index: Similarity.IvfPqIndex, k: Int,
          nProbe: Int, checkpoint: String)
         (sink: DataFrame => Unit): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) sink(Similarity.ivfPqSearch(index, batch, k, nProbe))
        ()
      }
      .start()

  /** Streaming dense-INDEX maintenance (r16) — the BM25 generation-swap
    * discipline (WarcStream + `Bm25.add`, A/B table alternation) applied
    * to the IVF+PQ store: `updates` is a stream of (op, vec_id, embedding)
    * rows; each micro-batch folds its `op = 'add'` vectors in with
    * [[Similarity.ivfPqAdd]], drops its `op = 'del'` ids with
    * [[Similarity.ivfPqRemove]] (within one tick adds apply FIRST, so an
    * add+del of the same id nets to deleted), and publishes the NEXT
    * generation to the alternate directory — a parquet index cannot
    * overwrite itself while being served; readers always load a complete
    * generation. `onPublish` reports each newly-current dir (wire it to
    * the serving side's index swap).
    *
    * Quantizers are FROZEN for the stream's lifetime (the add/remove
    * contract): after any tick sequence the live generation is bit-for-bit
    * the one-shot encode of the surviving vector set under the same
    * centroids/books — spec-pinned in AnnServeStreamSpec. Per-tick work is
    * batch-sized (assign + encode the adds, one broadcast anti-join for
    * the dels) plus the generation rewrite; at real scale the rewrite is
    * the cells frame's parquet copy, which a partitioned store amortizes —
    * the compute never re-scans, re-trains, or re-encodes the corpus.
    *
    * EXACTLY-ONCE: each generation dir carries the id of the batch that
    * produced it (`applied/`, the standard foreachBatch idempotence
    * recipe). A replayed batch — the at-least-once window between a
    * generation publishing and the checkpoint committing — compares its
    * batchId against the live generation's and no-ops, so a crash can
    * never double-apply adds (ivfPqAdd is a plain union; without the
    * guard a replay would duplicate the batch's vectors in the served
    * index). A crash mid-save of the NEXT generation leaves the live one
    * untouched and the replay re-ticks over the partial dir.
    *
    * RESTART contract: this driver is session-scoped. On restart against
    * an existing checkpoint, pass the LIVE generation's DIR (the one your
    * `onPublish` last reported) as `seedDir` — the stream resumes
    * publishing from it, committed batches skip via the checkpoint, and
    * the in-flight one via the applied-batch guard. Passing `initial`
    * again instead would overwrite the live dir while reading it (the
    * generation being dirA half the time). `seedDir` must be `dirA` or
    * `dirB`; `initial` is ignored (pass null) when it is set. */
  def maintain(updates: DataFrame, initial: Similarity.IvfPqIndex,
               dirA: String, dirB: String, checkpoint: String,
               seedDir: String = "")
              (onPublish: String => Unit): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    require(seedDir.isEmpty || seedDir == dirA || seedDir == dirB,
      s"seedDir must be dirA or dirB, got $seedDir")
    require(seedDir.nonEmpty || initial != null,
      "pass initial for a fresh start, or seedDir for a restart")
    val spark0 = updates.sparkSession
    // the applied marker is scoped to the checkpoint INCARNATION, not the
    // checkpoint path: batch ids restart from 0 whenever the checkpoint
    // dir is recreated, and a marker from the previous life of the SAME
    // path must not veto the new stream's first batches (nor may a
    // replayed batch of the SAME life re-apply). The incarnation id lives
    // inside the checkpoint dir itself, so it survives JVM restarts with
    // the checkpoint and dies with it.
    val incarnation = incarnationId(spark0, checkpoint)
    var cur =
      if (seedDir.nonEmpty) seedDir
      else {
        initial.save(dirA)
        writeApplied(spark0, dirA, incarnation, -1L)
        dirA
      }
    onPublish(cur)
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cur = applyTick(batch, batchId, cur, dirA, dirB, incarnation,
          onPublish)
        ()
      }
      .start()
  }

  /** One maintenance tick — the foreachBatch body, exposed for the spec to
    * drive the replay veto directly. Applies `batch` iff its id is newer
    * than the live generation's applied marker (same incarnation) and
    * returns the new current dir (unchanged on a veto or an empty
    * batch). */
  private[graft] def applyTick(batch: DataFrame, batchId: Long,
                                   cur: String, dirA: String, dirB: String,
                                   incarnation: String,
                                   onPublish: String => Unit): String = {
    import org.apache.spark.sql.functions.col
    val spark = batch.sparkSession
    if (batch.isEmpty || batchId <= readApplied(spark, cur, incarnation))
      cur
    else {
      val live = Similarity.IvfPqIndex.load(spark, cur)
      val adds = batch.filter(col("op") === "add")
        .select(col("vec_id"), col("embedding"))
      val dels = batch.filter(col("op") === "del").select(col("vec_id"))
      val added =
        if (adds.isEmpty) live else Similarity.ivfPqAdd(live, adds)
      val next =
        if (dels.isEmpty) added else Similarity.ivfPqRemove(added, dels)
      val nextDir = if (cur == dirA) dirB else dirA
      next.save(nextDir)
      writeApplied(spark, nextDir, incarnation, batchId)
      onPublish(nextDir)
      nextDir
    }
  }

  // exactly-once bookkeeping shared with PackingStream — see [[Applied]]
  private def incarnationId(spark: org.apache.spark.sql.SparkSession,
                            checkpoint: String): String =
    Applied.incarnationId(spark, checkpoint)

  private def writeApplied(spark: org.apache.spark.sql.SparkSession,
                           dir: String, incarnation: String,
                           batchId: Long): Unit =
    Applied.write(spark, dir, incarnation, batchId)

  private def readApplied(spark: org.apache.spark.sql.SparkSession,
                          dir: String, incarnation: String): Long =
    Applied.read(spark, dir, incarnation)
}
