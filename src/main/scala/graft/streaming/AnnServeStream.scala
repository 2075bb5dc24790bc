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
    * RESTART contract: this driver is session-scoped. On restart against
    * an existing checkpoint, pass the LIVE generation (load the dir your
    * `onPublish` last reported) as `initial` — the checkpoint skips
    * already-processed batches, so re-seeding from an older index would
    * silently publish a generation missing those ticks. */
  def maintain(updates: DataFrame, initial: Similarity.IvfPqIndex,
               dirA: String, dirB: String, checkpoint: String)
              (onPublish: String => Unit): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    initial.save(dirA)
    var cur = dirA
    onPublish(cur)
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
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
          cur = nextDir
          onPublish(cur)
        }
        ()
      }
      .start()
  }
}
