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
}
