package graft.streaming

import graft.operators.{Classifier, NgramLm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming quality-gate admission: every arriving document is scored
  * against STATIC models — the bigram-LM perplexity filter (q83) and the
  * linear classifier margin (q85) — and only documents passing both gates
  * reach the sink. The continuous-ingest twin of the batch curation pipeline,
  * composed from the very same operators.
  *
  * Shape: `foreachBatch` re-uses the batch scorers verbatim per micro-batch —
  * the idiomatic Structured Streaming pattern for per-row-complete records
  * (a document arrives whole in one row, so no cross-batch state is ever
  * needed: no state store, no watermark, nothing grows with stream length).
  * The model frames stay static across the stream's lifetime; their
  * vocab-/dim-bounded sides broadcast inside each micro-batch exactly as in
  * the batch plans. Exactly-once lands on the checkpoint + idempotent-sink
  * contract, same as the reference's upsert sinks (S11/T4).
  *
  * Gate semantics: admit iff `avg_nll_e6 <= maxAvgNllE6` (not too surprising
  * under the in-domain LM) AND `margin_e3 >= minMarginE3` (classifier says
  * quality) AND — when `gopher = true` — both Gopher repetition batteries
  * keep the doc (line half q90 + word-n-gram half q98, paper-default
  * thresholds; pure per-row compiled kernels, so the extra gate adds no
  * shuffle and no state). Documents with fewer than two tokens have no LM
  * evidence and are REJECTED — an admission gate fails closed.
  *
  * `normalize = true` rewrites arriving text to the canonical CCNet form
  * (q102 `TextFns.normalizeText`) before any gate — the stream twin of the
  * batch job's `normalize_text` stage, so streamed admissions hash/dedup
  * identically to batch-curated corpora. `minCharEntropyE6 > 0` adds the
  * q103 sub-word gibberish floor. Both are per-row compiled projections:
  * no shuffle, no state. */
object QualityGateStream {

  def run(stream: DataFrame, idCol: String, textCol: String,
          lm: NgramLm.BigramLm, weights: DataFrame, dim: Int,
          maxAvgNllE6: Long, minMarginE3: Long, checkpoint: String,
          gopher: Boolean = false, normalize: Boolean = false,
          minCharEntropyE6: Long = 0L)
         (sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val normed = if (normalize)
            batch.withColumn(textCol,
              graft.functions.TextFns.normalizeText(col(textCol)))
          else batch
          val gated = if (minCharEntropyE6 > 0)
            normed.filter(graft.functions.CharEntropyExpr(col(textCol))
              >= minCharEntropyE6)
          else normed
          val b = gated.persist()
          val scored = b
            .join(NgramLm.scoreBigram(b, idCol, textCol, lm)
              .filter(col("avg_nll_e6") <= maxAvgNllE6)
              .select(col(idCol)), Seq(idCol))
            .join(Classifier.marginScore(b, idCol, textCol, weights, dim)
              .filter(col("margin_e3") >= minMarginE3)
              .select(col(idCol)), Seq(idCol))
          val admitted = if (!gopher) scored
            else scored
              .join(graft.operators.GopherRules
                .battery(b, idCol, textCol, minWords = 0)
                .filter(col("keep")).select(col(idCol)), Seq(idCol))
              .join(graft.operators.GopherRules
                .ngramBattery(b, idCol, textCol)
                .filter(col("keep")).select(col(idCol)), Seq(idCol))
          sink(admitted)
          b.unpersist()
        }
        ()
      }
      .start()
}
