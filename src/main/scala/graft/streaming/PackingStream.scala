package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING TOKENIZED EXPORT — the continuous-ingest twin of the
  * tokenized-corpus job output (the pipeline's true last mile kept warm):
  * curated docs stream in, each micro-batch encodes under the FROZEN
  * day-one tokenizer (merge rules + published vocab — day-two ids stay
  * consistent with every id already on disk) and cuts into packed pieces
  * that CONTINUE each shard's token stream — bin ids keep counting across
  * ticks, a batch's first doc tops up the previous tick's partial final
  * bin, and a training reader sees ONE continuous packed corpus.
  *
  * Layout under `outDir`:
  *  - `pieces/batch=<id>/` — each tick's pieces, written with OVERWRITE
  *    into its own batch dir (the idempotent-sink half of exactly-once: a
  *    replayed tick recuts bit-identical pieces — [[graft.operators.Packing
  *    .tokenizedBatch]] is deterministic given (state, batch) — and lands
  *    on the same dir). `spark.read.parquet(outDir + "/pieces")` reads the
  *    whole corpus, the batch id surfacing as a partition column.
  *  - `_stateA/` / `_stateB/` — the per-shard (shard, base_tokens) carry
  *    frame, generation-swapped with an applied-batch marker (the
  *    [[AnnServeStream.maintain]] discipline via [[Applied]]): state is
  *    read while being replaced, so it never overwrites in place; a crash
  *    mid-publish leaves the live generation intact and the replayed tick
  *    re-cuts from it (re-overwriting the same pieces dir). The live
  *    generation is DISCOVERED by comparing both markers — restarts need
  *    no seed argument.
  *
  * Packing order is (tick, id): within a batch docs pack in id order (the
  * operator's window), across batches in arrival order — deterministic
  * given the tick sequence, and equal to the one-shot batch export when
  * docs arrive in shard-contiguous id order (spec-pinned). Per-tick work
  * is batch-sized (word-distinct encode + one window over batch rows) plus
  * a shard-bounded state rewrite; nothing re-scans published pieces. */
object PackingStream {

  /** Watch the streaming `docs` frame (idCol, textCol, shardCol…); write
    * pieces + carry state under `outDir`. `onTick` fires after each
    * applied batch with (batchId, that batch's pieces dir). */
  def run(docs: DataFrame, idCol: String, textCol: String,
          shardCols: Seq[String], tokenBudget: Long,
          merges: Seq[(String, String)], vocab: DataFrame,
          outDir: String, checkpoint: String, byteLevel: Boolean = false)
         (onTick: (Long, String) => Unit = (_, _) => ()): StreamingQuery = {
    val spark = docs.sparkSession
    val frozenVocab = vocab.cache()
    val incarnation = Applied.incarnationId(spark, checkpoint)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyTick(batch, batchId, idCol, textCol, shardCols, tokenBudget,
          merges, frozenVocab, outDir, incarnation, onTick, byteLevel)
        ()
      }
      .start()
  }

  /** One export tick — the foreachBatch body, exposed for the spec to
    * drive the replay veto directly. Applies `batch` iff its id is newer
    * than the live state generation's applied marker (same incarnation);
    * an empty batch no-ops; a replayed batch no-ops except that the batch
    * that IS the live generation (the crash-between-marker-and-commit
    * window) re-fires `onTick` — its pieces ARE on disk, and a downstream
    * that only hears via onTick must not lose them (at-least-once). */
  private[graft] def applyTick(batch: DataFrame, batchId: Long,
                               idCol: String, textCol: String,
                               shardCols: Seq[String], tokenBudget: Long,
                               merges: Seq[(String, String)],
                               vocab: DataFrame, outDir: String,
                               incarnation: String,
                               onTick: (Long, String) => Unit,
                               byteLevel: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val (dirA, dirB) = (s"$outDir/_stateA", s"$outDir/_stateB")
    val (apA, apB) = (Applied.read(spark, dirA, incarnation),
      Applied.read(spark, dirB, incarnation))
    val cur = if (apA < 0 && apB < 0) "" else if (apA >= apB) dirA else dirB
    // a marker under a FOREIGN incarnation with none under ours means the
    // checkpoint was wiped but outDir kept: the carry state would restart
    // from zero while the old incarnation's pieces/batch=* dirs persist —
    // the cumulative corpus would silently mix two bin numberings
    // (AnnServeStream can shrug here because its generations are full
    // snapshots; this sink is cumulative). Refuse loudly.
    require(!(cur.isEmpty &&
        (Applied.exists(spark, dirA) || Applied.exists(spark, dirB))),
      s"$outDir carries state from another checkpoint incarnation — " +
        "reuse the original checkpoint dir, or clear outDir for a fresh " +
        "stream (its pieces belong to the old incarnation's numbering)")
    if (batchId <= math.max(apA, apB)) {
      if (batchId == math.max(apA, apB))
        onTick(batchId, s"$outDir/pieces/batch=$batchId")
      return
    }
    if (batch.isEmpty) return
    val base =
      if (cur.isEmpty) emptyState(spark, batch, shardCols)
      else spark.read.parquet(s"$cur/state")
    val (pieces, advanced) = graft.operators.Packing.tokenizedBatch(
      batch, idCol, textCol, shardCols, tokenBudget, merges, vocab, base,
      byteLevel)
    val piecesDir = s"$outDir/pieces/batch=$batchId"
    pieces.write.mode("overwrite").parquet(piecesDir)
    // untouched shards keep their carry rows; batch shards take theirs
    val merged = base.join(advanced.select(shardCols.map(col): _*),
        shardCols, "left_anti")
      .unionByName(advanced)
    val target = if (cur == dirA) dirB else dirA // fresh ("") starts at A
    merged.write.mode("overwrite").parquet(s"$target/state")
    Applied.write(spark, target, incarnation, batchId)
    // BOTH writes landed — only now free the tick's encode pin (the state
    // frame's lineage references it too)
    graft.operators.Dedup.release(pieces)
    onTick(batchId, piecesDir)
  }

  /** The whole published corpus: every tick's pieces, batch id as a
    * partition column. */
  def pieces(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/pieces")

  /** The validation manifest over EVERYTHING published so far
    * ([[graft.operators.Packing.shardManifest]] on the full pieces table)
    * — computed whole rather than per tick because bins STRADDLE ticks (a
    * batch's first doc tops up the previous tick's final bin): a per-batch
    * manifest would hash partial bins and certify nothing a reader can
    * check. Equal to the one-shot export's manifest when arrival order
    * matches id order (the PackingStreamSpec equality). */
  def manifest(spark: SparkSession, outDir: String, idCol: String,
               shardCols: Seq[String]): DataFrame =
    graft.operators.Packing.shardManifest(
      pieces(spark, outDir).drop("batch"), idCol, shardCols)

  private def emptyState(spark: SparkSession, like: DataFrame,
                         shardCols: Seq[String]): DataFrame =
    like.select((shardCols.map(col) :+
      lit(0L).as("base_tokens")): _*).limit(0)
}
