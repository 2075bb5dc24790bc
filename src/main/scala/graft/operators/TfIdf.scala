package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level token statistics: document frequency and TF-IDF weighting —
  * the vocabulary-construction / keyword-extraction primitive of a text
  * pipeline (and the classic "explode then aggregate" shape, kept narrow).
  *
  * Scale: the explode emits one row per DISTINCT token per document (not per
  * occurrence — `array_distinct` runs in-row first), and the aggregate is a
  * map-side-combinable count. IDF joins back via broadcast only above a
  * document-frequency floor (the long tail of hapax tokens is filtered BEFORE
  * the join, so the broadcast is vocabulary-sized, not corpus-sized). */
object TfIdf {

  /** (token, df): number of documents containing each token. */
  def documentFrequency(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    // few-file guard (r10): the in-row tokenize+distinct must not serialize
    Dedup.ensureParallel(docs)
      .select(explode(array_distinct(TextFns.words(col(textCol))))
        .as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))

  /** Per-document top-`k` tokens by TF-IDF (tf · ln(nDocs / df)), keyword
    * extraction. Tokens below `minDf` documents are dropped before the
    * broadcast join. The score is an exact integer (tf · round(idf·1e6)) and
    * equal scores tie-break on the token's FNV-1a 64-bit rolling hash — fully
    * deterministic under any partitioning (the heap aggregate ranks on long
    * keys), and reproducible in plain SQL (the q67 oracle re-derives the same
    * (score desc, fnv asc) total order byte-for-byte). */
  def topTfIdf(docs: DataFrame, idCol: String, textCol: String, k: Int,
               minDf: Long = 2L): DataFrame = {
    val n = docs.count()
    val idf = documentFrequency(docs, idCol, textCol)
      .filter(col("df") >= minDf)
      .select(col("token"),
        round(log(lit(n.toDouble) / col("df")) * 1e6).cast("long")
          .as("idf_scaled"))
    val tf = Dedup.ensureParallel(docs)
      .select(col(idCol), explode(TextFns.words(col(textCol)))
        .as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf.join(broadcast(idf), "token")
      .withColumn("score_scaled", col("tf") * col("idf_scaled"))
    graft.ops.TopK.topKPerGroup(scored, Seq(idCol),
      col("score_scaled"), graft.functions.RollingHash64(col("token")),
      Seq(col("token"), col("score_scaled").as("score")), k)
      .select(col(idCol), col("rn"), col("token"), col("score"))
  }

  /** Top-`v` vocabulary by total occurrence count (ties: token asc — a total
    * order, so the vocab is identical under any partitioning and in plain
    * SQL). One map-combinable count aggregate + a `TakeOrderedAndProject`
    * (per-partition heap of v rows, driver merges v·partitions — never a
    * global sort): the vocabulary-induction step before tokenizer training,
    * and the denominator of any coverage analysis. */
  def vocabulary(docs: DataFrame, textCol: String, v: Int): DataFrame =
    Dedup.ensureParallel(docs)
      .select(explode(TextFns.words(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("token"))
      .limit(v)

  /** Per-document out-of-vocabulary rate against a vocab frame: token
    * OCCURRENCES not covered, total occurrences, and the exact scaled rate
    * (`n_oov·10⁶ div n_tokens` — integer arithmetic, no float drift). The
    * vocab broadcasts (it is vocabulary-sized by construction); the only
    * shuffle is the per-doc count aggregate. Documents with zero tokens have
    * no coverage to measure and drop out (the explode emits nothing). */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame): DataFrame =
    Dedup.ensureParallel(docs)
      .select(col(idCol), explode(TextFns.words(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"), lit(1).as("__in"))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate_e6",
        graft.ops.Quantiles.div(col("n_oov") * lit(1000000L), col("n_tokens")))
}
