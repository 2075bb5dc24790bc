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
    docs.select(explode(array_distinct(TextFns.words(col(textCol))))
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
    val tf = docs.select(col(idCol), explode(TextFns.words(col(textCol)))
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
}
