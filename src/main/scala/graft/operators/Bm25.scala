package graft.operators

import graft.functions.TextFns
import graft.ops.Quantiles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** BM25 ranked retrieval (Robertson–Spärck Jones / Okapi, the Lucene-default
  * scoring): given a corpus and a small table of queries, the top-k documents
  * per query. In a training-data pipeline this is the RETRIEVAL primitive —
  * decontamination-by-retrieval (pull the corpus docs closest to an eval
  * benchmark, then audit/scrub), targeted curation (mine docs near a seed
  * set), and the sparse half of any hybrid (BM25 + ANN) search stack; the
  * engine's dense half is `Similarity`.
  *
  * Scoring (Lucene's BM25, k1 = k1E3/1000, b = bE3/1000):
  *   idf(t)  = ln((N − df + 0.5)/(df + 0.5) + 1)              [always > 0]
  *   s(q,d)  = Σ_{t ∈ q∩d} idf·tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *
  * Cross-engine determinism: every factor is a scaled integer — idf_e6 =
  * round(idf·1e6) (one IEEE ln+round, identical in DuckDB); the length norm
  * norm_e6 = (1000−bE3)·1000 + ⌊bE3·dl·10⁶ / avgdl_e3⌋ with avgdl_e3 =
  * ⌊1000·Σdl / N⌋; the per-term score term_e6 = ⌊idf_e6·tf·(k1E3+1000) /
  * (1000·tf + ⌊k1E3·norm_e6/10⁶⌋)⌋. Long sums are associative, so scores are
  * bit-identical under any partitioning — and re-derivable in plain SQL
  * (q134). The quantization error is ~1e-6 relative — irrelevant to ranking,
  * decisive for reproducibility.
  *
  * Scale: the query table is BROADCAST twice (its distinct terms restrict
  * both the df aggregate's output and the tf frame before anything heavy);
  * the only corpus-sized shuffles are the tf aggregate and the per-doc
  * length join. The tf frame persists once and feeds tf/dl/df. Nothing
  * output-side exceeds |queries|·k rows — the TopK heap aggregate never
  * materializes a full ranking. */
object Bm25 {

  /** Top-`k` docs per query by BM25. Returns (qIdCol, rn, idCol, score_e6,
    * n_terms) — rn is 1-based rank by (score desc, doc id asc), n_terms the
    * number of query terms the doc matched. Queries with no matching doc
    * emit nothing. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qIdCol: String, qTextCol: String,
           k: Int, k1E3: Long = 1200L, bE3: Long = 750L,
           minDf: Long = 1L, maxHits: Long = 0L): DataFrame = {
    require(k >= 1 && k1E3 >= 0 && bE3 >= 0 && bE3 <= 1000,
      s"need k >= 1, k1E3 >= 0, bE3 in [0,1000], got $k/$k1E3/$bE3")
    val tf = Dedup.ensureParallel(docs)
      .select(col(idCol), explode(TextFns.words(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val nDocs = docs.count()
    val totTokens = dl.agg(coalesce(sum(col("dl")), lit(0L))).first().getLong(0)
    require(totTokens > 0L, "BM25 over an empty corpus")
    val avgdlE3 = 1000L * totTokens / nDocs
    val qTerms = queries.select(col(qIdCol),
      explode(array_distinct(TextFns.words(col(qTextCol)))).as("token"))
    val qTok = qTerms.select(col("token")).distinct()
    // df over the full corpus, but only for the query's terms: the broadcast
    // semi-restriction keeps the aggregate's OUTPUT query-sized (the shuffle
    // input is the tf frame either way — that aggregate is the index build)
    val dfq = tf.join(broadcast(qTok), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .persist(StorageLevel.MEMORY_AND_DISK) // query-vocabulary-sized
    val idf = dfq.select(col("token"),
      round(log((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0)) * 1e6).cast("long").as("idf_e6"))
    // hit-volume budget (the pair-budget discipline applied to retrieval):
    // the scoring join emits EXACTLY Σ_{(q,t∈q)} df(t) rows — a corpus
    // whose query terms are stopword-frequent (every term in most docs)
    // goes output-quadratic by construction. One query-sized agg prices it
    // before the join materializes; refuse loudly, never ENOSPC.
    if (maxHits > 0L) {
      val est = qTerms.join(broadcast(dfq), "token")
        .agg(coalesce(sum(col("df")), lit(0L))).first().getLong(0)
      require(est <= maxHits,
        s"bm25TopK: the per-term document frequencies bound the scoring " +
          s"join at $est hit rows, over the maxHits budget of $maxHits — " +
          s"refusing before any join work. Raise maxHits, raise minDf " +
          s"(stopword-frequent query terms carry ~zero idf but pay full " +
          s"scan cost), or batch the query set.")
    }
    val normed = dl.select(col(idCol),
      (lit((1000L - bE3) * 1000L) +
        Quantiles.div(lit(bE3 * 1000000L) * col("dl"), lit(avgdlE3)))
        .as("norm_e6"))
    val hits = tf.join(broadcast(qTerms), "token")
      .join(broadcast(idf), "token")
      .join(normed, idCol)
      .select(col(qIdCol), col(idCol),
        Quantiles.div(col("idf_e6") * col("tf") * lit(k1E3 + 1000L),
          lit(1000L) * col("tf") +
            Quantiles.div(lit(k1E3) * col("norm_e6"), lit(1000000L)))
          .as("term_e6"))
    val scores = hits.groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("term_e6")).as("score_e6"), count(lit(1)).as("n_terms"))
    graft.ops.TopK.topKPerGroup(scores, Seq(qIdCol), col("score_e6"),
      col(idCol), Seq(col(idCol), col("score_e6"), col("n_terms")), k)
      .select(col(qIdCol), col("rn"), col(idCol), col("score_e6"),
        col("n_terms"))
  }
}
