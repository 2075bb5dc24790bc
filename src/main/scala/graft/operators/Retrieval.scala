package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — the one piece of the q139/q141
  * hybrid rows that was inlined twice. Reciprocal Rank Fusion (Cormack &
  * Clarke 2009): fused(q, d) = Σ_lists 1/(kRrf + rank_list(q, d)), with a
  * doc absent from a list contributing 0 from it.
  *
  * Scale shape: both inputs are k-bounded PER QUERY (they come out of a
  * top-k), so the full-outer join on (query, doc) is hit-sized — never
  * corpus-sized — and the final per-query top-k is the heap aggregate
  * (map-side partials), not a window. Scores carry as e6-scaled integers
  * (exact, associative — the engine's oracle convention; DuckDB re-derives
  * them with the same integer division). */
object Retrieval {

  /** Fuse two ranked lists. Each input's FIRST THREE columns are read as
    * (query id, doc id, rank) — rank 1-based, castable to long. Returns
    * (q_id, rn, doc_id, rrf_e6) with rn the fused 1-based rank, ties on
    * rrf_e6 broken by doc id asc (the deterministic total order every
    * ranking in this engine carries). */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int,
              kRrf: Long = 60L): DataFrame = {
    def norm(df: DataFrame, rcol: String): DataFrame = {
      val c = df.columns
      df.select(col(c(0)).as("q_id"), col(c(1)).as("doc_id"),
        col(c(2)).cast("long").as(rcol))
    }
    val fused = norm(sparse, "r_s")
      .join(norm(dense, "r_d"), Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        (coalesce(graft.ops.Quantiles.div(lit(1000000L),
            lit(kRrf) + col("r_s")), lit(0L)) +
          coalesce(graft.ops.Quantiles.div(lit(1000000L),
            lit(kRrf) + col("r_d")), lit(0L))).as("rrf_e6"))
    graft.ops.TopK.topKPerGroup(fused, Seq("q_id"), col("rrf_e6"),
      col("doc_id"), Seq(col("doc_id"), col("rrf_e6")), k)
      .select(col("q_id"), col("rn"), col("doc_id"), col("rrf_e6"))
  }

  /** Retrieval-quality evaluation (r17) — the QA gate a training-data user
    * runs on a retrieval product (the published training pairs, a tuned
    * BM25 dial, a partial-probe ANN serve) before trusting it:
    * recall@k / MRR@k / nDCG@k of a ranked-hits frame against a gold
    * relevance frame, per query.
    *
    * Inputs follow [[rrfFuse]]'s convention: `hits`' first three columns
    * are (query id, doc id, rank — 1-based, castable to long); `gold`'s
    * first two are (query id, relevant doc id), binary relevance. Hits
    * beyond rank `k` are ignored; queries are taken from GOLD (a query
    * with no hits scores 0 — un-judged hits rows contribute nothing, and
    * queries the retriever never saw still count against it).
    *
    * All metrics are e6-scaled integers under the engine's floor-division
    * convention (`div`), so a SQL oracle re-derives every value exactly:
    *  - recall_e6 = 1e6·|hits∩gold| div n_gold
    *  - mrr_e6    = 1e6 div (first relevant rank), 0 if none
    *  - ndcg_e6   = 1e6·dcg_e6 div idcg_e6, where dcg_e6 sums the
    *    PRE-QUANTIZED discount table disc(r) = round(1e6/log2(r+1)) over
    *    relevant ranks and idcg_e6 is its prefix sum at min(k, n_gold).
    *    Quantizing each TERM (not the sum) keeps the arithmetic integral
    *    — float summation order can never drift across engines, and the
    *    discount constants are plan literals both sides compute once.
    *
    * Scale shape: both joins are hit/gold-sized (k-bounded per query),
    * never corpus-sized; the per-query rollup is one hash aggregate. */
  def evaluate(hits: DataFrame, gold: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    val disc = discountsE6(k)
    val idcgPrefix = disc.scanLeft(0L)(_ + _).tail
    val h = {
      val c = hits.columns
      hits.select(col(c(0)).as("q_id"), col(c(1)).as("doc_id"),
        col(c(2)).cast("long").as("__rank"))
    }.filter(col("__rank") <= k)
    val g = {
      val c = gold.columns
      gold.select(col(c(0)).as("q_id"), col(c(1)).as("doc_id"))
    }.distinct() // a duplicated gold row must not inflate n_gold
    val discArr = typedLit(disc.toSeq)
    val relAgg = h.join(g, Seq("q_id", "doc_id"), "left_semi")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("__hits"), min(col("__rank")).as("__minr"),
        sum(element_at(discArr, col("__rank").cast("int"))).as("__dcg"))
    val prefixArr = typedLit(idcgPrefix.toSeq)
    g.groupBy(col("q_id")).agg(count(lit(1)).as("n_gold"))
      .join(relAgg, Seq("q_id"), "left")
      .select(col("q_id"), col("n_gold"),
        coalesce(col("__hits"), lit(0L)).as("hits_at_k"),
        graft.ops.Quantiles.div(
          lit(1000000L) * coalesce(col("__hits"), lit(0L)), col("n_gold"))
          .as("recall_e6"),
        coalesce(graft.ops.Quantiles.div(lit(1000000L), col("__minr")),
          lit(0L)).as("mrr_e6"),
        graft.ops.Quantiles.div(
          lit(1000000L) * coalesce(col("__dcg"), lit(0L)),
          element_at(prefixArr,
            least(col("n_gold"), lit(k.toLong)).cast("int")))
          .as("ndcg_e6"))
  }

  /** [[evaluate]] rolled up to ONE summary row — the dashboard number:
    * macro-averaged (each query weighs equally) recall/MRR/nDCG, still in
    * exact e6 integers (sum of per-query e6 metrics div query count). */
  def evaluateSummary(hits: DataFrame, gold: DataFrame, k: Int): DataFrame =
    evaluate(hits, gold, k).agg(
      count(lit(1)).as("n_queries"),
      graft.ops.Quantiles.div(sum(col("recall_e6")), count(lit(1)))
        .as("recall_e6"),
      graft.ops.Quantiles.div(sum(col("mrr_e6")), count(lit(1)))
        .as("mrr_e6"),
      graft.ops.Quantiles.div(sum(col("ndcg_e6")), count(lit(1)))
        .as("ndcg_e6"))

  /** The quantized DCG discount table: disc(r) = round(1e6 / log2(r+1))
    * for r = 1..k — computed ONCE driver-side, shared verbatim with any
    * SQL oracle (the constants ARE the contract; no engine re-derives a
    * log at eval time). */
  def discountsE6(k: Int): Array[Long] =
    (1 to k).map(r =>
      math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))).toArray
}
