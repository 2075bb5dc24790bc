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
}
