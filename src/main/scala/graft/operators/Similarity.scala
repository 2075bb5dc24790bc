package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two strategies:
  *  - `bruteForceTopK`: exact — broadcast the (small) query set against the full
  *    corpus; one pass, no corpus shuffle. The baseline and the verifier.
  *  - `lshTopK`: scale path — corpus and queries are bucketed by random-hyperplane
  *    signature; candidates are only scored within matching buckets (with
  *    multi-probe to recover neighbors across the hyperplane). At 100 TB the bucket
  *    join partitions by bucket id, so each executor scores a tiny slice.
  * Ranking uses cosine rounded to 1e-6 with id tie-breaks, so top-k sets are
  * deterministic under any partitioning.
  */
object Similarity {

  /** Exact top-k: for each row of `queries`, the k most-cosine-similar rows of
    * `corpus` (self excluded). `queries` must be small (it is broadcast). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("qn", VectorFns.normLong(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        VectorFns.quantize(col(vecCol)).as("cv"))
      .withColumn("cn", VectorFns.normLong(col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFns.cosineFromQuantized(
        col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF (inverted-file) top-k — the classic ANN scale path: the corpus is
    * partitioned into `nCentroids` Voronoi cells around deterministically-sampled
    * centroid vectors; a query scores only the cells of its `nProbe` nearest
    * centroids. At 100 TB the cell assignment is one broadcast pass over the corpus
    * (written once, reused across queries), and each query touches
    * ~nProbe/nCentroids of the data instead of all of it.
    *
    * Centroid selection is id-hash ordered (deterministic, no k-means iterations) —
    * a trained quantizer can replace `pickCentroids` without changing the plan
    * shape. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val prepped = corpus
      .repartition(corpus.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("neighbor_id"),
        VectorFns.quantize(col(vecCol)).as("cv"))
      .withColumn("cn", VectorFns.normLong(col("cv")))
    val centroids = prepped
      .orderBy(xxhash64(col("neighbor_id")), col("neighbor_id")).limit(nCentroids)
      .select(col("neighbor_id").as("centroid_id"), col("cv").as("centv"),
        col("cn").as("centn"))
    // All centroids packed into ONE broadcast row: cell assignment becomes a
    // map-side argmax over the in-row array — no crossJoin row amplification, no
    // window, no Exchange of the corpus. (The old plan crossJoined corpus ×
    // nCentroids then ranked with a window partitioned by neighbor_id — a shuffle
    // of a 16×-amplified corpus, fatal at 100 TB.)
    val centroidArr = centroids
      .agg(collect_list(struct(col("centroid_id"), col("centv"), col("centn")))
        .as("cents"))
    // argmax by (cosine rounded 1e-6 desc, centroid_id asc) — identical tie-break
    // semantics to the previous window ordering.
    def nearestCells(v: Column, n: Column, take: Int): Column = slice(
      array_sort(transform(col("cents"), c => struct(
        (-round(VectorFns.cosineFromQuantized(v, c("centv"), n, c("centn")), 6))
          .as("negcos"),
        c("centroid_id").as("cid")))),
      1, take)
    val cells = prepped.crossJoin(broadcast(centroidArr))
      .withColumn("cell", nearestCells(col("cv"), col("cn"), 1)(0)("cid"))
      .select(col("neighbor_id"), col("cv"), col("cn"), col("cell"))
    // each query probes its nProbe nearest cells — same map-side array argmax
    val q = queries.select(col(idCol).as("query_id"),
        VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("qn", VectorFns.normLong(col("qv")))
    val probes = q.crossJoin(broadcast(centroidArr))
      .withColumn("cell",
        explode(nearestCells(col("qv"), col("qn"), nProbe)("cid")))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    // score only inside probed cells
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFns.cosineFromQuantized(
        col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** LSH-bucketed top-k: candidates limited to rows whose hyperplane signature
    * matches the query's (exact bucket only; callers trade recall for cost via
    * `nPlanes`). Same deterministic ranking as brute force. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFns.hyperplaneBucket(col(vecCol), nPlanes).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorFns.hyperplaneBucket(col(vecCol), nPlanes).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
