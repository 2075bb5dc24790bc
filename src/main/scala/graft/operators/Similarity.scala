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

  /** The ANN ranking step shared by every strategy: top-k per query_id by
    * (cosine rounded 1e-6 DESC, neighbor_id ASC), produced by the bounded-heap
    * `TopKAgg` instead of a ranking window. The window form fully SORTS every
    * query's candidate set (the whole corpus, for brute force) after shuffling
    * it; the heap keeps k entries per query with map-side partials, so the
    * shuffle carries at most k rows per (query, mapper). Order is identical:
    * `round(cosine, 6)` is exactly an integer at the 1e6 scale, so the long
    * key (re-rounded once to erase the float multiply's 1e-10 error — and to
    * normalize a rounded -0.0) sorts precisely like the rounded double, and
    * neighbor_id is a unique tie-break. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    graft.ops.TopK.topKPerGroup(scored, Seq("query_id"),
      round(round(col("cosine"), 6) * 1e6), col("neighbor_id"),
      Seq(col("neighbor_id"), col("cosine")), k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rn").as("rank"))

  /** Exact top-k: for each row of `queries`, the k most-cosine-similar rows of
    * `corpus` (self excluded). `queries` must be small (it is broadcast). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("qn", VectorFns.normLong(col("qv")))
    // few-file guard BEFORE the quantize/dot kernels: the corpus is the
    // STREAM side of the broadcast join, so without it every per-pair dot
    // runs at file-count parallelism (the r10 sweep missed the vector family)
    val c = Dedup.ensureParallel(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("neighbor_id"),
        VectorFns.quantize(col(vecCol)).as("cv"))
      .withColumn("cn", VectorFns.normLong(col("cv")))
    rankTopK(c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFns.cosineFromQuantized(
        col("qv"), col("cv"), col("qn"), col("cn"))), k)
  }

  /** A built inverted-file index: `cells` = the corpus with quantized vectors,
    * norms, and Voronoi cell assignment (corpus-sized — write to parquet and
    * reuse across query batches); `centroids` = the tiny (centroid_id, centv,
    * centn) frame the probe side needs. Both are plain-typed frames, so
    * `save`/`load` round-trip through parquet — build once, serve many. */
  final case class IvfIndex(cells: DataFrame, centroids: DataFrame) {
    def save(dir: String): Unit = {
      // cells partitioned BY CELL: a probe of nProbe cells prunes to nProbe
      // directories at the file index — the ANN equivalent of date-partitioned
      // fact tables
      cells.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
      centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    }
  }

  object IvfIndex {
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
      IvfIndex(spark.read.parquet(s"$dir/cells"),
        spark.read.parquet(s"$dir/centroids"))
  }

  /** Ids of the nearest `take` centroids of vector (v, n) as an in-row argmax
    * over the packed centroid array column `cents` — argmax by (cosine rounded
    * 1e-6 desc, centroid_id asc). Map-side: no window, no shuffle, no row
    * amplification. Backed by the native `NearestCellsExpr` compiled loop —
    * cell assignment runs once per corpus vector at index build, and the
    * column form (`nearestCellIdsCols`, the spec-pinned reference) evaluates
    * its transform/sort lambdas interpreted. */
  private[graft] def nearestCellIds(cents: Column, v: Column, n: Column,
                                    take: Int): Column =
    graft.functions.NearestCellsExpr(cents, v, n, take)

  /** Reference column-expression implementation of `nearestCellIds`. */
  private[graft] def nearestCellIdsCols(cents: Column, v: Column, n: Column,
                                        take: Int): Column = slice(
    array_sort(transform(cents, c => struct(
      (-round(VectorFns.cosineFromQuantized(v, c("centv"), n, c("centn")), 6))
        .as("negcos"),
      c("centroid_id").as("cid")))),
    1, take)("cid")

  /** Build the IVF index: pick `nCentroids` deterministic (id-hash ordered)
    * centroids, then assign every corpus vector to its nearest centroid's cell in
    * ONE broadcast pass — all centroids packed into a single broadcast row, cell
    * assignment an in-row array argmax. (A crossJoin+window formulation shuffles
    * an nCentroids-amplified corpus — fatal at 100 TB.) A trained k-means
    * quantizer can replace the centroid pick without changing any plan shape. */
  def buildIvfIndex(corpus: DataFrame, nCentroids: Int = 16,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    refineIters: Int = 0): IvfIndex = {
    val prepped = Dedup.ensureParallel(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("neighbor_id"),
        VectorFns.quantize(col(vecCol)).as("cv"))
      .withColumn("cn", VectorFns.normLong(col("cv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds = prepped
      .orderBy(xxhash64(col("neighbor_id")), col("neighbor_id")).limit(nCentroids)
      .select(col("neighbor_id").as("centroid_id"), col("cv").as("centv"),
        col("cn").as("centn"))
    // refineIters > 0: Lloyd-refine the hash-picked seeds before the final
    // assignment — tighter cells, fewer probes for the same recall
    val centroids = if (refineIters > 0) lloyd(prepped, seeds, refineIters)
      else seeds
    val cells = prepped.crossJoin(broadcast(packed(centroids)))
      .withColumn("cell",
        nearestCellIds(col("cents"), col("cv"), col("cn"), 1)(0))
      .select(col("neighbor_id"), col("cv"), col("cn"), col("cell"))
    IvfIndex(cells, centroids)
  }

  /** Pack a centroid frame into the single broadcast row the in-row argmax
    * probes. */
  private def packed(centroids: DataFrame): DataFrame =
    centroids.agg(collect_list(
      struct(col("centroid_id"), col("centv"), col("centn"))).as("cents"))

  /** Deterministic k-means (Lloyd) over quantized embeddings — the trained
    * quantizer `buildIvfIndex`'s doc promises. No RNG anywhere:
    *  - seeds = the first `nCentroids` corpus vectors in KNUTH-hash id order
    *    (SQL-reproducible, unlike the engine-hash pick of the untrained build);
    *  - assignment = the same broadcast packed-centroid in-row argmax as the
    *    IVF build (rounded-cosine desc, centroid id asc) — no row amplification;
    *  - accumulation = native `VectorSumAgg`: one long[] per cell, map-side
    *    partials, NO posexplode of the corpus by its dimensionality — exact
    *    integer sums, so centroids are bit-identical under any partitioning;
    *  - new centroid = integer sums divided once at the end, re-quantized to
    *    the 1e6 scale; cells that captured no vectors keep their centroid.
    * Returns (centroid_id, centv, centn) — drop-in for `IvfIndex.centroids`. */
  def kmeansCentroids(corpus: DataFrame, nCentroids: Int = 16, iters: Int = 2,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    graft.functions.VectorSumAgg.register(corpus.sparkSession)
    val prepped = Dedup.ensureParallel(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("neighbor_id"),
        VectorFns.quantize(col(vecCol)).as("cv"))
      .withColumn("cn", VectorFns.normLong(col("cv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds = prepped
      .orderBy(DataMix.knuthHash(col("neighbor_id")),
        col("neighbor_id"))
      .limit(nCentroids)
      .select(col("neighbor_id").as("centroid_id"), col("cv").as("centv"),
        col("cn").as("centn"))
    val out = lloyd(prepped, seeds, iters)
    prepped.unpersist(blocking = false)
    out
  }

  /** The Lloyd refinement loop shared by `kmeansCentroids` and
    * `buildIvfIndex(refineIters > 0)`. `prepped` must be (neighbor_id, cv, cn)
    * and SHOULD be persisted by the caller (each iteration scans it once). */
  private def lloyd(prepped: DataFrame, seeds: DataFrame,
                    iters: Int): DataFrame = {
    graft.functions.VectorSumAgg.register(prepped.sparkSession)
    var centroids = seeds
    for (_ <- 0 until iters) {
      val cells = prepped.crossJoin(broadcast(packed(centroids)))
        .withColumn("cell",
          nearestCellIds(col("cents"), col("cv"), col("cn"), 1)(0))
      val sums = cells.groupBy(col("cell"))
        .agg(graft.functions.VectorSumAgg(col("cv")).as("sv"),
          count(lit(1)).as("n"))
      val fresh = sums.select(col("cell").as("centroid_id"),
          transform(col("sv"),
            x => round(x.cast("double") / col("n")).cast("long")).as("centv"))
        .withColumn("centn", VectorFns.normLong(col("centv")))
      // centroid frames are tiny; checkpoint truncates the per-iter lineage
      centroids = centroids.as("old")
        .join(fresh.as("new"), Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("new.centv"), col("old.centv")).as("centv"),
          coalesce(col("new.centn"), col("old.centn")).as("centn"))
        .localCheckpoint()
    }
    centroids
  }

  /** Nearest-cell assignment as a COLUMN-PRESERVING transform: every input
    * column plus `cellCol` = the centroid id with the highest cosine to the
    * row's vector ((rounded cosine desc, centroid_id asc) — q64's total
    * order, so assignment is deterministic and, under a seed-pick centroid
    * frame, SQL-reproducible). One packed-centroid broadcast and an in-row
    * argmax: no shuffle, no join — this is the coarse quantizer exposed as a
    * BLOCKING FUNCTION for downstream per-cell work (`Dedup.semanticDedup`
    * bounds its candidate pairs to cells with it). */
  def assignCells(df: DataFrame, centroids: DataFrame,
                  vecCol: String = "embedding",
                  cellCol: String = "cell"): DataFrame = {
    val keep = df.columns
    Dedup.ensureParallel(df).crossJoin(broadcast(packed(centroids)))
      .withColumn("__acv", VectorFns.quantize(col(vecCol)))
      .withColumn(cellCol, nearestCellIds(col("cents"), col("__acv"),
        VectorFns.normLong(col("__acv")), 1)(0))
      .select(keep.map(col) :+ col(cellCol): _*)
  }

  /** First-iteration k-means assignment report — the oracle-facing scalar
    * projection of `kmeansCentroids`' inner loop: per cell, the member count
    * and the L1 norm of the exact per-dimension integer sums (a single BIGINT
    * that moves if ANY component of ANY assignment moves). */
  def kmeansAssignReport(corpus: DataFrame, nCentroids: Int = 16,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    graft.functions.VectorSumAgg.register(corpus.sparkSession)
    val prepped = Dedup.ensureParallel(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("neighbor_id"),
        VectorFns.quantize(col(vecCol)).as("cv"))
      .withColumn("cn", VectorFns.normLong(col("cv")))
    val seeds = prepped
      .orderBy(DataMix.knuthHash(col("neighbor_id")),
        col("neighbor_id"))
      .limit(nCentroids)
      .select(col("neighbor_id").as("centroid_id"), col("cv").as("centv"),
        col("cn").as("centn"))
    prepped.crossJoin(broadcast(packed(seeds)))
      .withColumn("cell",
        nearestCellIds(col("cents"), col("cv"), col("cn"), 1)(0))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
        graft.functions.VectorSumAgg(col("cv")).as("sv"))
      .select(col("cell"), col("n_members"),
        aggregate(col("sv"), lit(0L), (acc, x) => acc + abs(x)).as("l1_scaled"))
  }

  /** Serve a query batch from a built index: each query probes its `nProbe`
    * nearest cells (same in-row argmax), scores only inside those cells, ranks
    * deterministically. The query side is broadcast — the corpus-side cells
    * frame is only ever probed, never shuffled. */
  def ivfSearch(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int = 4,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val centroidArr = index.centroids
      .agg(collect_list(struct(col("centroid_id"), col("centv"), col("centn")))
        .as("cents"))
    val q = queries.select(col(idCol).as("query_id"),
        VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("qn", VectorFns.normLong(col("qv")))
    val probes = q.crossJoin(broadcast(centroidArr))
      .withColumn("cell",
        explode(nearestCellIds(col("cents"), col("qv"), col("qn"), nProbe)))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    rankTopK(index.cells.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFns.cosineFromQuantized(
        col("qv"), col("cv"), col("qn"), col("cn"))), k)
  }

  /** One-shot IVF top-k (build + search). For repeated query batches build the
    * index once (`buildIvfIndex` + `IvfIndex.save`) and `ivfSearch` against it. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfSearch(buildIvfIndex(corpus, nCentroids, idCol, vecCol), queries, k,
      nProbe, idCol, vecCol)

  // ---------------------------------------------------------------------
  // Product quantization (Jégou et al., "Product Quantization for Nearest
  // Neighbor Search", IEEE TPAMI 2011) — the memory-compression half of a
  // 100 TB ANN store: each vector is reduced to `m` small codes (one per
  // contiguous dimension subspace), and queries score encoded vectors from
  // per-subspace lookup tables (ADC) without touching the original floats.
  // Deterministic throughout: quantized-integer arithmetic, Knuth-hash seed
  // pick, L2 assignment with (distance, centroid_id) tie-breaks.
  // ---------------------------------------------------------------------

  /** Nearest codebook entry by L2 over pre-quantized subvectors, as an in-row
    * argmin over a packed (centroid_id, centv, centn2) array: minimizing
    * |x−c|² ≡ minimizing centn2 − 2·dot(x,c) (the |x|² term is constant per
    * row). Exact integer keys, centroid_id tie-break — PQ assignment uses L2
    * (reconstruction error), NOT the cosine argmax the IVF cells use. */
  private def nearestCodeL2(cents: Column, v: Column): Column = slice(
    array_sort(transform(cents, c => struct(
      (c("centn2") - lit(2L) * VectorFns.dotLong(v, c("centv"))).as("d2"),
      c("centroid_id").as("cid")))),
    1, 1)(0)("cid")

  /** Subspace slicing: `m` contiguous ranges over `dims` dimensions; the last
    * subspace absorbs the remainder. Returns (offset, length) pairs (1-based
    * offsets for `slice`). */
  private def subRanges(dims: Int, m: Int): Seq[(Int, Int)] = {
    require(m >= 1 && dims >= m, s"need at least m=$m dims, got $dims")
    val base = dims / m
    (0 until m).map(s =>
      (s * base + 1, if (s == m - 1) dims - s * base else base))
  }

  /** Train PQ codebooks: per subspace, `ksub` centroids with dense ids
    * 0..ksub-1 (seeded by the same deterministic Knuth-hash order as
    * `kmeansCentroids`, then `iters` rounds of L2 Lloyd — `iters = 0` keeps
    * the seed codebook, the SQL-oracle-reproducible configuration). Exact
    * integer accumulation via `VectorSumAgg`; empty cells keep their
    * centroid. Train on a sample at corpus scale — the codebook is
    * vocabulary-sized, the corpus is not. Returns (subspace, centroid_id,
    * centv, centn2 = exact squared norm). */
  def pqTrain(corpus: DataFrame, m: Int = 4, ksub: Int = 16, iters: Int = 2,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame =
    pqTrainQuantized(
      Dedup.ensureParallel(corpus.select(col(idCol), col(vecCol)))
        .select(col(idCol).as("__id"), VectorFns.quantize(col(vecCol)).as("cv")),
      m, ksub, iters)

  /** `pqTrain` over an ALREADY-quantized (__id, cv) frame — the residual
    * index trains its codebooks on exact integer residuals, which must not be
    * re-quantized. */
  private def pqTrainQuantized(input: DataFrame, m: Int, ksub: Int,
                               iters: Int): DataFrame = {
    graft.functions.VectorSumAgg.register(input.sparkSession)
    val prepped = input
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dims = prepped.select(size(col("cv"))).first().getInt(0)
    val books = subRanges(dims, m).zipWithIndex.map { case ((off, len), s) =>
      val sub = prepped.select(col("__id"), slice(col("cv"), off, len).as("cv"))
      // ksub rows: the single-partition window is bounded by the codebook size
      val seeds = sub
        .orderBy(DataMix.knuthHash(col("__id")),
          col("__id"))
        .limit(ksub)
        .select((row_number().over(Window.orderBy(
            DataMix.knuthHash(col("__id")),
            col("__id"))) - 1).as("centroid_id"),
          col("cv").as("centv"))
        .withColumn("centn2", VectorFns.dotLong(col("centv"), col("centv")))
      var cents = seeds.localCheckpoint()
      for (_ <- 0 until iters) {
        val packed = broadcast(cents.agg(collect_list(
          struct(col("centroid_id"), col("centv"), col("centn2"))).as("cents")))
        val sums = sub.crossJoin(packed)
          .withColumn("code", nearestCodeL2(col("cents"), col("cv")))
          .groupBy(col("code"))
          .agg(graft.functions.VectorSumAgg(col("cv")).as("sv"),
            count(lit(1)).as("n"))
        val fresh = sums.select(col("code").as("centroid_id"),
            transform(col("sv"),
              x => round(x.cast("double") / col("n")).cast("long")).as("centv"))
          .withColumn("centn2", VectorFns.dotLong(col("centv"), col("centv")))
        cents = cents.as("old")
          .join(fresh.as("new"), Seq("centroid_id"), "left")
          .select(col("centroid_id"),
            coalesce(col("new.centv"), col("old.centv")).as("centv"),
            coalesce(col("new.centn2"), col("old.centn2")).as("centn2"))
          .localCheckpoint()
      }
      cents.withColumn("subspace", lit(s))
        .select(col("subspace"), col("centroid_id"), col("centv"), col("centn2"))
    }
    val out = books.reduce(_ unionByName _).localCheckpoint()
    prepped.unpersist(blocking = false)
    out
  }

  /** One broadcastable row packing every subspace's codebook, positions
    * aligned: `bk(s)` is subspace s's centroid array sorted by centroid_id
    * (dense 0..ksub-1, so position == code). */
  private def packedBooks(books: DataFrame): DataFrame =
    books.groupBy(col("subspace"))
      .agg(sort_array(collect_list(
        struct(col("centroid_id"), col("centv"), col("centn2")))).as("cents"))
      .agg(sort_array(collect_list(struct(col("subspace"), col("cents"))))
        .as("__sb"))
      .select(transform(col("__sb"), e => e("cents")).as("bk"))

  /** Encode the corpus: per vector, per subspace, the L2-nearest codebook id —
    * `m` small ints instead of the float vector (for 64 dims × 4 bytes → 4
    * codes, a 16-64× memory reduction in the serving store). One broadcast
    * pass, no row amplification. Returns (neighbor_id, codes array<int>). */
  def pqEncode(corpus: DataFrame, books: DataFrame, m: Int = 4,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    // few-file guard: the encode argmin is a per-row kernel on the stream
    // side of the codebook broadcast — exchange before it, not after
    val q = Dedup.ensureParallel(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("neighbor_id"),
        VectorFns.quantize(col(vecCol)).as("cv"))
    encodeQuantized(q, books, m, keep = Nil)
  }

  /** `pqEncode` over an ALREADY-quantized frame (neighbor_id, cv, keep...) —
    * shared by `pqEncode` and the IVF+PQ build, which encodes straight off the
    * IVF cells frame so the corpus is quantized and scanned once, not twice. */
  private def encodeQuantized(q: DataFrame, books: DataFrame, m: Int,
                              keep: Seq[String]): DataFrame = {
    val dims = q.select(size(col("cv"))).first().getInt(0)
    val ranges = subRanges(dims, m)
    q.crossJoin(broadcast(packedBooks(books)))
      .select(col("neighbor_id") +:
        array(ranges.zipWithIndex.map { case ((off, len), s) =>
          nearestCodeL2(col("bk")(s), slice(col("cv"), off, len)).cast("int")
        }: _*).as("codes") +: keep.map(col): _*)
  }

  /** ADC (asymmetric distance computation) search: each query builds one
    * dot-product lookup table per subspace against the codebooks (ksub·m
    * integer dots — independent of corpus size), then every encoded vector is
    * scored by `m` table lookups: cosine(q, reconstruction(codes)) =
    * Σ_s dot(q_s, c_s) / (|q| · √Σ_s |c_s|²), exact integer numerators.
    * Approximate by construction (quantization error), deterministic given the
    * codebooks; rank ties break on neighbor_id like every ANN route here. The
    * query side is broadcast; the encoded corpus is never shuffled. */
  def pqSearch(books: DataFrame, encoded: DataFrame, queries: DataFrame,
               k: Int, m: Int = 4, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      VectorFns.quantize(col(vecCol)).as("qv"))
    val dims = q.select(size(col("qv"))).first().getInt(0)
    val tables = q.crossJoin(broadcast(packedBooks(books)))
      .select(col("query_id"),
        sqrt(VectorFns.dotLong(col("qv"), col("qv")).cast("double")).as("qn"),
        adcDotTables(subRanges(dims, m)).as("tabs"),
        adcNormTables(m).as("n2s"))
    rankTopK(adcScore(encoded.crossJoin(broadcast(tables)))
      .filter(col("query_id") =!= col("neighbor_id")), k)
  }

  /** The per-query ADC dot-product lookup tables, one array per subspace:
    * dot(query slice, centroid) for every codebook entry. Evaluated against a
    * `qv` column and a packed `bk` books column. (Two parallel primitive
    * arrays instead of one struct array: the analyzer strips aliases inside
    * higher-order-function lambdas in some projection shapes, so struct field
    * names are not a stable contract here — positions are.) */
  private def adcDotTables(ranges: Seq[(Int, Int)]): Column =
    array(ranges.zipWithIndex.map { case ((off, len), s) =>
      transform(col("bk")(s), c =>
        VectorFns.dotLong(slice(col("qv"), off, len), c("centv")))
    }: _*)

  /** The query-independent squared-norm halves of the ADC tables (Σ |c_s|²
    * per codebook entry), positions aligned with `adcDotTables`. */
  private def adcNormTables(m: Int): Column =
    array((0 until m).map(s => transform(col("bk")(s), c => c("centn2"))): _*)

  /** ADC scoring: m table lookups per encoded row — cosine(q,
    * reconstruction(codes)) = Σ_s dot(q_s, c_s) / (|q| · √Σ_s |c_s|²), exact
    * integer numerator. Expects `codes`, `tabs`, `n2s`, and `qn` columns. */
  private def adcScore(candidates: DataFrame): DataFrame = candidates
    .withColumn("cosine",
      aggregate(zip_with(col("codes"), col("tabs"),
          (code, tab) => element_at(tab, code + 1)),
        lit(0L), (acc, d) => acc + d).cast("double") /
      (col("qn") * sqrt(aggregate(zip_with(col("codes"), col("n2s"),
          (code, tab) => element_at(tab, code + 1)),
        lit(0L), (acc, n2) => acc + n2).cast("double"))))

  // ---------------------------------------------------------------------
  // IVF + PQ — the composed serving index (the FAISS IVFPQ shape): the
  // coarse quantizer routes each query to a handful of Voronoi cells, and
  // candidates inside those cells are scored from their PQ codes alone via
  // ADC lookup tables. At 100 TB neither half alone is the index: IVF
  // bounds WHAT is scored (nProbe cells, file-pruned when persisted), PQ
  // bounds what scoring COSTS (m table lookups per candidate, the float
  // vectors never leave the build stage).
  // ---------------------------------------------------------------------

  /** A built IVF+PQ serving index. `cells` = (neighbor_id, codes, cell) —
    * the PQ-compressed corpus keyed by coarse cell (the ONLY corpus-sized
    * frame, and it carries codes instead of vectors: 16-64× smaller);
    * `centroids` = the coarse quantizer; `books` = the PQ codebooks;
    * `residual` = whether codes encode cell RESIDUALS (cv − centroid, the
    * IVFADC form) or raw vectors. All plain-typed frames — `save`/`load`
    * round-trip through parquet, cells partitioned by cell so probes prune
    * directories at the file index. */
  final case class IvfPqIndex(cells: DataFrame, centroids: DataFrame,
                              books: DataFrame, residual: Boolean = false) {
    def save(dir: String): Unit = {
      cells.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
      centroids.write.mode("overwrite").parquet(s"$dir/centroids")
      books.write.mode("overwrite").parquet(s"$dir/books")
      val spark = cells.sparkSession
      import spark.implicits._
      Seq(residual).toDF("residual")
        .write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  object IvfPqIndex {
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): IvfPqIndex =
      IvfPqIndex(spark.read.parquet(s"$dir/cells"),
        spark.read.parquet(s"$dir/centroids"),
        spark.read.parquet(s"$dir/books"),
        spark.read.parquet(s"$dir/meta").first().getBoolean(0))
  }

  /** Build the composed index: one IVF build (quantize + cell-assign the
    * corpus), one PQ training pass, then the corpus is encoded STRAIGHT OFF
    * the IVF cells frame — quantized once, scanned once, never re-read from
    * the source. `refineIters`/`iters` Lloyd-train the coarse and product
    * quantizers respectively (0 = deterministic seed pick).
    *
    * `residual = true` builds the IVFADC form (Jégou et al. §IV): codebooks
    * train on and codes encode the exact integer residual cv − centroid(cell)
    * instead of the raw vector. When the coarse quantizer explains the
    * corpus' structure, residuals concentrate near zero and the same
    * (m, ksub) budget spends its resolution on what the cells missed —
    * better reconstruction at identical serving cost (spec-pinned on a
    * clustered corpus). CAVEAT (documented because it is measurable, not
    * hypothetical): on a near-uniform unit-sphere corpus |x − c|² =
    * 2 − 2cosθ exceeds |x|² whenever the best centroid cosine is under 0.5,
    * so residuals are LARGER than the vectors and the raw form wins —
    * `buildIvfPqIndexAuto` below measures the tradeoff on a sample instead of
    * asking the caller to know it. Shared codebook across cells (the standard
    * large-scale memory/training tradeoff). */
  def buildIvfPqIndex(corpus: DataFrame, nCentroids: Int = 16, m: Int = 4,
                      ksub: Int = 16, iters: Int = 2, refineIters: Int = 0,
                      residual: Boolean = false,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): IvfPqIndex = {
    val ivf = buildIvfIndex(corpus, nCentroids, idCol, vecCol, refineIters)
    pqOverIvf(ivf, m, ksub, iters, residual)
  }

  /** `buildIvfIndex` against CALLER-SUPPLIED coarse centroids (centroid_id,
    * centv, centn — e.g. `kmeansCentroids(iters = 0)`'s Knuth-ordered seed
    * pick, which a SQL oracle can re-derive; the default build's engine-hash
    * pick cannot). Assignment is the same one-broadcast in-row argmax; no
    * persist is needed because the cells frame is consumed once. */
  def buildIvfIndexFrom(corpus: DataFrame, centroids: DataFrame,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): IvfIndex = {
    val prepped = Dedup.ensureParallel(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("neighbor_id"),
        VectorFns.quantize(col(vecCol)).as("cv"))
      .withColumn("cn", VectorFns.normLong(col("cv")))
    val cells = prepped.crossJoin(broadcast(packed(centroids)))
      .withColumn("cell",
        nearestCellIds(col("cents"), col("cv"), col("cn"), 1)(0))
      .select(col("neighbor_id"), col("cv"), col("cn"), col("cell"))
    IvfIndex(cells, centroids)
  }

  /** The composed index over caller-supplied coarse centroids — the fully
    * SQL-derivable serving index (coarse cells, probe routing, PQ books and
    * ADC all reproducible by an external oracle when the centroids are, e.g.
    * q77's partial-probe row). */
  def buildIvfPqIndexFrom(corpus: DataFrame, centroids: DataFrame, m: Int = 4,
                          ksub: Int = 16, iters: Int = 2,
                          residual: Boolean = false,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): IvfPqIndex =
    pqOverIvf(buildIvfIndexFrom(corpus, centroids, idCol, vecCol),
      m, ksub, iters, residual)

  /** `buildIvfPqIndex` with the residual dial decided BY MEASUREMENT instead
    * of the documented per-corpus manual pick (`residual = ...` above): train
    * throwaway codebooks both ways on a deterministic Knuth-ordered sample of
    * the IVF cells and keep whichever reconstructs the sample with lower
    * exact integer squared error — the quantity PQ minimizes, so the probe
    * measures the real tradeoff (Jégou's IVFADC-vs-raw) rather than proxying
    * it. The probe costs two codebook trainings on `sampleN` rows —
    * vocabulary-sized work, independent of corpus scale; the real build then
    * trains once on the full cells frame in the winning mode. */
  def buildIvfPqIndexAuto(corpus: DataFrame, nCentroids: Int = 16, m: Int = 4,
                          ksub: Int = 16, iters: Int = 2, refineIters: Int = 0,
                          sampleN: Int = 2048,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): IvfPqIndex = {
    val ivf = buildIvfIndex(corpus, nCentroids, idCol, vecCol, refineIters)
    pqOverIvf(ivf, m, ksub, iters, pickResidual(ivf, m, ksub, iters, sampleN))
  }

  /** The auto dial's measurement, exposed for observability: on a
    * deterministic Knuth-ordered `sampleN`-row sample of the IVF cells, train
    * throwaway PQ codebooks on the raw subvectors and on the cell residuals
    * at the same (m, ksub, iters) budget, and compare exact integer squared
    * reconstruction error. Returns true iff residual encoding is strictly
    * better (ties keep the simpler raw form). Both samples are
    * localCheckpointed, so the probe adds one bounded TakeOrdered over the
    * cells frame and two vocabulary-sized trainings — nothing corpus-scale. */
  def pickResidual(ivf: IvfIndex, m: Int = 4, ksub: Int = 16, iters: Int = 2,
                   sampleN: Int = 2048): Boolean = {
    val sample = ivf.cells
      .orderBy(DataMix.knuthHash(col("neighbor_id")), col("neighbor_id"))
      .limit(sampleN)
      .select(col("neighbor_id"), col("cv"), col("cell"))
      .localCheckpoint()
    val resSample = sample
      .join(broadcast(ivf.centroids
        .select(col("centroid_id").as("cell"), col("centv"))), Seq("cell"))
      .select(col("neighbor_id"),
        zip_with(col("cv"), col("centv"), (x, c) => x - c).as("cv"))
      .localCheckpoint()
    def err2(s: DataFrame): Long = {
      val books = pqTrainQuantized(
        s.select(col("neighbor_id").as("__id"), col("cv")), m, ksub, iters)
      val dims = s.select(size(col("cv"))).first().getInt(0)
      s.crossJoin(broadcast(packedBooks(books)))
        .select(subRanges(dims, m).zipWithIndex.map { case ((off, len), sub) =>
          minRecon2(col("bk")(sub), slice(col("cv"), off, len))
        }.reduce(_ + _).as("e2"))
        .agg(sum(col("e2"))).first().getLong(0)
    }
    err2(resSample) < err2(sample.select(col("neighbor_id"), col("cv")))
  }

  /** Exact integer squared reconstruction error of one subvector against its
    * L2-nearest codebook entry: |v|² + min_c (|c|² − 2·v·c). */
  private def minRecon2(cents: Column, v: Column): Column =
    VectorFns.dotLong(v, v) + array_min(transform(cents, c =>
      c("centn2") - lit(2L) * VectorFns.dotLong(v, c("centv"))))

  /** Shared tail of the composed builds: train the product quantizer off the
    * IVF cells frame (raw vectors or cell residuals) and encode the corpus
    * straight off it — quantized once, scanned once, never re-read from the
    * source. */
  private def pqOverIvf(ivf: IvfIndex, m: Int, ksub: Int, iters: Int,
                        residual: Boolean): IvfPqIndex = {
    val source = if (!residual) ivf.cells.select(
        col("neighbor_id"), col("cv"), col("cell"))
      else ivf.cells
        .join(broadcast(ivf.centroids
          .select(col("centroid_id").as("cell"), col("centv"))), Seq("cell"))
        .select(col("neighbor_id"),
          zip_with(col("cv"), col("centv"), (x, c) => x - c).as("cv"),
          col("cell"))
    val books = pqTrainQuantized(
      source.select(col("neighbor_id").as("__id"), col("cv")), m, ksub, iters)
    val cells = encodeQuantized(source, books, m, keep = Seq("cell"))
    IvfPqIndex(cells, ivf.centroids, books, residual)
  }

  /** Incrementally admit a vector batch into a built index: assign each new
    * vector to its coarse cell and encode it with the EXISTING quantizers —
    * one broadcast pass over the BATCH, the existing cells frame untouched
    * (at 100 TB the daily embedding increment costs increment-work, not a
    * rebuild — the `incrementalJaccardMatches` story for the serving index).
    * Assignment and encoding are deterministic given (centroids, books), so
    * an added vector gets exactly the row a from-scratch encode under the
    * same quantizers would give it (spec: re-adding an indexed vector under
    * a new id reproduces its twin's cell AND codes bit-for-bit). Caveat, as
    * for every add()-style index: codebooks do not retrain, so after enough
    * distribution drift the index wants a rebuild. */
  def ivfPqAdd(index: IvfPqIndex, batch: DataFrame, m: Int = 0,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): IvfPqIndex = {
    val mm = resolveM(index, m)
    val assigned = batch
      .select(col(idCol).as("neighbor_id"),
        VectorFns.quantize(col(vecCol)).as("cv"))
      .withColumn("cn", VectorFns.normLong(col("cv")))
      .crossJoin(broadcast(packed(index.centroids)))
      .withColumn("cell",
        nearestCellIds(col("cents"), col("cv"), col("cn"), 1)(0))
    val source = if (!index.residual)
      assigned.select(col("neighbor_id"), col("cv"), col("cell"))
    else assigned
      .join(broadcast(index.centroids
        .select(col("centroid_id").as("cell"), col("centv"))), Seq("cell"))
      .select(col("neighbor_id"),
        zip_with(col("cv"), col("centv"), (x, c) => x - c).as("cv"),
        col("cell"))
    index.copy(cells = index.cells.unionByName(
      encodeQuantized(source, index.books, mm, keep = Seq("cell"))))
  }

  /** Deletion tick for the dense serving index — [[ivfPqAdd]]'s inverse and
    * the `Bm25.remove` parity the right-to-be-forgotten pipeline (q86) was
    * missing: before this, a forget batch could maintain the sparse store
    * but forced a dense-index REBUILD. Drops `ids` (a one-column frame of
    * vector ids) from the PQ-encoded cells; centroids and codebooks are
    * FROZEN by contract (exactly as for add), so the result is bit-for-bit
    * the index a from-scratch encode of the surviving corpus under the
    * same quantizers yields, and serving it is score-identical to
    * metadata-excluding the doomed ids (spec-pinned both ways). Cost: one
    * broadcast anti-join over the cells frame — O(index) scan, zero
    * shuffle, no re-train. Unknown ids no-op. As with add, enough
    * distribution drift (here: mass deletion of a cell's population)
    * eventually wants a re-train. */
  def ivfPqRemove(index: IvfPqIndex, ids: DataFrame): IvfPqIndex = {
    val doomed = ids.select(col(ids.columns.head).as("neighbor_id"))
      .distinct()
    index.copy(cells =
      index.cells.join(broadcast(doomed), Seq("neighbor_id"), "left_anti"))
  }

  /** The index's true subspace count (its codebooks are authoritative). A
    * caller-passed `m` that disagrees would mis-slice queries and zip_with
    * unequal codes/tabs arrays into null lookups — silently-wrong cosines —
    * so `m = 0` (the default) derives it and any explicit value must match. */
  private def resolveM(index: IvfPqIndex, m: Int): Int = {
    val mIdx = index.books.agg(max(col("subspace"))).first().getInt(0) + 1
    require(m == 0 || m == mIdx,
      s"m=$m does not match the index's $mIdx PQ subspaces; omit m (or pass 0) to derive it")
    mIdx
  }

  /** Serve a query batch from the composed index: each query probes its
    * `nProbe` nearest coarse cells (the same in-row argmax as `ivfSearch`)
    * and carries its ADC tables into the probe, so candidates inside probed
    * cells are scored by m table lookups — the PQ-encoded corpus is only
    * ever probed on its cell key, never shuffled, and the original vectors
    * are never touched. `nProbe >= nCentroids` degrades to exactly
    * `pqSearch` over the whole encoded corpus (cells partition it). */
  def ivfPqSearch(index: IvfPqIndex, queries: DataFrame, k: Int,
                  nProbe: Int = 4, m: Int = 0, idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  allowedIds: DataFrame = null,
                  excludePairs: DataFrame = null): DataFrame = {
    val mm = resolveM(index, m)
    // metadata-filtered serving (the Bm25.search(allowedIds) contract on
    // the dense side): candidates restrict BEFORE the per-query top-k
    // fills; surviving neighbors score identically to the unfiltered
    // search (the ADC arithmetic sees the same codes)
    val cells =
      if (allowedIds == null) index.cells
      else index.cells.join(
        allowedIds.select(col(allowedIds.columns.head).as("neighbor_id"))
          .distinct(), Seq("neighbor_id"), "left_semi")
    // per-query GOLD exclusion (Bm25.search(excludePairs) on the dense
    // side — the hard-negative-mining primitive for the dense retriever):
    // anti-join on the candidate-sized scored frame before the heap
    def excl(scored: DataFrame): DataFrame =
      if (excludePairs == null) scored
      else scored.join(broadcast(excludePairs
          .select(col(excludePairs.columns.head).as("query_id"),
            col(excludePairs.columns(1)).as("neighbor_id")).distinct()),
        Seq("query_id", "neighbor_id"), "left_anti")
    val centroidArr = index.centroids
      .agg(collect_list(struct(col("centroid_id"), col("centv"), col("centn")))
        .as("cents"))
    val q = queries.select(col(idCol).as("query_id"),
      VectorFns.quantize(col(vecCol)).as("qv"))
    val dims = q.select(size(col("qv"))).first().getInt(0)
    val ranges = subRanges(dims, mm)
    val probes = q.crossJoin(broadcast(centroidArr))
      .crossJoin(broadcast(packedBooks(index.books)))
      .select(col("query_id"), col("qv"),
        explode(nearestCellIds(col("cents"), col("qv"),
          VectorFns.normLong(col("qv")), nProbe)).as("cell"),
        sqrt(VectorFns.dotLong(col("qv"), col("qv")).cast("double")).as("qn"),
        adcDotTables(ranges).as("tabs"),
        adcNormTables(mm).as("n2s"))
    if (!index.residual) {
      rankTopK(excl(adcScore(cells
          .join(broadcast(probes.drop("qv")), Seq("cell")))
        .filter(col("query_id") =!= col("neighbor_id"))), k)
    } else {
      // IVFADC scoring: reconstruction = centroid(cell) + decode(codes), so
      //   num   = dot(q, centv)  +  Σ_s tabs[s][code_s]          (exact longs)
      //   |x̂|² = |centv|² + 2·Σ_s dot(centv_s, book_s[code_s]) + Σ_s n2s
      // The centroid dot rides the probe row (one per query×cell); the
      // centroid×book cross-terms are query-INDEPENDENT — precomputed once
      // into a cells×m×ksub table (FAISS's precomputed-tables trick) and
      // broadcast alongside the probes. Exact integer arithmetic throughout.
      val cellConsts = index.centroids
        .select(col("centroid_id").as("cell"), col("centv").as("ctv"))
        .withColumn("centn2", VectorFns.dotLong(col("ctv"), col("ctv")))
      val crossPacked = cellConsts.crossJoin(broadcast(packedBooks(index.books)))
        .select(col("cell"), col("centn2"),
          array(ranges.zipWithIndex.map { case ((off, len), s) =>
            transform(col("bk")(s), c =>
              VectorFns.dotLong(slice(col("ctv"), off, len), c("centv")))
          }: _*).as("xtabs"))
      val rProbes = probes
        .join(broadcast(cellConsts.select(col("cell"), col("ctv"))), Seq("cell"))
        .withColumn("qc", VectorFns.dotLong(col("qv"), col("ctv")))
        .drop("qv", "ctv")
      def lookupSum(tables: Column): Column =
        aggregate(zip_with(col("codes"), tables,
          (code, tab) => element_at(tab, code + 1)), lit(0L), (acc, x) => acc + x)
      val scored = cells
        .join(broadcast(rProbes), Seq("cell"))
        .join(broadcast(crossPacked), Seq("cell"))
        .withColumn("cosine",
          (col("qc") + lookupSum(col("tabs"))).cast("double") /
          (col("qn") * sqrt((col("centn2") + lit(2L) * lookupSum(col("xtabs")) +
            lookupSum(col("n2s"))).cast("double"))))
        .filter(col("query_id") =!= col("neighbor_id"))
      rankTopK(excl(scored), k)
    }
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
    rankTopK(c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv"))), k)
  }

  /** Per-group centroid cosine — embedding OUTLIER detection ("is this
    * vector where its label says it should be?"): each group's centroid is
    * the exact integer MEAN of its quantized members (one map-combinable
    * `VectorSumAgg` + a truncated per-component division — both engines
    * truncate toward zero, so the centroid is bit-reproducible in SQL), and
    * every member scores its cosine against its own group's centroid.
    * Mislabeled / corrupted / off-distribution embeddings surface as the
    * low-cosine tail; curation gates drop or reroute them.
    *
    * Scale shape: one quantize projection, one group aggregate whose shuffle
    * is groups × d longs (map-side partials — the corpus itself never
    * shuffles), a BROADCAST join back (the centroid frame is group-count
    * sized), and the native fused-loop dot per row. Mean (not sum) centroids
    * keep components ≤ the 1e6 quantization scale, so the per-row dot is
    * bounded by d·10¹² regardless of group size — no overflow at any corpus
    * scale. */
  def centroidCosine(corpus: DataFrame, idCol: String, vecCol: String,
                     groupCols: Seq[String]): DataFrame = {
    graft.functions.VectorSumAgg.register(corpus.sparkSession)
    val gc = groupCols.map(col)
    val prepped = Dedup.ensureParallel(
        corpus.select((gc :+ col(idCol) :+ col(vecCol)): _*))
      .select((gc :+ col(idCol) :+ VectorFns.quantize(col(vecCol)).as("__q")): _*)
    val cents = prepped.groupBy(gc: _*)
      .agg(graft.functions.VectorSumAgg(col("__q")).as("__sv"),
        count(lit(1)).as("n_members"))
      .select((gc :+ col("n_members") :+
        transform(col("__sv"),
          x => graft.ops.Quantiles.div(x, col("n_members"))).as("__m")): _*)
      .withColumn("__mn", VectorFns.normLong(col("__m")))
    prepped.join(broadcast(cents), groupCols)
      .select((gc :+ col(idCol) :+ col("n_members") :+
        VectorFns.cosineFromQuantized(col("__q"), col("__m"),
          VectorFns.normLong(col("__q")), col("__mn")).as("cosine")): _*)
  }
}
