package graft.operators

import graft.functions.TextFns
import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline, exact and approximate.
  *
  * Scale design: every variant is expressed so the expensive comparison only happens
  * inside small candidate groups produced by a hash-partitionable blocking key —
  * exact dedup groups by content hash; MinHash-LSH groups by (band, bandHash);
  * SimHash groups by 16-bit signature bands; embedding dedup groups by label/LSH
  * bucket. No operator ever materializes the full O(n²) pair space, so each is one
  * or two shuffles regardless of corpus size.
  */
object Dedup {

  /** Exact dedup by normalized content hash: keeps the lowest-id row per group.
    * One hash aggregate (sha-bucket shuffle); survivors carry the group size. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = sha2(lower(trim(col(textCol))), 256)
    docs.withColumn("__h", norm)
      .groupBy(col("__h").as("content_sha"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
  }

  /** Near-dup pairs by exact n-gram Jaccard within blocking groups.
    * `blockCols` bounds the candidate space (e.g. language + length bucket) — at
    * 100 TB this is the difference between a feasible shuffle join and an O(n²)
    * explosion. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Scale mechanics: blocking keys are usually low-cardinality (5 languages = 5
    * tasks), so side A is salted by id and side B replicated across the salt space —
    * the expensive intersect work then spreads over `salts` × blocks tasks with
    * identical results. The Jaccard threshold is applied as an integer cross-multiply
    * (inter·(1+t) ≥ t·(|A|+|B|) scaled to exact longs) so the intersection is
    * computed once and no division runs in the hot filter. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        blockCols: Seq[String], salts: Int = 16): DataFrame = {
    // repartition BEFORE the per-doc shingle computation: document corpora often
    // arrive as few large-ish files, and without the exchange the whole
    // tokenize+hash+sort pipeline runs at file-count parallelism (measured: 1 task)
    val withSh = docs.select(
      (col(idCol).as("__id") +: col(textCol).as("__text") +: blockCols.map(col)): _*)
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .withColumn("__sh", TextFns.sortedHashedShingles(col("__text"), n))
      .filter(size(col("__sh")) > 0)
      .drop("__text")
    val a = withSh.select(col("__id").as("id_a") +: col("__sh").as("sh_a") +:
      size(col("__sh")).cast("long").as("sa") +: pmod(col("__id"), lit(salts))
        .as("__salt") +: blockCols.map(col): _*)
    val b = withSh.select(col("__id").as("id_b") +: col("__sh").as("sh_b") +:
      size(col("__sh")).cast("long").as("sb") +: blockCols.map(col): _*)
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    // integer threshold: inter/union >= t  <=>  inter*(1+t)*S >= t*S*(sa+sb)
    // with S scaling t to an exact integer (t assumed a short decimal)
    graft.functions.SortedIntersectCount.register(docs.sparkSession)
    val S = 1000000L
    val tS = math.round(threshold * S)
    val inter = graft.functions.SortedIntersectCount(col("sh_a"), col("sh_b"))
    // the replicated side broadcasts, so probe-side parallelism would collapse to
    // the file-scan partition count (often 1 file = 1 task); spread the probe side
    // across the (block, salt) space explicitly before the join
    a.repartition((blockCols :+ "__salt").map(col): _*)
      .join(b, blockCols :+ "__salt")
      .filter(col("id_a") < col("id_b"))
      // size filtering (SSJoin-style): jaccard >= t forces
      // min(|A|,|B|)/max(|A|,|B|) >= t — an exact necessary condition checked on two
      // ints, pruning pairs BEFORE any intersection is computed
      .filter(col("sa") * S >= lit(tS) * col("sb") &&
        col("sb") * S >= lit(tS) * col("sa"))
      .withColumn("inter", inter)
      .filter(col("inter") * (S + tS) >= lit(tS) * (col("sa") + col("sb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sa") + col("sb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signatures via the native `MinHashSketch` TypedImperativeAggregate:
    * one fixed-size buffer per doc instead of `numHashes` separate min() aggregate
    * expressions; partial aggregation map-side, partition-invariant result.
    * Returns (__id, sig: array<bigint>[numHashes]). */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int, numHashes: Int): DataFrame = {
    graft.functions.MinHashSketch.register(docs.sparkSession)
    // repartition before the explode: shingle hashing is the expensive part and
    // must not run at file-count parallelism
    val shingled = docs
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("__id"),
        explode(TextFns.hashedShingles(col(textCol), shingleN)).as("__sh"))
    shingled.groupBy(col("__id"))
      .agg(graft.functions.MinHashSketch(col("__sh"), numHashes).as("sig"))
  }

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * `numHashes / bands` rows; docs sharing any band hash become candidate pairs,
    * then candidates are verified with exact Jaccard. Standard (b, r) S-curve
    * banding. Returns (id_a, id_b, jaccard >= threshold). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sig = minhashSignature(docs, idCol, textCol, shingleN, numHashes)
    val bandHashes = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * r + 1, r)).as("bh"))
    }
    val buckets = sig.select(col("__id"),
      explode(array(bandHashes: _*)).as("bb"))
      .select(col("__id"), col("bb.band"), col("bb.bh"))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .distinct()
    // verify candidates with exact shingle Jaccard (intersect computed once,
    // over hashed shingles)
    graft.functions.SortedIntersectCount.register(docs.sparkSession)
    val sh = docs
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("__vid"),
        TextFns.sortedHashedShingles(col(textCol), shingleN).as("__vsh"))
    cand
      .join(sh.select(col("__vid").as("id_a"), col("__vsh").as("sha")), "id_a")
      .join(sh.select(col("__vid").as("id_b"), col("__vsh").as("shb")), "id_b")
      .withColumn("inter", graft.functions.SortedIntersectCount(col("sha"), col("shb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash per document: sign-sum of per-token hash bits. Computed with 64
    * conditional-sum aggregates in ONE hash aggregate pass (no per-bit shuffles). */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("__id"),
        explode(TextFns.words(col(textCol))).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
    val bitAggs = (0 until 64).map { j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$j")
    }
    val sums = tokens.groupBy(col("__id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("__id").as(idCol), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: candidates must share one of four 16-bit bands (so any
    * pair within Hamming distance 3 is guaranteed caught), verified by exact Hamming
    * distance <= maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sig = simhash64(docs, idCol, textCol)
    val banded = sig.select(col(idCol).as("__id"), col("simhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND(0xffffL).as("bh"))): _*))
        .as("bb"))
      .select(col("__id"), col("simhash"), col("bb.band"), col("bb.bh"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: cosine >= threshold within blocking groups (e.g. an
    * LSH bucket or coarse label). Vectors are quantized and norm'd ONCE per row
    * before the pair join, so the per-pair cost is a single integer dot fold —
    * the O(n) prep is hoisted out of the O(n²) loop. */
  def embeddingCosinePairs(embs: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, blockCols: Seq[String]): DataFrame = {
    val base = embs
      .repartition(embs.sparkSession.sessionState.conf.numShufflePartitions)
      .select(
        (col(idCol).as("__id") +: VectorFns.quantize(col(vecCol)).as("__q") +:
          blockCols.map(col)): _*)
      .withColumn("__n", VectorFns.normLong(col("__q")))
    val a = base.select(col("__id").as("id_a") +: col("__q").as("qa") +:
      col("__n").as("na") +: blockCols.map(col): _*)
    val b = base.select(col("__id").as("id_b") +: col("__q").as("qb") +:
      col("__n").as("nb") +: blockCols.map(col): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFns.cosineFromQuantized(
        col("qa"), col("qb"), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
