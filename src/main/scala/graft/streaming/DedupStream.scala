package graft.streaming

import graft.functions.{MinHashSketch, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming near-duplicate detection: incoming documents are checked IN-FLIGHT
  * against a precomputed corpus index — the admission-control step of a continuous
  * training-data ingest (reject/flag a document before it ever lands in the
  * corpus).
  *
  * Spark-first shape: the corpus side is a STATIC frame of MinHash band buckets
  * (built once with the same in-row `MinHashSketch.sketchCol` signatures the batch
  * LSH dedup uses); the stream side computes each arriving doc's band hashes in a
  * narrow projection and stream-static joins on (band, bh). Stream-static joins
  * need no state store and no watermark — the static side is broadcast/probed per
  * micro-batch, so state never grows with stream length. Exact-duplicate admission
  * is a separate `dropDuplicatesWithinWatermark` path with watermark-bounded
  * state. */
object DedupStream {

  /** Static corpus index: (corpus_id, band, bh) — one row per (doc, band).
    * Build once, reuse across the stream's lifetime (write to parquet for a real
    * deployment; the plan shape is identical). */
  def corpusBandIndex(corpus: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 64,
                      bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    MinHashSketch.register(corpus.sparkSession)
    val sh = corpus
      .repartition(corpus.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("corpus_id"),
        TextFns.sortedHashedShingles(col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val sig = sh.select(col("corpus_id"),
      MinHashSketch.sketchCol(col("__sh"), numHashes).as("sig"))
    val bandHashes = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * r + 1, r)).as("bh"))
    }
    sig.select(col("corpus_id"), explode(array(bandHashes: _*)).as("bb"))
      .select(col("corpus_id"), col("bb.band"), col("bb.bh"))
  }

  /** Flag streaming docs that share at least one MinHash band with any corpus
    * doc: returns (idCol, n_corpus_matches, first matched corpus_id). A doc with
    * zero matches does NOT appear — compose with an outer join or use the flag
    * frame as a suppression list, mirroring how the batch path treats candidate
    * pairs. `docs` must be a streaming frame with (idCol, textCol). */
  def nearDupFlags(docs: DataFrame, corpusIndex: DataFrame, idCol: String,
                   textCol: String, shingleN: Int = 3, numHashes: Int = 64,
                   bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    MinHashSketch.register(docs.sparkSession)
    val sig = docs
      .select(col(idCol), col(textCol))
      .withColumn("__sh", TextFns.sortedHashedShingles(col(textCol), shingleN))
      .filter(size(col("__sh")) > 0)
      .withColumn("sig", MinHashSketch.sketchCol(col("__sh"), numHashes))
    val bandHashes = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * r + 1, r)).as("bh"))
    }
    sig.select(col(idCol), explode(array(bandHashes: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bh"))
      .join(corpusIndex, Seq("band", "bh")) // stream-static: no state store
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_corpus_matches"),
        min(col("corpus_id")).as("matched_corpus_id"))
  }

  /** Exact-duplicate admission control on a stream: keep the FIRST arrival of
    * each normalized content hash, drop repeats arriving within the watermark.
    * `dropDuplicatesWithinWatermark` bounds the dedup state store by event time —
    * the other half of the guarantee that a continuous ingest cannot grow state
    * without bound. */
  def exactAdmission(docs: DataFrame, textCol: String, eventTimeCol: String,
                     watermark: String = "1 hour"): DataFrame =
    docs.withColumn("__content_sha", sha2(lower(trim(col(textCol))), 256))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("__content_sha")
}
