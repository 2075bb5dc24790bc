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

  /** Static corpus index for EMBEDDING admission: (corpus_id, band, bh, cv, cn) —
    * one row per (vector, band), carrying the quantized vector and norm so the
    * stream side can verify exact cosine in-flight with no second join. Payload
    * is bands × corpus vectors — the price of a self-contained probe table;
    * store slim (drop cv/cn) and re-join against the vector frame if the
    * duplication matters more than the extra stream-side join. Buckets come
    * from the same native `hyperplaneBucket` signatures as the batch LSH dedup,
    * so stream and batch agree bit-for-bit on candidates. */
  def corpusBucketIndex(corpus: DataFrame, idCol: String, vecCol: String,
                        lshPlanes: Int = 12, lshBands: Int = 8): DataFrame = {
    import graft.functions.VectorFns
    val prepped = corpus
      .repartition(corpus.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("__v"))
      .withColumn("cv", VectorFns.quantize(col("__v")))
      .withColumn("cn", VectorFns.normLong(col("cv")))
      // buckets from the RAW vector, exactly like the batch LSH dedup prep;
      // the full band array rides along so the probe join can emit each
      // (stream, corpus) pair from its FIRST shared band only
      .withColumn("cbkts", array((0 until lshBands).map(b =>
        VectorFns.hyperplaneBucket(col("__v"), lshPlanes, b * lshPlanes)
          .cast("long")): _*))
    prepped.select(col("corpus_id"), col("cv"), col("cn"), col("cbkts"),
        posexplode(col("cbkts")).as(Seq("band", "bh")))
      .select(col("corpus_id"), col("band"), col("bh"), col("cbkts"),
        col("cv"), col("cn"))
  }

  /** Flag streaming embeddings whose cosine against SOME corpus vector meets
    * `threshold`: candidates from the stream-static band join (no state store),
    * verified with the exact integer-dot cosine before flagging — unlike the
    * MinHash text path, the flag here is a VERIFIED near-dup, not a candidate.
    * Returns (idCol, n_corpus_matches, matched_corpus_id = min matching id,
    * best_cosine). Zero-match vectors do not appear. */
  def nearDupEmbeddingFlags(vecs: DataFrame, corpusIndex: DataFrame,
                            idCol: String, vecCol: String, threshold: Double,
                            lshPlanes: Int = 12, lshBands: Int = 8): DataFrame = {
    import graft.functions.VectorFns
    val q = vecs.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("qv", VectorFns.quantize(col("__v")))
      .withColumn("qn", VectorFns.normLong(col("qv")))
      .withColumn("qbkts", array((0 until lshBands).map(b =>
        VectorFns.hyperplaneBucket(col("__v"), lshPlanes, b * lshPlanes)
          .cast("long")): _*))
    // a (stream vec, corpus vec) pair sharing k bands is matched k times by the
    // band join; the first-shared-band gate keeps exactly one of them (streams
    // forbid distinct aggregation, and the batch operators use the same trick)
    val noEarlierBand = size(filter(
      slice(zip_with(col("qbkts"), col("cbkts"), (a, b) => a === b),
        lit(1), col("band")), p => p)) === 0
    q.select(col(idCol), col("qv"), col("qn"), col("qbkts"),
        posexplode(col("qbkts")).as(Seq("band", "bh")))
      .join(corpusIndex, Seq("band", "bh")) // stream-static: no state store
      .filter(noEarlierBand)
      .withColumn("cosine", VectorFns.cosineFromQuantized(
        col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("cosine") >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_corpus_matches"),
        min(col("corpus_id")).as("matched_corpus_id"),
        max(col("cosine")).as("best_cosine"))
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

  /** Static corpus index for MEDIA admission: the pigeonhole banding of a
    * perceptual SIGNATURE store — (corpus_id, csig, band, bh), one row per
    * (signature, band), bands = maxHamming + 1, from the very same bit
    * slicing the batch `Dedup.simhashBandPairs` uses, so stream and batch
    * agree bit-for-bit on candidates. Build from
    * `Multimodal.perceptualHashes` output once; the lake's blobs are never
    * re-read by the stream. Identical store signatures contract to their
    * min-id representative (the batch admission gate's flood guard — exact:
    * same bands, same hamming to any probe), so a lake full of blank media
    * cannot multiply every probe row; `matched_corpus_id` then reports the
    * representative. */
  def mediaSignatureIndex(corpusHashes: DataFrame, maxHamming: Int): DataFrame =
    graft.operators.Dedup.simhashBandedFrame(
        corpusHashes.select(col("media_id"), col("phash").as("simhash"))
          .groupBy(col("simhash")).agg(min(col("media_id")).as("media_id"))
          .select(col("media_id"), col("simhash")),
        "media_id", maxHamming)
      .select(col("__id").as("corpus_id"), col("simhash").as("csig"),
        col("band"), col("bh"),
        // the radius is PART of the index: band numbering maps to different
        // bit slices at different radii, so probing with a mismatched radius
        // would silently lose the recall guarantee — the probe reads the
        // radius from here instead of trusting a second copy of the value
        lit(maxHamming).as("__maxHamming"))

  /** Flag streaming media whose perceptual hash lands within `maxHamming` of
    * some corpus signature: arriving payloads decode+hash per micro-batch in
    * a mapPartitions projection (the blob never leaves its partition), band
    * hashes stream-static join the index (no state store), and the EXACT
    * `bit_count(xor)` verifies in-flight — like the embedding path, the flag
    * is a verified near-dup, not a candidate. Pairs sharing several bands
    * are kept once by the first-shared-band predicate (streams forbid
    * distinct). The radius comes FROM the index (`__maxHamming` — one
    * bounded lookup at stream build time), so stream and index can never
    * band-slice differently. Returns (media_id, n_corpus_matches,
    * matched_corpus_id, best_hamming); undecodable and zero-match payloads
    * do not appear — compose as a suppression list, dropping undecodables
    * separately. */
  def nearDupMediaFlags(media: DataFrame, corpusIndex: DataFrame,
                        hasher: graft.operators.Multimodal.BatchHasher,
                        payloadCol: String = "payload"): DataFrame = {
    import graft.operators.Dedup.{simhashBandVal, simhashBandedFrame}
    val spark = media.sparkSession
    import spark.implicits._
    // fresh-lake bootstrap guard: an empty index has no radius to read — fail
    // with intent instead of head's NoSuchElementException (the stream result
    // must itself be a stream, so "return an empty static frame" is not an
    // option here; skip the flags stage until the store has rows)
    val maxHamming = corpusIndex.select(col("__maxHamming")).limit(1)
      .collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        "nearDupMediaFlags: corpus signature index is empty — build " +
          "mediaSignatureIndex over a non-empty store, or skip the flags " +
          "stage on fresh-lake bootstrap"))
      .getInt(0)
    val bands = maxHamming + 1
    val sig = media
      .select(col("media_id").cast("long"), col("kind"), col(payloadCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(hasher)
      .toDF("media_id", "ssig")
    val noEarlierBand = (0 until bands - 1).map { b =>
      col("band") <= b ||
        simhashBandVal(col("ssig"), b, bands) =!=
          simhashBandVal(col("csig"), b, bands)
    }.reduceOption(_ && _).getOrElse(lit(true))
    simhashBandedFrame(sig.select(col("media_id"), col("ssig").as("simhash")),
        "media_id", maxHamming) // the batch slicing, verbatim — never forks
      .select(col("__id").as("media_id"), col("simhash").as("ssig"),
        col("band"), col("bh"))
      .join(corpusIndex, Seq("band", "bh")) // stream-static: no state store
      .filter(bit_count(col("ssig").bitwiseXOR(col("csig"))) <= maxHamming)
      .filter(noEarlierBand)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_corpus_matches"),
        min(col("corpus_id")).as("matched_corpus_id"),
        min(bit_count(col("ssig").bitwiseXOR(col("csig")))).as("best_hamming"))
  }
}
