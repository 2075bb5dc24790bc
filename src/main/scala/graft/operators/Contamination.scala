package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: flag documents sharing
  * word n-grams with a held-out evaluation/benchmark set — the standard n-gram
  * overlap check run before any model training (e.g. 13-gram dedup in GPT-3's
  * appendix; this engine parameterizes n).
  *
  * Scale design: the benchmark side is DISTINCT n-grams only (benchmarks are
  * orders of magnitude smaller than the corpus) and is broadcast, so the corpus
  * pass is map-side: tokenize → explode → broadcast-hash probe → partial-agg
  * count per doc. No corpus shuffle except the final per-doc count combine.
  */
object Contamination {

  /** Per corpus doc: count of DISTINCT n-gram shingles shared with ANY benchmark
    * doc, plus the boolean flag. Docs with no shared n-grams (or too short to
    * have any) report 0/false. N-grams are hashed to longs (xxhash64) — set
    * sizes are identical to the string form barring ~1e-19/pair collisions. */
  def sharedNgrams(docs: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val benchGrams = bench.repartition(parts)
      .select(explode(TextFns.hashedShingles(col(textCol), n)).as("__g"))
      .distinct()
    val docGrams = docs.repartition(parts)
      .select(col(idCol), explode(TextFns.hashedShingles(col(textCol), n)).as("__g"))
    val hits = docGrams.join(broadcast(benchGrams), "__g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("shared_ngrams"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .withColumn("shared_ngrams", coalesce(col("shared_ngrams"), lit(0L)))
      .withColumn("contaminated", col("shared_ngrams") > 0)
  }

  /** Span-level DECONTAMINATION — the remedy paired with [[sharedNgrams]]'s
    * flag: cut every `windowTokens`-token span of a corpus document whose
    * content appears verbatim in the benchmark set, keep the rest of the
    * document (the standard pre-training hygiene step when dropping whole
    * documents is too blunt — GPT-3 appendix C's surgical variant of 13-gram
    * decontamination). The within-corpus analog is
    * `Dedup.scrubSharedWindows` (first occurrence survives); here NO corpus
    * occurrence survives — benchmark text must not be trainable at all.
    *
    * Scale shape: the benchmark side collapses to DISTINCT window hashes and
    * is BROADCAST (benchmarks are tiny vs the corpus); the corpus explodes
    * positional windows map-side, probes the broadcast set, and only hit
    * positions enter the (doc, pos)-keyed anti-join + rebuild — the same
    * accepted shuffle shape as the q95 scrub. The corpus is never joined to
    * itself. Returns (idCol, n_tokens, n_removed, textCol-rebuilt); docs
    * fully covered come back as empty husks (callers drop or keep them). */
  def scrubBenchWindows(docs: DataFrame, bench: DataFrame, idCol: String,
                        textCol: String, windowTokens: Int = 20): DataFrame = {
    require(windowTokens >= 2, s"windowTokens must be >= 2, got $windowTokens")
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val ws = TextFns.words(col(textCol))
    val d = docs.repartition(parts)
    val toks = d.select(col(idCol), posexplode(ws).as(Seq("__pos", "__tok")))
    val wins = d.select(col(idCol),
      posexplode(TextFns.positionalShingles(col(textCol), windowTokens))
        .as(Seq("__pos", "__wh")))
    // hashedShingles is already per-doc sorted-distinct; the cross-doc
    // distinct still collapses windows shared between benchmark docs
    val benchWins = bench.repartition(parts)
      .select(explode(TextFns.hashedShingles(col(textCol), windowTokens))
        .as("__wh"))
      .distinct()
    val hits = wins.join(broadcast(benchWins), "__wh")
      .select(col(idCol), col("__pos"))
    val drops = hits.select(col(idCol),
        explode(sequence(col("__pos"),
          col("__pos") + (windowTokens - 1))).as("__pos"))
      .distinct()
    val kept = toks.join(drops, Seq(idCol, "__pos"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("__kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("__pos"), col("__tok")))),
          x => x("__tok")), " ").as("__text"))
    d.select(col(idCol), size(ws).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__kept"), lit(0L))).as("n_removed"),
        coalesce(col("__text"), lit("")).as(textCol))
  }

  /** The 100 TB production shape of [[sharedNgrams]]: a Bloom pre-filter
    * ([[Bloom.build]] over the benchmark's distinct grams — at most
    * `2^bitsLog2/32` rows regardless of benchmark size) rejects the vast
    * majority of corpus grams MAP-SIDE before the exact join ever sees them.
    * Bloom never false-negatives, so the surviving grams contain every true
    * match and the result is EXACTLY [[sharedNgrams]]'s (pinned by spec); the
    * exact join's probe side shrinks from all corpus grams to
    * (matches + the `(1−e^(−kn/m))^k` false-positive residue). This is the
    * composition that matters when the benchmark gram set is too big to
    * broadcast comfortably: the pre-filter frame stays KB-sized even when the
    * exact side would be GBs, and the corpus-side shuffle into a non-broadcast
    * exact join is cut by the rejection rate.
    *
    * String grams end-to-end (not the hashed-long fast path) so the whole
    * chain — FNV → splitmix64 → k disjoint bit fields → 32-bit words — stays
    * re-derivable in plain SQL (the q94 oracle precedent).
    *
    * `stats=true` (audit shape) adds per-doc `n_grams` and `bloom_kept_grams`
    * so the pruning is observable in the output; it re-walks the probe for the
    * counts, so leave it off in production. */
  def sharedNgramsBloom(docs: DataFrame, bench: DataFrame, idCol: String,
                        textCol: String, n: Int, bitsLog2: Int = 16,
                        k: Int = 3, stats: Boolean = false): DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    def grams(df: DataFrame): DataFrame = df.select(col(idCol),
      explode(TextFns.stringShingles(col(textCol), n)).as("__g"))
    val benchGrams = grams(bench.repartition(parts)).select("__g").distinct()
    val filter = Bloom.build(benchGrams, Nil, col("__g"), bitsLog2, k)
    val probed = Bloom.probe(grams(docs.repartition(parts)), col("__g"),
      filter, Nil, bitsLog2, k)
    // production path: ONLY pre-filter survivors reach the exact join
    val exact = probed.filter(col("might_contain"))
      .join(broadcast(benchGrams), Seq("__g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("shared_ngrams"))
    val base = docs.select(col(idCol))
      .join(exact, Seq(idCol), "left")
      .withColumn("shared_ngrams", coalesce(col("shared_ngrams"), lit(0L)))
      .withColumn("contaminated", col("shared_ngrams") > 0)
    if (!stats) base
    else {
      val perDoc = probed.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("might_contain"), 1)).as("bloom_kept_grams"))
      base.join(perDoc, Seq(idCol), "left")
        .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
        .withColumn("bloom_kept_grams",
          coalesce(col("bloom_kept_grams"), lit(0L)))
        .select(col(idCol), col("n_grams"), col("bloom_kept_grams"),
          col("shared_ngrams"), col("contaminated"))
    }
  }
}
