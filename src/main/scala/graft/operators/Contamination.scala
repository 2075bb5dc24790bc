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
}
