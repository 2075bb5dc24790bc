package graft

import graft.functions.{MinHashSketch, TextFns}
import org.apache.spark.sql.functions._

class MinHashSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch is partition-invariant and identical docs share signatures") {
    MinHashSketch.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (3L, "an entirely different document about query engines"))
      .toDF("doc_id", "text")
    def signatures(parts: Int): Map[Long, Seq[Long]] =
      docs.repartition(parts)
        .select($"doc_id", explode(TextFns.hashedShingles($"text", 2)).as("h"))
        .groupBy($"doc_id")
        .agg(MinHashSketch($"h", 32).as("sig"))
        .as[(Long, Seq[Long])].collect().toMap
    val one = signatures(1)
    val eight = signatures(8)
    assert(one == eight) // associative merge => partition-independent
    assert(one(1L) == one(2L)) // identical docs, identical signatures
    assert(one(1L) != one(3L))
    assert(one(1L).length == 32)
  }

  test("signature similarity estimates Jaccard for near-dups") {
    MinHashSketch.register(spark)
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o q")) // one token changed
      .toDF("doc_id", "text")
    val sigs = docs
      .select($"doc_id", explode(TextFns.hashedShingles($"text", 2)).as("h"))
      .groupBy($"doc_id").agg(MinHashSketch($"h", 256).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val matches = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    val est = matches.toDouble / 256
    // true 2-gram jaccard: 13 shared of 17 distinct shingles ~ 0.76
    assert(est > 0.55 && est < 0.95, s"estimate $est")
  }
}
