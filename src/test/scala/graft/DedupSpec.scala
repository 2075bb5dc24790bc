package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (2L, "the quick brown fox jumps over the lazy dog again and again", "en"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again", "en"), // near dup of 1
    (4L, "completely different content about databases and query engines", "en"),
    (5L, "der schnelle braune fuchs springt wirklich sehr hoch hinaus", "de"))
    .toDF("doc_id", "text", "lang")

  test("exact dedup groups identical normalized content, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 4)
    val dupGroup = out.filter($"n_copies" === 2)
    assert(dupGroup.count() == 1)
    assert(dupGroup.select($"canonical_id").as[Long].head() == 1L)
  }

  test("ngram jaccard finds the near-dup pair, not the distinct ones") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, Seq("lang"))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical -> jaccard 1
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // one-word diff
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH surfaces the same near-dups with exact-jaccard verification") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 2L)))
    val j12 = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(j12 == 1.0) // identical docs
    assert(!ids.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs have distance 0; near-dups are close") {
    val sig = Dedup.simhash64(docs, "doc_id", "text")
    val m = sig.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    val ham13 = java.lang.Long.bitCount(m(1L) ^ m(3L))
    val ham14 = java.lang.Long.bitCount(m(1L) ^ m(4L))
    assert(ham13 < ham14) // near-dup closer than unrelated
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("embedding cosine pairs: injected duplicate vector found, blocking respected") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.999f, 0.01f, 0.0f, 0.0f), 0), // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),    // orthogonal
      (4L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1))    // dup of 1 but other block
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingCosinePairs(embs, "vec_id", "embedding", 0.95,
      Seq("label")).select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // (1,4) blocked away, (1,3) dissimilar
  }
}
