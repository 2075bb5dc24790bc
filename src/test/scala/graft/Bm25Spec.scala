package graft

import graft.operators.Bm25

/** BM25 retrieval: hand-computed scaled-integer scores, ranking, and
  * partition invariance. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"))
    .toDF("doc_id", "text")

  test("topK: exact quantized scores against the hand computation") {
    val queries = Seq((100L, "apple cherry")).toDF("q_id", "q_text")
    val out = Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
      k = 3)
      .orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    // N=3, Σdl=9, avgdl_e3=3000; norm_e6 = 250000 + 250·dl·1000/1... see
    // operator doc. idf_e6(apple)=round(ln(8/3)·1e6)=980829;
    // idf_e6(cherry)=round(ln(1.6)·1e6)=470004.
    // d1: term(apple): ⌊980829·2·2200 / (2000+1200)⌋ = 1348639
    // d3: term(cherry): ⌊470004·3·2200 / (3000+1500)⌋ = 689339
    // d2: term(cherry): ⌊470004·1·2200 / (1000+900)⌋  = 544215
    assert(out == Seq(
      (100L, 1, 1L, 1348639L, 1L),
      (100L, 2, 3L, 689339L, 1L),
      (100L, 3, 2L, 544215L, 1L)))
  }

  test("topK: k truncates, multi-term queries sum, missing terms contribute 0") {
    val queries = Seq(
      (1L, "banana cherry"), // matches all three docs
      (2L, "zzz absent"))    // matches nothing -> query emits nothing
      .toDF("q_id", "q_text")
    val out = Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
      k = 2)
      .orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).toSet == Set(1L))
    assert(out.size == 2) // k=2 of 3 matching docs
    // d2 matches BOTH terms (banana + cherry); others match one
    assert(out.head._3 == 2L && out.head._5 == 2L)
  }

  test("topK: maxHits budget refuses the stopword-frequent regime loudly") {
    // every query term appears in most docs: hit volume = Σ df = 2 + 2
    val queries = Seq((1L, "banana cherry")).toDF("q_id", "q_text")
    val e = intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
        k = 2, maxHits = 3L).collect()
    }
    assert(e.getMessage.contains("4 hit rows"))
    assert(e.getMessage.contains("refusing before any join work"))
    // under budget: identical results to the ungated run
    val gated = Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
      k = 2, maxHits = 4L).orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    val open = Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
      k = 2).orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(gated == open && gated.nonEmpty)
  }

  test("topK: partitioning-invariant") {
    val big = (0L until 300L).map { i =>
      (i, s"w${i % 7} w${i % 11} w${i % 13} common w${i % 3}")
    }.toDF("doc_id", "text")
    val queries = Seq((1L, "w1 w2 common"), (2L, "w5 w10")).toDF("q_id", "q_text")
    val a = Bm25.topK(big.repartition(1), "doc_id", "text", queries,
      "q_id", "q_text", k = 5).orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    val b = Bm25.topK(big.repartition(32), "doc_id", "text", queries,
      "q_id", "q_text", k = 5).orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.size == 10)
  }
}
