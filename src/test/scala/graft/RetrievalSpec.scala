package graft

import graft.operators.Retrieval

/** RRF fusion kernel: exact e6-integer scores, absent-list zero
  * contribution, deterministic tie-break — the piece q139/q141 share. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: hand-computed scores, absent docs contribute 0, ties on id") {
    val sparse = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "d", "r")
    val dense = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("x", "y", "z")
    val out = Retrieval.rrfFuse(sparse, dense, k = 3)
      .orderBy($"rn").as[(Long, Int, Long, Long)].collect().toSeq
    // doc 11: 1e6/61 + 1e6/62 = 16393 + 16129 = 32522 (integer division)
    // doc 10: 1e6/61 = 16393; doc 12: 1e6/62 = 16129
    assert(out == Seq((1L, 1, 11L, 32522L), (1L, 2, 10L, 16393L),
      (1L, 3, 12L, 16129L)))
    // mirrored ranks -> EQUAL fused scores -> min doc id first
    val tied = Retrieval.rrfFuse(
        Seq((1L, 21L, 1), (1L, 20L, 2)).toDF("q", "d", "r"),
        Seq((1L, 20L, 1), (1L, 21L, 2)).toDF("q", "d", "r"), k = 2)
      .orderBy($"rn").as[(Long, Int, Long, Long)].collect().toSeq
    assert(tied.map(_._3) == Seq(20L, 21L) &&
      tied.map(_._4).distinct.size == 1)
    // k truncates the fused list, not the inputs
    assert(Retrieval.rrfFuse(sparse, dense, k = 1).count() == 1L)
  }

  test("evaluate: hand-computed recall/MRR/nDCG in exact e6 integers") {
    // disc(k=3) = [1000000, 630930, 500000]; prefix = [1000000, 1630930,
    // 2130930] — round(1e6/log2(r+1))
    assert(Retrieval.discountsE6(3).toSeq ==
      Seq(1000000L, 630930L, 500000L))
    val hits = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3), // q1: rel at ranks 1, 3
      (2L, 99L, 1), (2L, 98L, 2), (2L, 97L, 3), // q2: no relevant hit
      (1L, 12L, 9))                             // beyond k: ignored
      .toDF("q", "d", "r")
    val gold = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (3L, 30L)).toDF("q", "d") // q3 has gold but NO hits
    val out = Retrieval.evaluate(hits, gold, k = 3)
      .orderBy($"q_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // q1: recall 2e6/4, mrr 1e6/1, dcg 1000000+500000=1500000,
    //     idcg prefix(min(4,3))=2130930 -> 1500000e6 // 2130930 = 703918
    assert(out == Seq(
      (1L, 4L, 2L, 500000L, 1000000L, 703918L),
      (2L, 1L, 0L, 0L, 0L, 0L),
      (3L, 1L, 0L, 0L, 0L, 0L)))
    // the summary macro-averages per-query e6 metrics
    val sum = Retrieval.evaluateSummary(hits, gold, k = 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(sum == ((3L, 166666L, 333333L, 234639L)))
  }
}
