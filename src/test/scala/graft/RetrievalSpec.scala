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
}
