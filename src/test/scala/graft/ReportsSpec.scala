package graft

import graft.functions.CharEntropyExpr
import graft.operators.Reports
import org.apache.spark.unsafe.types.UTF8String

/** Corpus data card: every column hand-verified on a corpus small enough to
  * fold by eye; partition-invariant. */
class ReportsSpec extends SparkSpec {
  import spark.implicits._

  test("corpusReport: volumes, vocab, means, rates — exact and partition-invariant") {
    val docs = Seq(
      (1L, "ab cd ef gh ij", "en", "A"),
      (2L, "aa aa aa aa aa aa", "zh", "A"), // low-entropy mash
      (3L, "pq rs tu vw xy", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
    def e(s: String): Long =
      CharEntropyExpr.entropyE6(UTF8String.fromString(s))
    assert(e("aa aa aa aa aa aa") < 2000000L &&
      e("ab cd ef gh ij") >= 2000000L && e("pq rs tu vw xy") >= 2000000L)
    val meanA = (e("ab cd ef gh ij") + e("aa aa aa aa aa aa")) / 2
    for (parts <- Seq(1, 4)) {
      val got = Reports.corpusReport(docs.repartition(parts),
          "text", "source", "lang")
        .orderBy($"source")
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
      assert(got === Seq(
        ("A", 2L, 11L, 6L, 5L, meanA, 500000L, 500000L),
        ("B", 1L, 5L, 5L, 5L, e("pq rs tu vw xy"), 0L, 1000000L)),
        s"parts=$parts")
    }
  }
}
