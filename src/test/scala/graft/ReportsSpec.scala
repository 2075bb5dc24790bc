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

  test("corpusReportFull: KL-vs-mix and top-token columns — exact values, " +
    "deterministic FNV tie-break, zero-token strata kept") {
    val docs = Seq(
      (1L, "x x x y z", "en", "A"),   // A: x=3, y=1, z=1
      (2L, "y y y y x", "zh", "B"),   // B: y=4, x=1
      (3L, "", "en", "Z"))            // zero-token stratum
      .toDF("doc_id", "text", "lang", "source")
    val got = Reports.corpusReportFull(docs, "text", "source", "lang", k = 2)
      .orderBy($"source")
      .select($"source", $"kl_vs_mix_e6", $"top_tokens")
      .as[(String, Long, String)].collect().toSeq
    // KL equals the standalone q106 operator (same exact e6 convention)
    val kl = graft.operators.DataMix.sourceTokenKl(docs, "text", "source")
      .orderBy($"source").select($"source", $"kl_e6")
      .as[(String, Long)].collect().toMap
    assert(got.map(r => (r._1, r._2)) ===
      Seq(("A", kl("A")), ("B", kl("B")), ("Z", 0L)))
    // top tokens: count DESC with the signed-FNV ASC tie-break on the 1-1 tie
    import graft.functions.RollingHash64
    def fnv(s: String): Long =
      RollingHash64.hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val aTie = if (fnv("y") < fnv("z")) "y:1" else "z:1"
    assert(got.map(_._3) === Seq(s"x:3,$aTie", "y:4,x:1", ""))
  }

  test("corpusReport: a stratum whose docs all tokenize to zero words still " +
    "renders (n_tokens = n_distinct_tokens = 0), not silently omitted") {
    // r9 ADVICE: the vocab frame has no row for such a stratum (explode of an
    // empty token list emits nothing), and an inner join would drop it from
    // the audit artifact — the one artifact meant to answer "what did we
    // train on". The render must LEFT-join and zero-fill instead.
    val docs = Seq(
      (1L, "ab cd ef", "en", "A"),
      (2L, "", "en", "Z"),
      (3L, "   ", "zh", "Z"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Reports.corpusReport(docs, "text", "source", "lang")
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.map(_._1) === Seq("A", "Z"))
    val z = got(1)
    assert((z._2, z._3, z._4, z._5) === ((2L, 0L, 0L, 0L)),
      s"zero-token stratum row: $z")
  }
}
