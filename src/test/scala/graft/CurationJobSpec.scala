package graft

import java.nio.file.Files

import graft.jobs.CurationJob
import org.apache.spark.sql.functions._

/** End-to-end curation CLI: quality gate, near-dup corpus dedup, PII scrub,
  * mixture sampling, partitioned sink, S13 idempotence. */
class CurationJobSpec extends SparkSpec {
  import spark.implicits._

  test("curation job gates, dedups, scrubs, samples, and writes partitioned parquet") {
    val dir = Files.createTempDirectory("curation")
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, s"$filler contact me at alice@example.com today", "en", "src0"),
      (2L, s"$filler contact me at alice@example.com today", "en", "src0"), // dup of 1
      (3L, s"$filler entirely different content about rivers", "en", "src0"),
      (4L, "too short", "en", "src0"),                                      // quality-gated
      (5L, s"$filler ganz anderer deutscher inhalt über flüsse", "de", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/docs")
    Files.writeString(dir.resolve("cfg.json"),
      s"""{"documents_path": "$dir/docs", "output_path": "$dir/out",
         | "min_words": 20, "ngram_n": 3, "jaccard_threshold": 0.8,
         | "block_cols": ["lang"], "redact_pii": true,
         | "partition_by": ["lang"],
         | "mix_strata_col": "source", "mix_fractions": {"src0": 1.0, "src1": 1.0}}"""
        .stripMargin)
    val stats = CurationJob.run(spark, s"$dir/cfg.json").get
    assert(stats.input == 5 && stats.afterQuality == 4 &&
      stats.afterDedup == 3 && stats.output == 3)
    val out = spark.read.parquet(s"$dir/out")
    // survivor of the {1,2} cluster is min-id 1; PII scrubbed in place
    val kept = out.select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
    val texts = out.filter($"doc_id" === 1L).select($"text").as[String].head()
    assert(texts.contains("[EMAIL]") && !texts.contains("alice@example.com"))
    // partitioned layout
    assert(Files.exists(dir.resolve("out/lang=en")))
    // S13: second tick skips
    assert(CurationJob.run(spark, s"$dir/cfg.json").isEmpty)
  }
}
