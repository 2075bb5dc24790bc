package graft.jobs

import graft.functions.{TextFns, TextStatsExpr}
import graft.operators.{DataMix, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLI for the end-to-end training-corpus curation pipeline — the job a user of
  * the dedup/quality/mixture operators actually runs: quality gate -> near-dup
  * corpus dedup (exact Jaccard, transitive clusters, min-id survivors) -> PII
  * scrub -> deterministic mixture sampling -> partitioned parquet, with a
  * per-stage audit line. Batch analog of the `DedupStream` admission path; the
  * reference's job layer (config JSON + CLI + S13 idempotence gate) applied to
  * the beyond-reference operator surface.
  *
  * Config JSON:
  * {
  *   "documents_path": "<parquet (id, text, ...)>",
  *   "output_path": "<dir>",
  *   "id_col": "doc_id", "text_col": "text",
  *   "min_words": 20,                  // quality gate
  *   "ngram_n": 3, "jaccard_threshold": 0.8,
  *   "block_cols": ["lang"],           // dedup blocking
  *   "redact_pii": true,
  *   "partition_by": ["lang"],         // output layout
  *   "mix_strata_col": "source",       // optional mixture step
  *   "mix_fractions": {"src0": 1.0, "src1": 0.5}
  * }
  * Usage: CurationJob <config.json>
  *
  * Every stage is one of the audited operators (native text kernels, PPJoin
  * prefix-filter dedup, Knuth-hash sampling) — the composition adds no new
  * shuffle beyond what the stages themselves own. */
object CurationJob {

  case class Stats(input: Long, afterQuality: Long, afterDedup: Long,
                   output: Long)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args(0))
    finally spark.stop()
  }

  /** Returns per-stage row counts (None = output existed, S13 skip). */
  def run(spark: SparkSession, cfgPath: String): Option[Stats] = {
    val cfg = spark.read.option("multiLine", true).json(cfgPath).first()
    def str(f: String, d: String): String =
      if (cfg.schema.fieldNames.contains(f) && !cfg.isNullAt(cfg.fieldIndex(f)))
        cfg.get(cfg.fieldIndex(f)).toString else d
    def strSeq(f: String): Seq[String] =
      if (cfg.schema.fieldNames.contains(f) && !cfg.isNullAt(cfg.fieldIndex(f)))
        cfg.getSeq[String](cfg.fieldIndex(f)) else Nil
    val outPath = cfg.getAs[String]("output_path")
    if (!Maintenance.shouldRun(outPath)) return None

    val idCol = str("id_col", "doc_id")
    val textCol = str("text_col", "text")
    val docs = spark.read.parquet(cfg.getAs[String]("documents_path"))
    val input = docs.count()

    // 1. quality gate: native one-pass word count
    val gated = docs.filter(
      TextStatsExpr(col(textCol), Nil)("n_words") >= str("min_words", "20").toLong)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterQuality = gated.count()

    // 2. near-dup corpus dedup (subsumes exact dups at jaccard 1.0)
    val deduped = Dedup.dedupedCorpus(gated, idCol, textCol,
      n = str("ngram_n", "3").toInt,
      threshold = str("jaccard_threshold", "0.8").toDouble,
      blockCols = strSeq("block_cols"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterDedup = deduped.count()

    // 3. PII scrub
    val scrubbed =
      if (str("redact_pii", "true").toBoolean)
        deduped.withColumn(textCol, TextFns.redactPii(col(textCol)))
      else deduped

    // 4. optional deterministic mixture sampling
    val mixCol = str("mix_strata_col", "")
    val mixed =
      if (mixCol.nonEmpty && cfg.schema.fieldNames.contains("mix_fractions") &&
        !cfg.isNullAt(cfg.fieldIndex("mix_fractions"))) {
        val fracRow = cfg.getStruct(cfg.fieldIndex("mix_fractions"))
        val fractions = fracRow.schema.fieldNames.map(k =>
          k -> fracRow.get(fracRow.fieldIndex(k)).toString.toDouble).toMap
        DataMix.stratifiedSample(scrubbed, idCol, mixCol, fractions)
      } else scrubbed

    // 5. partitioned parquet sink
    val parts = strSeq("partition_by")
    val writer = mixed.write.mode("overwrite")
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
      .parquet(outPath)
    val output = spark.read.parquet(outPath).count()

    gated.unpersist(); deduped.unpersist()
    val stats = Stats(input, afterQuality, afterDedup, output)
    System.err.println(s"[curate] $stats")
    Some(stats)
  }
}
