package graft

import org.apache.spark.sql.functions._

/** q141's serving-cache validation contract (r16): freshness is a CONTENT
  * fingerprint, not a row count — a regenerated corpus with the same
  * cardinality but different text/vectors must rebuild both standing
  * indexes, while a repeat call over unchanged data must serve without
  * touching them. Rebuild-vs-serve is observed at the artifact layer (the
  * overwrite writes new part files; a served call leaves the file set
  * untouched), so the spec pins behavior, not implementation counters. */
class ServeCacheSpec extends SparkSpec {
  import spark.implicits._

  private def writeCorpus(dir: String, salt: String): Unit = {
    (0L until 200L).map { i =>
      val ws = (0 until 12).map(j => s"w${(i * 7 + j * 3) % 50}$salt")
      (i, ws.mkString(" "), "en", s"src${i % 4}")
    }.toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0L until 200L).map { i =>
      (i, Array.tabulate(64)(d =>
        (math.sin(i * 0.37 + d * 1.13 + salt.length) * 0.5 + 0.5).toFloat))
    }.toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def fileSet(path: String): Set[String] = {
    val f = new java.io.File(path)
    if (!f.exists()) Set.empty
    else f.listFiles().filter(_.isFile).map(_.getName)
      .filterNot(n => n.startsWith(".") || n.endsWith(".crc")).toSet
  }

  test("q141: unchanged corpus serves; same-count different-content rebuilds") {
    val dir = java.nio.file.Files.createTempDirectory("q141cache").toString
    writeCorpus(dir, salt = "")
    val dname = new java.io.File(dir).getName.replace('.', '_')
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      .getPath.stripSuffix("/")
    val q = SparkEntry.queries("q141_hybrid_served")

    val first = q(spark, dir).collect()
    assert(first.nonEmpty)
    val tfDir = s"$wh/graft_q141_bm25_${dname}_tf"
    val denseFpDir = s"$wh/graft_q141_ivfpq_$dname/fp"
    val tf1 = fileSet(tfDir)
    val dfp1 = fileSet(denseFpDir)
    assert(tf1.nonEmpty && dfp1.nonEmpty, "indexes must persist under the warehouse")

    // repeat call on unchanged data: SERVES — no artifact is rewritten
    val second = q(spark, dir).collect()
    assert(second.map(_.toString).toSeq == first.map(_.toString).toSeq)
    assert(fileSet(tfDir) == tf1, "unchanged corpus must not rebuild the BM25 index")
    assert(fileSet(denseFpDir) == dfp1, "unchanged corpus must not rebuild the dense index")

    // regenerate with the SAME row counts but different content: the old
    // count-only check served stale rankings here — the fingerprint rebuilds
    writeCorpus(dir, salt = "x")
    val third = q(spark, dir).collect()
    assert(third.nonEmpty)
    assert(fileSet(tfDir) != tf1, "different content must rebuild the BM25 index")
    assert(fileSet(denseFpDir) != dfp1, "different content must rebuild the dense index")
  }
}
