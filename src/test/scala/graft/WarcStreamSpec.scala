package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.io.Warc
import graft.operators.SyntheticWarc
import graft.streaming.WarcStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming WARC ingestion: the landing-dir watcher must deliver exactly
  * the documents the batch route extracts from the same files — across
  * micro-batches, through the HTTP-envelope path, and with a seen-store
  * admission sink staying idempotent when a capture file is re-uploaded. */
class WarcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def gz(recs: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(r); g.finish()
    }
    bos.toByteArray
  }

  test("stream docs == batch docs across micro-batches; re-uploaded file admits zero") {
    val tmp = Files.createTempDirectory("warcstream")
    val landing = tmp.resolve("landing"); Files.createDirectory(landing)
    val corpus = tmp.resolve("corpus").toString
    val fs = new org.apache.hadoop.fs.Path(corpus)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // seen-store admission sink: the existing foreachBatch seam — anti-join
    // arrivals against the corpus already written, append only the novel
    def sink(docs: DataFrame): Unit = {
      val fresh =
        if (fs.exists(new org.apache.hadoop.fs.Path(corpus)))
          docs.join(spark.read.parquet(corpus).select(col("url")),
            Seq("url"), "left_anti")
        else docs
      fresh.write.mode("append").parquet(corpus)
    }

    // wave 1: a WET-style file and a raw-HTTP-capture file
    Files.write(landing.resolve("w1.warc.gz"), gz(Seq(
      SyntheticWarc.record(1L, "first wet doc", wet = true),
      SyntheticWarc.record(2L, "second wet doc", wet = true))))
    Files.write(landing.resolve("w2.warc.gz"), gz(Seq(
      SyntheticWarc.httpRecord(10L, "http capture body"))))

    val q = WarcStream.run(spark, landing.toString,
      tmp.resolve("ckpt").toString, maxFilesPerTrigger = 1)(sink)
    try {
      q.processAllAvailable()
      val afterWave1 = spark.read.parquet(corpus)
        .select($"url").as[String].collect().toSet
      assert(afterWave1 == Set(1L, 2L, 10L).map(SyntheticWarc.uri), afterWave1)

      // wave 2: one novel file + a byte-identical RE-UPLOAD under a new name
      Files.write(landing.resolve("w3.warc.gz"), gz(Seq(
        SyntheticWarc.record(3L, "third wet doc", wet = true))))
      Files.write(landing.resolve("w1-reupload.warc.gz"), gz(Seq(
        SyntheticWarc.record(1L, "first wet doc", wet = true),
        SyntheticWarc.record(2L, "second wet doc", wet = true))))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(corpus)
    // admission held: the re-upload added nothing, urls stay unique
    assert(streamed.count() == 4)
    // stream == batch: the same files through the batch route, one row per url
    val batch = Warc.textDocs(Warc.records(spark, landing.toString)).toDF()
      .dropDuplicates("url")
    val s = streamed.select($"url", $"http_status", $"mime", $"text")
      .as[(String, Int, String, String)].collect().toSet
    val b = batch.select($"url", $"http_status", $"mime", $"text")
      .as[(String, Int, String, String)].collect().toSet
    assert(s == b, s"stream $s != batch $b")
    // the HTTP capture came through the envelope path, not as markup soup
    val http = streamed.filter($"url" === SyntheticWarc.uri(10L))
      .select($"text").as[String].head()
    assert(http == "http capture body")
  }

  test("streaming retrieval-index maintenance: per-batch Bm25 ticks == one-shot build") {
    // the serving index under the landing-dir watcher: each micro-batch
    // folds its documents in with Bm25.add and publishes the NEXT
    // generation (A/B alternation — a bucketed table cannot overwrite
    // itself while being read; the VersionedFactStore swap discipline on
    // catalog tables). The final generation must equal the one-shot build
    // over everything that landed — compute was batch-sized per tick, the
    // result is bit-for-bit the rebuild.
    val tmp = Files.createTempDirectory("warcstreambm25")
    val landing = tmp.resolve("landing"); Files.createDirectory(landing)
    spark.sql("DROP TABLE IF EXISTS bm25_stream_a_meta")
    spark.sql("DROP TABLE IF EXISTS bm25_stream_b_meta")
    var cur = "" // current published generation ("" = none yet)
    def sink(docs: DataFrame): Unit = {
      val batch = docs.select(xxhash64(col("url")).as("doc_id"),
        col("text"))
      if (batch.isEmpty) return
      val next =
        if (cur.isEmpty)
          graft.operators.Bm25.buildIndex(batch, "doc_id", "text")
        else graft.operators.Bm25.add(
          graft.operators.Bm25.Bm25Index.load(spark, cur), batch, "text")
      val nextName =
        if (cur == "bm25_stream_a") "bm25_stream_b" else "bm25_stream_a"
      next.save(nextName, nBuckets = 4)
      cur = nextName
    }
    Files.write(landing.resolve("t1.warc.gz"), gz(Seq(
      SyntheticWarc.record(1L, "alpha beta gamma retrieval", wet = true),
      SyntheticWarc.record(2L, "beta delta epsilon corpus", wet = true))))
    val q = WarcStream.run(spark, landing.toString,
      tmp.resolve("ckpt").toString, maxFilesPerTrigger = 1)(sink)
    try {
      q.processAllAvailable()
      Files.write(landing.resolve("t2.warc.gz"), gz(Seq(
        SyntheticWarc.record(3L, "gamma zeta alpha serving", wet = true))))
      q.processAllAvailable()
    } finally q.stop()
    val ticked = graft.operators.Bm25.Bm25Index.load(spark, cur)
    assert(ticked.nDocs == 3L)
    // one-shot twin over the same landed files, same id convention
    val batchDocs = Warc.textDocs(Warc.records(spark, landing.toString))
      .toDF().select(xxhash64(col("url")).as("doc_id"), col("text"))
    val oneShot = graft.operators.Bm25.buildIndex(batchDocs,
      "doc_id", "text")
    def value(i: graft.operators.Bm25.Bm25Index) = (
      i.tf.select($"doc_id", $"token", $"tf").as[(Long, String, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq,
      i.df.select($"token", $"df").as[(String, Long)].collect()
        .sorted.toSeq,
      i.nDocs, i.totTokens)
    assert(value(ticked) == value(oneShot))
    val queries = Seq((1L, "alpha gamma")).toDF("q_id", "q_text")
    assert(graft.operators.Bm25.search(ticked, queries, "q_id", "q_text",
        k = 3).orderBy($"rn").as[(Long, Int, Long, Long, Long)]
        .collect().toSeq ==
      graft.operators.Bm25.search(oneShot, queries, "q_id", "q_text",
        k = 3).orderBy($"rn").as[(Long, Int, Long, Long, Long)]
        .collect().toSeq)
    oneShot.release()
  }

  test("hostile landing-file names (comma + glob metacharacters) deliver intact") {
    // the micro-batch re-read goes through exact paths, never a
    // comma-joined glob string (r13 advice) — a file named `a,b{x}.warc`
    // must neither split into bogus paths nor glob-expand
    val tmp = Files.createTempDirectory("warcstream3")
    val landing = tmp.resolve("landing"); Files.createDirectory(landing)
    val seen = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def sink(docs: DataFrame): Unit =
      seen.synchronized {
        seen ++= docs.select($"url", $"text").as[(String, String)].collect()
      }
    Files.write(landing.resolve("a,b{x}[1]*c.warc.gz"), gz(Seq(
      SyntheticWarc.record(1L, "hostile stream doc", wet = true))))
    Files.write(landing.resolve("sane.warc.gz"), gz(Seq(
      SyntheticWarc.record(2L, "sane stream doc", wet = true))))
    val q = WarcStream.run(spark, landing.toString,
      tmp.resolve("ckpt").toString)(sink)
    try q.processAllAvailable() finally q.stop()
    assert(seen.toSet == Set(
      SyntheticWarc.uri(1L) -> "hostile stream doc",
      SyntheticWarc.uri(2L) -> "sane stream doc"), seen)
  }

  test("checkpoint restart: already-delivered files are not re-delivered") {
    val tmp = Files.createTempDirectory("warcstream2")
    val landing = tmp.resolve("landing"); Files.createDirectory(landing)
    val ckpt = tmp.resolve("ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def sink(docs: DataFrame): Unit =
      seen.synchronized { seen ++= docs.select($"url").as[String].collect() }

    Files.write(landing.resolve("a.warc.gz"), gz(Seq(
      SyntheticWarc.record(1L, "wave one doc", wet = true))))
    val q1 = WarcStream.run(spark, landing.toString, ckpt)(sink)
    try q1.processAllAvailable() finally q1.stop()
    assert(seen.toSeq == Seq(SyntheticWarc.uri(1L)))

    // a NEW query on the SAME checkpoint sees only files landed since
    Files.write(landing.resolve("b.warc.gz"), gz(Seq(
      SyntheticWarc.record(2L, "wave two doc", wet = true))))
    val q2 = WarcStream.run(spark, landing.toString, ckpt)(sink)
    try q2.processAllAvailable() finally q2.stop()
    assert(seen.toSeq == Seq(SyntheticWarc.uri(1L), SyntheticWarc.uri(2L)),
      s"restart re-delivered: $seen")
  }
}
