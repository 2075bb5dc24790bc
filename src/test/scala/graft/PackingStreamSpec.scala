package graft

import graft.operators.{Bpe, Packing}
import graft.streaming.PackingStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming tokenized export == the one-shot batch export: pieces cut
  * across micro-batches under the frozen day-one tokenizer must be
  * bit-identical to `tokenizedCorpus` over the whole corpus when docs
  * arrive in id order — including the bin that straddles the batch
  * boundary (the carry-state seam). Plus the frozen-vocab OOV contract
  * and the replay veto. */
class PackingStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "ab ab", "s0"), (2L, "a", "s0"), (3L, "  ", "s0"),
    (4L, "ab a ab", "s0"), (5L, "ab", "s1"), (6L, "a a a ab", "s1"),
    (7L, "b ab ab", "s0"), (8L, "ab ab ab", "s1"))

  test("streamed pieces across ticks == one-shot tokenizedCorpus") {
    val docs = corpus.toDF("doc_id", "text", "source")
    val merges = Bpe.learn(docs, "text", 2)
    val (oneShot, vocab) = Packing.tokenizedCorpus(docs, "doc_id", "text",
      Seq("source"), tokenBudget = 7L, merges)
    val want = oneShot
      .select($"doc_id", $"source", $"chunk_idx", $"n_tokens_bpe",
        $"bin_id", $"offset_tokens", $"token_ids")
      .as[(Long, String, Long, Long, Long, Long, Option[Seq[Int]])]
      .collect().toSet
    // the straddle matters: at budget 7 at least one shard's stream must
    // cross a bin boundary BETWEEN the two batches (ids 1-4 vs 5-8)
    assert(want.exists(r => r._1 >= 5L && r._6 != 0L),
      s"fixture lost its cross-batch straddle: $want")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val outDir = java.nio.file.Files.createTempDirectory("packstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("packstream-ck").toString
    val ticks = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = PackingStream.run(
        input.toDF().toDF("doc_id", "text", "source"),
        "doc_id", "text", Seq("source"), tokenBudget = 7L, merges, vocab,
        outDir, ckpt) { (id, dir) => ticks += ((id, dir)); () }
    try {
      input.addData(corpus.filter(_._1 <= 4L): _*)
      q.processAllAvailable()
      input.addData(corpus.filter(_._1 > 4L): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(ticks.map(_._1).toSeq == Seq(0L, 1L))
    val got = PackingStream.pieces(spark, outDir)
      .select($"doc_id", $"source", $"chunk_idx", $"n_tokens_bpe",
        $"bin_id", $"offset_tokens", $"token_ids")
      .as[(Long, String, Long, Long, Long, Long, Option[Seq[Int]])]
      .collect().toSet
    assert(got == want,
      "continuous export must equal the one-shot batch export")
    // the batch id surfaces as a partition column, split where the ticks
    // fell
    val byBatch = PackingStream.pieces(spark, outDir)
      .groupBy($"batch").agg(max($"doc_id").as("m"), min($"doc_id").as("n"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(byBatch.map(_._1).toSet == Set(0L, 1L))
    // the streamed corpus certifies under the SAME manifest as the
    // one-shot export — including the bin whose content arrived in two
    // different ticks
    assert(PackingStream.manifest(spark, outDir, "doc_id", Seq("source"))
        .select($"source", $"bin_id", $"n_pieces", $"n_tokens",
          $"content_sha")
        .as[(String, Long, Long, Long, String)].collect().toSet ==
      Packing.shardManifest(oneShot, "doc_id", Seq("source"))
        .select($"source", $"bin_id", $"n_pieces", $"n_tokens",
          $"content_sha")
        .as[(String, Long, Long, Long, String)].collect().toSet)
    graft.operators.Dedup.release(oneShot)
  }

  test("frozen vocab: unseen symbols encode as UNK id 0, counted per doc") {
    val train = corpus.toDF("doc_id", "text", "source")
    val merges = Bpe.learn(train, "text", 2)
    val vocab = Packing.encodeIdsWithVocab(train, "doc_id", "text",
      merges)._2
    // 'z' and 'q' never appear in training; 'ab' does
    val enc = Packing.encodeIdsFrozen(
        Seq((100L, "zq ab")).toDF("doc_id", "text"),
        "doc_id", "text", merges, vocab)
      .select($"token_ids", $"n_oov").as[(Seq[Int], Long)].head()
    assert(enc._2 == 2L, s"z and q must both count as OOV: $enc")
    assert(enc._1.count(_ == 0) == 2)
    // the known word still resolves to its day-one ids (non-zero)
    assert(enc._1.count(_ > 0) >= 2)
    // realized-vocab ids are 1-based, so 0 is genuinely reserved
    assert(vocab.agg(min($"token_id")).as[Int].head() == 1)
  }

  test("byte-level closed vocab: no input can OOV, stream ticks stay UNK-free") {
    val train = corpus.toDF("doc_id", "text", "source")
    val merges = Bpe.learn(train, "text", 2, byteLevel = true)
    val vocab = Bpe.closedVocab(spark, merges)
    // the closed table: 256 base symbols + </w> + each merge output,
    // dense 1-based ids in token sort order
    val v = vocab.as[(String, Int)].collect().toSeq
    assert(v.size == 257 + merges.map { case (a, b) => a + b }.distinct.size)
    assert(v.map(_._2).sorted == (1 to v.size))
    assert(v.sortBy(_._2).map(_._1) == v.map(_._1).sorted)
    // a realized vocab would UNK on all of these; the closed one cannot:
    // emoji (4-byte UTF-8), CJK, control bytes, unseen latin
    val wild = Seq((100L, "été 😀 中文 zq", "s0"))
    val enc = Packing.encodeIdsFrozen(wild.toDF("doc_id", "text", "source"),
        "doc_id", "text", merges, vocab, byteLevel = true)
      .select($"token_ids", $"n_oov").as[(Seq[Int], Long)].head()
    assert(enc._2 == 0L, s"closed vocab must never OOV: $enc")
    assert(enc._1.nonEmpty && enc._1.forall(_ > 0))
    // the streaming tick under the closed vocab: day-two wild bytes pack
    // cleanly and continue the day-one stream
    val outDir = java.nio.file.Files.createTempDirectory("packbyte").toString
    def tick(b: Seq[(Long, String, String)], id: Long): Unit =
      PackingStream.applyTick(b.toDF("doc_id", "text", "source"), id,
        "doc_id", "text", Seq("source"), 7L, merges, vocab, outDir,
        "inc-b", (_, _) => (), byteLevel = true)
    tick(corpus.filter(_._1 <= 4L), 0L)
    tick(wild, 1L)
    val pieces = PackingStream.pieces(spark, outDir)
      .select($"doc_id", $"token_ids").as[(Long, Option[Seq[Int]])]
      .collect()
    assert(pieces.exists(_._1 == 100L))
    assert(pieces.flatMap(_._2).flatten.forall(_ > 0),
      "no UNK id may appear anywhere in the byte-level stream")
    // one-shot twin under the SAME closed vocab reproduces the stream
    val (oneShot, _) = Packing.tokenizedBatch(
      (corpus.filter(_._1 <= 4L) ++ wild).toDF("doc_id", "text", "source"),
      "doc_id", "text", Seq("source"), 7L, merges, vocab,
      Seq.empty[(String, Long)].toDF("source", "base_tokens"),
      byteLevel = true)
    assert(PackingStream.pieces(spark, outDir)
      .select($"doc_id", $"chunk_idx", $"bin_id", $"offset_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet ==
      oneShot.select($"doc_id", $"chunk_idx", $"bin_id", $"offset_tokens")
        .as[(Long, Long, Long, Long)].collect().toSet)
    graft.operators.Dedup.release(oneShot)
  }

  test("replay veto: a re-delivered batch id no-ops; state generations alternate") {
    val docs = corpus.toDF("doc_id", "text", "source")
    val merges = Bpe.learn(docs, "text", 2)
    val vocab = Packing.encodeIdsWithVocab(docs, "doc_id", "text",
      merges)._2
    val outDir = java.nio.file.Files.createTempDirectory("packtick").toString
    var fired = 0
    def tick(b: Seq[(Long, String, String)], id: Long): Unit =
      PackingStream.applyTick(b.toDF("doc_id", "text", "source"), id,
        "doc_id", "text", Seq("source"), 7L, merges, vocab, outDir,
        "inc-1", (_, _) => { fired += 1; () })
    tick(corpus.filter(_._1 <= 4L), 0L)
    val after0 = PackingStream.pieces(spark, outDir).count()
    // replay of the APPLIED batch: the data no-ops, but onTick re-fires —
    // the crash-between-marker-and-commit window must not lose the
    // announcement (at-least-once)
    tick(corpus.filter(_._1 <= 4L), 0L)
    assert(fired == 2 &&
      PackingStream.pieces(spark, outDir).count() == after0)
    tick(corpus.filter(_._1 > 4L), 1L)
    assert(fired == 3)
    val after1 = PackingStream.pieces(spark, outDir).count()
    // replay of batch 1 (now the live generation): announce-only again
    tick(corpus.filter(_._1 > 4L), 1L)
    assert(fired == 4 &&
      PackingStream.pieces(spark, outDir).count() == after1)
    // a STALE id behind the live generation stays fully silent
    tick(corpus.filter(_._1 <= 4L), 0L)
    assert(fired == 4)
    // checkpoint wiped but outDir kept (a FOREIGN incarnation over
    // standing markers): the cumulative sink must refuse rather than
    // silently restart bin numbering over the old incarnation's pieces
    val ex = intercept[IllegalArgumentException] {
      PackingStream.applyTick(
        corpus.filter(_._1 <= 4L).toDF("doc_id", "text", "source"), 0L,
        "doc_id", "text", Seq("source"), 7L, merges, vocab, outDir,
        "inc-wiped", (_, _) => ())
    }
    assert(ex.getMessage.contains("incarnation"))
    // ...but our OWN interrupted FIRST marker write (a committer skeleton:
    // the applied dir exists with no committed parquet) must read as "no
    // marker yet" and recover via the replay, not trip the foreign guard
    val fresh = java.nio.file.Files.createTempDirectory("packpart").toString
    assert(new java.io.File(s"$fresh/_stateA/applied/_temporary").mkdirs())
    PackingStream.applyTick(
      corpus.filter(_._1 <= 4L).toDF("doc_id", "text", "source"), 0L,
      "doc_id", "text", Seq("source"), 7L, merges, vocab, fresh,
      "inc-rec", (_, _) => ())
    assert(PackingStream.pieces(spark, fresh).count() > 0)
    // both generations exist and the pieces equal the one-shot export
    // (the same equality the streaming test pins — here via raw ticks)
    val (oneShot, _) = Packing.tokenizedCorpus(docs, "doc_id", "text",
      Seq("source"), 7L, merges)
    assert(PackingStream.pieces(spark, outDir)
      .select($"doc_id", $"chunk_idx", $"bin_id", $"offset_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet ==
      oneShot.select($"doc_id", $"chunk_idx", $"bin_id", $"offset_tokens")
        .as[(Long, Long, Long, Long)].collect().toSet)
    graft.operators.Dedup.release(oneShot)
  }
}
