package graft

import graft.operators.{Classifier, NgramLm}
import graft.streaming.QualityGateStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming admission == batch curation: the gate must admit exactly the
  * documents the batch scorers admit (same operators, same thresholds), and
  * reject evidence-free (sub-two-token) docs — an admission gate fails
  * closed. */
class QualityGateStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream gate admits exactly the batch-admitted docs; tokenless rejected") {
    val dim = 32
    // in-domain training corpus: math-flavored vocabulary
    val trusted = Seq(
      (100L, "theorem proof lemma math theorem proof"),
      (101L, "proof math theorem lemma proof"),
      (102L, "math lemma theorem proof math")).toDF("doc_id", "text")
    val lm = NgramLm.trainBigram(trusted, "text")
    // classifier: reward buckets seen in the trusted corpus, punish the rest
    val trustedBuckets = Classifier.hashedBow(trusted, "doc_id", "text", dim)
      .select($"__b").distinct().as[Int].collect().toSet
    val weights = spark.range(dim).select($"id".cast("int").as("bucket"),
      when($"id".isInCollection(trustedBuckets.map(_.toLong)), 100L)
        .otherwise(-100L).as("w_e3"))

    val arrivals = Seq(
      (1L, "theorem proof lemma math proof"),     // in-domain -> admit
      (2L, "proof theorem math lemma theorem"),   // in-domain -> admit
      (3L, "court ruling appeal verdict court ruling appeal"), // off-domain
      (4L, "x"),                                  // no bigram evidence -> reject
      (5L, ""))                                   // tokenless -> reject
    val arrivalsDf = arrivals.toDF("doc_id", "text")

    // thresholds from the BATCH scorers: admit docs the batch pipeline keeps
    val batchNll = NgramLm.scoreBigram(arrivalsDf, "doc_id", "text", lm)
    val batchMargin = Classifier.marginScore(
      arrivalsDf, "doc_id", "text", weights, dim)
    val maxNll = 3000000L
    val minMargin = 0L
    val batchAdmitted = batchNll.filter($"avg_nll_e6" <= maxNll)
      .join(batchMargin.filter($"margin_e3" >= minMargin), "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(batchAdmitted == Set(1L, 2L),
      s"test premise: batch admits exactly the in-domain docs, got $batchAdmitted")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[Long]()
    val ckpt = java.nio.file.Files.createTempDirectory("gate-ckpt").toString
    val q = QualityGateStream.run(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", lm, weights, dim, maxNll, minMargin, ckpt) { admitted =>
      got ++= admitted.select(col("doc_id")).as[Long].collect()
      ()
    }
    try {
      input.addData(arrivals.take(3): _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(3): _*)   // second micro-batch: edge docs
      q.processAllAvailable()
      assert(got.toSet == batchAdmitted,
        s"stream must admit exactly the batch-admitted set, got ${got.toSet}")
    } finally q.stop()
  }

  test("gopher gate: repetition-flagged docs are rejected in-flight") {
    val dim = 32
    val trusted = Seq(
      (100L, "theorem proof lemma math theorem proof"),
      (101L, "proof math theorem lemma proof")).toDF("doc_id", "text")
    val lm = NgramLm.trainBigram(trusted, "text")
    // permissive classifier: every bucket positive — only the batteries gate
    val weights = spark.range(dim).select($"id".cast("int").as("bucket"),
      lit(100L).as("w_e3"))
    val arrivals = Seq(
      // long + diverse: no concentration flag fires -> admit
      (1L, (1 to 40).map(i => s"word$i").mkString(" ")),
      // top-2-gram 'theorem proof' dominates chars -> q98 battery drops it
      (2L, ("theorem proof " * 12).trim))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[Long]()
    val ckpt = java.nio.file.Files.createTempDirectory("gate-ckpt2").toString
    val q = QualityGateStream.run(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", lm, weights, dim, maxAvgNllE6 = 50000000L,
        minMarginE3 = Long.MinValue, ckpt, gopher = true) { admitted =>
      got ++= admitted.select(col("doc_id")).as[Long].collect()
      ()
    }
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      assert(got.toSet == Set(1L),
        s"gopher gate must drop the repetition-flooded doc, got ${got.toSet}")
      // the stream gate must equal the batch batteries' verdicts exactly
      val arrivalsDf = arrivals.toDF("doc_id", "text")
      val batchKeep = graft.operators.GopherRules
        .battery(arrivalsDf, "doc_id", "text", minWords = 0).filter($"keep")
        .join(graft.operators.GopherRules
          .ngramBattery(arrivalsDf, "doc_id", "text").filter($"keep"),
          "doc_id")
        .select($"doc_id").as[Long].collect().toSet
      assert(got.toSet == batchKeep)
    } finally q.stop()
  }

  test("normalize + entropy gate: accented text canonicalized in-flight, mash rejected") {
    val dim = 32
    val trusted = Seq(
      (100L, "theorem proof lemma math theorem proof"),
      (101L, "proof math theorem lemma proof")).toDF("doc_id", "text")
    val lm = NgramLm.trainBigram(trusted, "text")
    val weights = spark.range(dim).select($"id".cast("int").as("bucket"),
      lit(100L).as("w_e3"))
    val arrivals = Seq(
      // accented, double-spaced in-domain doc: normalization must restore
      // the canonical tokens BEFORE LM scoring, or the bigrams miss the LM
      (1L, "théorem  próof  lémma  máth  théorem  próof"),
      // one-character mash: the q103 entropy floor rejects it
      (2L, ("aa " * 30).trim))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, String]()
    val ckpt = java.nio.file.Files.createTempDirectory("gate-ckpt3").toString
    val q = QualityGateStream.run(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", lm, weights, dim, maxAvgNllE6 = 4000000L,
        minMarginE3 = Long.MinValue, ckpt, normalize = true,
        minCharEntropyE6 = 1500000L) { admitted =>
      got ++= admitted.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect()
      ()
    }
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      assert(got.keySet == Set(1L),
        s"expected the normalized in-domain doc only, got ${got.keySet}")
      // the sunk text is the canonical form (accents gone, spaces collapsed)
      assert(got(1L) == "theorem proof lemma math theorem proof")
    } finally q.stop()
  }
}
