package graft

import graft.functions.RollingHash64
import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** The classifier contract: exact-integer features and margins, and
  * DETERMINISTIC distributed training — the quantized-gradient loop must be
  * bit-identical to a single-core reference implementation and invariant to
  * input partitioning (what makes a 1000-executor training run auditable). */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32

  /** Same tokenization (lowercase, \s+ split) and FNV bucket as the engine. */
  private def buckets(text: String): Seq[Int] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      .map { t =>
        val h = RollingHash64.hashBytes(
          t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (((h % dim) + dim) % dim).toInt
      }

  /** Single-core mirror of Classifier.trainLogistic — quantized carriers,
    * Spark's HALF_UP rounding (BigDecimal.valueOf like the Round expr). */
  private def localTrain(docs: Seq[(Long, String, Int)], iters: Int,
                         lr: Double): Array[Long] = {
    val feats: Map[Long, Map[Int, Long]] = docs.map { case (id, text, _) =>
      id -> buckets(text).groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    }.toMap
    val label = docs.map(d => d._1 -> d._3).toMap
    val n = docs.size
    val w = new Array[Long](dim)
    def roundHalfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    for (_ <- 0 until iters) {
      val grad = new Array[Long](dim)
      for ((id, fs) <- feats) {
        val mE6 = fs.map { case (b, c) => c * w(b) }.sum
        val r = roundHalfUp(
          (1.0 / (1.0 + math.exp(-mE6 / 1e6)) - label(id)) * 1e6)
        for ((b, c) <- fs) grad(b) += r * c
      }
      for (b <- 0 until dim) w(b) -= math.round(lr * grad(b) / n)
    }
    w
  }

  private val corpus = Seq(
    (1L, "theorem proof lemma math theorem proof math lemma", 1),
    (2L, "proof math theorem lemma proof theorem", 1),
    (3L, "math lemma theorem proof proof math", 1),
    (4L, "court ruling appeal verdict court ruling", 0),
    (5L, "appeal verdict court ruling appeal court", 0),
    (6L, "verdict court appeal ruling verdict ruling appeal", 0))

  test("hashedBow: exact counts on the engine's FNV buckets") {
    val docs = corpus.take(1).toDF("doc_id", "text", "y")
    val got = Classifier.hashedBow(docs, "doc_id", "text", dim)
      .select($"__b", $"__cnt").as[(Int, Long)].collect().toMap
    val want = buckets(corpus.head._2).groupBy(identity)
      .map { case (b, o) => b -> o.size.toLong }
    assert(got == want)
  }

  test("marginScore: exact integer dot, missing buckets contribute zero") {
    val docs = corpus.toDF("doc_id", "text", "y")
    // weights cover only half the space: uncovered buckets must add 0
    val weights = spark.range(dim / 2)
      .select($"id".cast("int").as("bucket"), ($"id" * 7L - 50L).as("w_e3"))
    val wMap = (0 until dim / 2).map(b => b -> (b * 7L - 50L)).toMap
    val got = Classifier.marginScore(docs, "doc_id", "text", weights, dim)
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, m) => k -> ((n, m)) }.toMap
    for ((id, text, _) <- corpus) {
      val bs = buckets(text)
      val want = bs.map(b => wMap.getOrElse(b, 0L)).sum
      assert(got(id) == ((bs.size.toLong, want)), s"doc $id")
    }
  }

  test("trainLogistic: bit-identical to the local reference, partition-invariant, separates classes") {
    val docs = corpus.toDF("doc_id", "text", "y")
    val w1 = Classifier.trainLogistic(docs, "doc_id", "text", "y",
      dim, iters = 5, lr = 2.0)
    assert(w1.toSeq == localTrain(corpus, 5, 2.0).toSeq,
      "distributed training must equal the single-core reference bit-for-bit")
    val w2 = Classifier.trainLogistic(docs.repartition(13), "doc_id", "text",
      "y", dim, iters = 5, lr = 2.0)
    assert(w1.toSeq == w2.toSeq, "training must be partition-invariant")
    // the learned weights separate the planted classes on the training set
    val weights = spark.createDataFrame(
        w1.toSeq.zipWithIndex.map { case (w, b) => (b, w / 1000L) })
      .toDF("bucket", "w_e3")
    val margins = Classifier.marginScore(docs, "doc_id", "text", weights, dim)
      .select($"doc_id", $"margin_e3").as[(Long, Long)].collect().toMap
    val math_ = Seq(1L, 2L, 3L).map(margins)
    val legal = Seq(4L, 5L, 6L).map(margins)
    assert(math_.min > legal.max,
      s"positive class must outrank: math=$math_ legal=$legal")
  }

  // ---- multi-class language ID (r14) ----

  /** Local mirror of CharNgramFns.buckets: codepoint windows, FNV-1a over
    * each window's UTF-8 bytes, positive mod. */
  private def charBuckets(text: String, nMin: Int, nMax: Int,
                          d: Int): Seq[Int] = {
    val lowered = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      .trim().toLowerCase.toString
    val cps = lowered.codePoints().toArray
    for {
      n <- nMin to nMax
      i <- 0 to cps.length - n
    } yield {
      val h = RollingHash64.hashBytes(new String(cps, i, n)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (((h % d) + d) % d).toInt
    }
  }

  test("char_ngram_buckets kernel: codepoint windows == local mirror, incl. non-ASCII") {
    val battery = Seq("hello world", "  Héllo WÖRLD  ", "a🙂b" /* a🙂b */,
      "ab", "a", "", "ñandú çedilla")
    val df = battery.toDF("t")
    val got = df.select(graft.functions.CharNgramFns.charNgramBuckets(
        lower(trim($"t")), 2, 3, dim)).as[Seq[Int]].collect().toSeq
    val want = battery.map(t => charBuckets(t, 2, 3, dim))
    assert(got == want)
    // the emoji is ONE window position (one codepoint), not two UTF-16 units
    assert(charBuckets("a🙂b", 3, 3, dim).size == 1)
  }

  /** Deterministic planted "language": words over a per-language alphabet,
    * fixed-seed generator — languages differ exactly in character-sequence
    * statistics, the signal char-n-gram LID keys on. */
  private def plantedDoc(lang: Int, docIdx: Int): String = {
    val alphabet = "abcdefghijklmnopqrstuvwxyz".drop(lang * 7).take(7)
    val rnd = new scala.util.Random(lang * 10007 + docIdx)
    (0 until 25).map { _ =>
      (0 until 3 + rnd.nextInt(5))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.mkString(" ")
  }

  test("trainMulticlass: separates a planted trilingual corpus, " +
      "held-out prediction correct, partition-invariant") {
    val langs = Seq("aa", "bb", "cc")
    val train = (for {
      (l, li) <- langs.zipWithIndex
      d <- 0 until 20
    } yield (li * 100L + d, plantedDoc(li, d), l)).toDF("doc_id", "text", "lang")
    val model = Classifier.trainMulticlass(train, "doc_id", "text", "lang",
      nMin = 2, nMax = 3, dim = 128, iters = 6, lr = 2.0)
    assert(model.map(_._1) == langs, "labels in lexicographic order")
    // partition-invariance: the quantized carriers make the learned heads
    // bit-identical under any input layout
    val model2 = Classifier.trainMulticlass(train.repartition(7), "doc_id",
      "text", "lang", nMin = 2, nMax = 3, dim = 128, iters = 6, lr = 2.0)
    assert(model.map(_._2.toSeq) == model2.map(_._2.toSeq),
      "multiclass training must be partition-invariant")
    // held-out docs (unseen indices) classify correctly via argmax serve
    val heldOut = (for {
      (l, li) <- langs.zipWithIndex
      d <- 50 until 55
    } yield (1000L + li * 10 + d, plantedDoc(li, d), l))
    val w = Classifier.multiclassWeightsFrame(spark, model)
    val pred = Classifier.predictLanguage(
        heldOut.toDF("doc_id", "text", "lang"), "doc_id", "text", w,
        nMin = 2, nMax = 3, dim = 128)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    for ((id, _, l) <- heldOut)
      assert(pred(id) == l, s"doc $id: predicted ${pred(id)}, planted $l")
    // dense weights: n_grams is language-invariant and every scored doc
    // carries a margin for every language
    val m = Classifier.multiclassMargins(
      heldOut.toDF("doc_id", "text", "lang"), "doc_id", "text", w,
      nMin = 2, nMax = 3, dim = 128)
    val perDoc = m.groupBy($"doc_id")
      .agg(countDistinct($"lang").as("k"), countDistinct($"n_grams").as("g"))
      .as[(Long, Long, Long)].collect()
    assert(perDoc.forall(r => r._2 == 3 && r._3 == 1), perDoc.toSeq)
    // a gram-less doc (shorter than nMin codepoints) drops, the
    // occurrence-scorer convention
    assert(Classifier.predictLanguage(Seq((9L, "x")).toDF("doc_id", "text"),
      "doc_id", "text", w, nMin = 2, nMax = 3, dim = 128).isEmpty)
  }
}
