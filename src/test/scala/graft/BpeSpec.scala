package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE induction: the distributed learner must match a single-threaded
  * reference implementation of Sennrich's algorithm bit-for-bit (same rules,
  * same order), under any partitioning, including tie and overlap cases. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // --- single-threaded reference: learn + greedy merge application ---
  private def refMerge(sy: Vector[String], a: String, b: String): Vector[String] =
    sy.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  private def refLearn(wordCnt: Map[String, Long], n: Int): Seq[(String, String)] = {
    var words: Map[String, (Vector[String], Long)] = wordCnt.map { case (w, c) =>
      w -> ((w.map(_.toString).toVector :+ "</w>", c))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cont = true
    while (out.length < n && cont) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (sy, c)) <- words; i <- 0 until sy.length - 1) {
        val k = (sy(i), sy(i + 1))
        pc(k) = pc.getOrElse(k, 0L) + c
      }
      if (pc.isEmpty) cont = false
      else {
        val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a + " " + b) }._1
        out += best
        words = words.map { case (w, (sy, c)) =>
          w -> ((refMerge(sy, best._1, best._2), c))
        }
      }
    }
    out.toSeq
  }

  private def corpusOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("learn == single-threaded Sennrich reference, rule-for-rule in order") {
    val corpora = Seq(
      Seq("low low low low low", "lower lower", "newest newest newest",
        "widest widest widest widest widest widest"),
      // tie-dense: every word same count, forces the (count, pair) tie-break
      Seq("ab ab", "ba ba", "aa aa", "bb bb"),
      // overlap runs: counts include overlapping adjacents, merges don't
      Seq("aaaa aaaa aaaa", "aab aab"),
      Seq("to be or not to be that is the question"))
    for (texts <- corpora) {
      val docs = corpusOf(texts: _*)
      val wordCnt = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, l) => w -> l.size.toLong }
      val want = refLearn(wordCnt, 10)
      val got = Bpe.learn(docs, "text", 10)
      assert(got == want, s"corpus=$texts")
      // partitioning must not change the learned rules
      val gotPart = Bpe.learn(docs.repartition(7), "text", 10)
      assert(gotPart == want)
    }
  }

  test("learnLocal == distributed loop, rule-for-rule (the r17 fast path)") {
    val corpora = Seq(
      Seq("low low low lower lowest newest newest widest"),
      Seq("ab ab", "ba ba", "aa aa", "bb bb"), // tie-dense
      Seq("aaaa aaaa aab aab ab"),             // overlap runs
      // above-BMP symbols: the argmax tie-break must be UTF-8 byte order
      // (Spark's binary collation), not Java's UTF-16 order — U+FFFD
      // sorts BEFORE U+1D54F in UTF-8 (EF.. < F0..) but AFTER it in
      // UTF-16 (FFFD > D835), so a UTF-16 tie-break flips the rule order
      Seq("�z �z", "𝕏z 𝕏z"))
    for (texts <- corpora) {
      val docs = corpusOf(texts: _*)
      val wordCnt = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, l) => w -> l.size.toLong }
        .toArray
      val viaSpark = Bpe.learn(docs, "text", 12) // <= threshold: distributed
      val viaLocal = Bpe.learnLocal(wordCnt, 12)
      assert(viaLocal == viaSpark, s"corpus=$texts")
      // and the learn() dispatch itself takes the local path
      assert(Bpe.learn(docs, "text", 12, localThreshold = 1) == viaSpark,
        s"dispatch corpus=$texts")
    }
  }

  test("byte-level alphabet: closed — no OOV on arbitrary UTF-8, paths agree") {
    // GPT bytes_to_unicode shape: 256 symbols, all single code points,
    // printable bytes map to themselves
    val alpha = Bpe.byteAlphabet
    assert(alpha.size == 256 && alpha.distinct.size == 256)
    assert(alpha('a'.toInt) == "a" && alpha('!'.toInt) == "!")
    assert(alpha(0) == "Ā" && alpha(32) == "Ġ") // space -> Ġ
    // arbitrary UTF-8 (emoji, CJK, control, high bytes): every initial
    // symbol is in the closed alphabet ∪ {</w>}
    val nasty = Seq("héllo", "日本語", "🦑🦑", "ab", "�", "mix🦑日a")
    val syms = nasty.toDF("word")
      .select(Bpe.initSymbolsBytes($"word").as("s"))
      .as[Seq[String]].collect().flatten
    val closed = alpha.toSet + "</w>"
    assert(syms.forall(closed.contains), syms.filterNot(closed.contains))
    // byte-level learn: distributed == local, and encodeWords round-trips
    // the byte count (0 merges: n symbols = n UTF-8 bytes + 1)
    val docs = corpusOf("héllo héllo 日本 aa aa aa", "héllo 日本 🦑")
    val viaSpark = Bpe.learn(docs, "text", 8, byteLevel = true)
    val wordCnt = Seq("héllo" -> 3L, "日本" -> 2L, "aa" -> 3L, "🦑" -> 1L)
    assert(Bpe.learnLocal(wordCnt.toArray, 8, byteLevel = true) == viaSpark)
    val enc0 = Bpe.encodeWords(Seq("🦑a").toDF("word"), "word", Nil,
      byteLevel = true).select(size($"bpe")).as[Int].head()
    assert(enc0 == 6) // 4 bytes of U+1F991 + 1 of 'a' + </w>
  }

  test("learn local path refuses an over-budget word table loudly") {
    val docs = corpusOf("a b c d e f g h")
    val e = intercept[IllegalArgumentException] {
      Bpe.learn(docs, "text", 5, localThreshold = 1, maxLocalWords = 3L)
    }
    assert(e.getMessage.contains("driver-collect budget"))
  }

  test("applyMerge: greedy left-to-right non-overlapping scan") {
    // 4 a's: greedy pairs (1,2)(3,4) — never the [a, aa, a] grouping
    val out = Seq(Tuple1(Seq("a", "a", "a", "a", "</w>"))).toDF("syms")
      .select(Bpe.applyMerge($"syms", "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(out == Seq("aa", "aa", "</w>"))
    // a just-merged symbol is not a left side in the same pass
    val out2 = Seq(Tuple1(Seq("x", "y", "y", "</w>"))).toDF("syms")
      .select(Bpe.applyMerge($"syms", "x", "y").as("m"))
      .as[Seq[String]].head()
    assert(out2 == Seq("xy", "y", "</w>"))
  }

  test("encodeWords + tokenCount: distinct-word pricing matches reference") {
    val texts = Seq("low lower low", "newest low lowest", "   ", "low")
    val docs = corpusOf(texts: _*)
    val wordCnt = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, l) => w -> l.size.toLong }
    val merges = Bpe.learn(docs, "text", 6)
    // reference token count per doc
    def refEncode(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector :+ "</w>") { (sy, m) =>
        refMerge(sy, m._1, m._2)
      }
    val want = texts.zipWithIndex.flatMap { case (t, i) =>
      val ws = t.split("\\s+").filter(_.nonEmpty).toSeq
      if (ws.isEmpty) None
      else Some((i.toLong, ws.size.toLong, ws.map(w => refEncode(w).size.toLong).sum))
    }.toSet
    val got = Bpe.tokenCount(docs, "doc_id", "text", merges)
      .select($"doc_id", $"n_words", $"n_tokens_bpe")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // merges strictly reduce (or keep) every word's token count vs chars + 1
    val enc = Bpe.encodeWords(wordCnt.keys.toSeq.toDF("word"), "word", merges)
      .select($"word", size($"bpe")).as[(String, Int)].collect()
    for ((w, n) <- enc) assert(n >= 1 && n <= w.length + 1)
  }

  test("learn stops early when every word is fully merged") {
    val docs = corpusOf("aa aa aa")
    // "aa" + </w> = 3 symbols -> at most 2 merges possible
    val merges = Bpe.learn(docs, "text", 50)
    assert(merges.length == 2)
    val enc = Bpe.encodeWords(Seq("aa").toDF("word"), "word", merges)
      .select(size($"bpe")).as[Int].head()
    assert(enc == 1)
  }
}
