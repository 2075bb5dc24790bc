package graft

import graft.operators.{DataMix, GopherRules}
import org.apache.spark.sql.functions._

/** Gopher line-repetition battery + DSIR importance resampling. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String) =
    Seq((1L, text)).toDF("id", "text")
      .select(GopherRules.lineRepetitionStruct(col("text")).as("r"))
      .select("r.*").as[(Long, Long, Long, Long)].head()

  test("lineRepetitionStruct: counts every occurrence of a duplicated line") {
    // 'aa' x3 (6 chars), 'b' x1, 'cc' x2 (4 chars) -> 5 of 6 lines dup'd,
    // 10 of 11 chars in duplicated lines
    assert(stats("aa\nb\naa\ncc\naa\ncc") === ((6L, 5L, 11L, 10L)))
  }

  test("lineRepetitionStruct: no duplicates, empty lines dropped") {
    assert(stats("x\n\ny\n\nz") === ((3L, 0L, 3L, 0L)))
    assert(stats("") === ((0L, 0L, 0L, 0L)))
  }

  test("topWordStruct: strict-greater keeps the lexicographically first max") {
    // 'bb' and 'aa' both x2: champion must be 'aa' (sorted order, strictly
    // greater displaces) -> top_word_chars = 2*2 = 4
    val r = Seq((1L, "bb aa bb aa z")).toDF("id", "text")
      .select(GopherRules.topWordStruct(col("text")).as("r"))
      .select("r.*").as[(Long, Long, Long, Long)].head()
    assert(r === ((5L, 9L, 2L, 4L)))
  }

  test("battery: flags fire strictly above the integer thresholds") {
    // doc a: 10 lines, 3 dup (30% == threshold, NOT flagged)
    // doc b: 10 lines, 4 dup (40% > 30%, flagged)
    val a = (Seq.fill(3)("dup dup") ++ (1 to 7).map(i => s"u$i u$i'")).mkString("\n")
    val b = (Seq.fill(4)("dup dup") ++ (1 to 6).map(i => s"u$i u$i'")).mkString("\n")
    val out = GopherRules.battery(
        Seq((1L, a), (2L, b)).toDF("id", "text"), "id", "text",
        maxDupLinePct = 30, maxDupCharPct = 100, maxTopWordPct = 100,
        minWords = 0)
      .select("id", "flag_dup_lines").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> false, 2L -> true))
  }

  test("battery: word-count rule is the only flag an empty doc trips") {
    val out = GopherRules.battery(Seq((1L, "")).toDF("id", "text"),
        "id", "text", minWords = 1)
      .select("flag_dup_lines", "flag_dup_chars", "flag_top_word",
        "flag_word_count", "keep")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].head()
    assert(out === ((false, false, false, true, false)))
  }

  test("chunkIntoLines: exact multiples, remainders, empty text") {
    val f = (t: String) => Seq((1L, t)).toDF("id", "text")
      .select(GopherRules.chunkIntoLines(col("text"), 3).as("l"))
      .as[String].head()
    assert(f("a b c d e f") === "a b c\nd e f")
    assert(f("a b c d") === "a b c\nd")
    assert(f("a") === "a")
    assert(f("") === "")
  }

  test("chunkIntoLines: regex form == slice-fold reference on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(1, 8, 13)) {
      val diff = docs.select(
          GopherRules.chunkIntoLines(col("text"), n).as("a"),
          GopherRules.chunkIntoLinesCols(col("text"), n).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff === 0L, s"wordsPerLine=$n")
    }
  }

  test("dropRepeatedLines: first occurrence survives in place, repeats go") {
    val out = GopherRules.dropRepeatedLines(
        Seq((1L, "a\nb\na\nc\nb\na"), (2L, "x\ny"), (3L, "")).toDF("id", "text"),
        "text")
      .select("id", "text", "n_removed").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(out(0) === ((1L, "a\nb\nc", 3L)))
    assert(out(1) === ((2L, "x\ny", 0L)))
    assert(out(2) === ((3L, "", 0L)))
  }

  test("LineStatsExpr: native battery == column-fold battery, real docs + adversarial") {
    // real corpus (with the q90 plant shape) plus hand-built edge cases:
    // ties, unicode (code-point lengths, non-ASCII lowercase), empties,
    // whitespace runs, single repeated word
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"),
        GopherRules.chunkIntoLines(col("text"), 8).as("text"))
    val edge = Seq(
      (100001L, "bb aa bb aa z"), (100002L, ""), (100003L, "   \n\t\n  "),
      (100004L, "aa\nb\naa\ncc\naa\ncc"), (100005L, "Été été café\nété café\nété café"),
      (100006L, "w w w w w"), (100007L, "a\n\n\na\nb"),
      (100008L, "😀 x\n😀 x\ny"))
      .toDF("id", "text")
    for (docs <- Seq(real, edge)) {
      val native = GopherRules.battery(docs, "id", "text", minWords = 0)
      val ref = GopherRules.battery(docs, "id", "text", minWords = 0,
        native = false)
      assert(native.columns.sameElements(ref.columns))
      assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
        s"native battery diverged from the fold reference: " +
          native.exceptAll(ref).limit(3).collect().mkString(" | "))
    }
  }

  test("LineScrubExpr: native scrub == array_position reference, real docs + edges") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"),
        GopherRules.chunkIntoLines(col("text"), 8).as("text"))
    val edge = Seq(
      (1L, "a\nb\na\nc\nb\na"), (2L, "x\ny"), (3L, ""), (4L, "\n\n\n"),
      (5L, "café\ncafé\n😀"), (6L, "only"))
      .toDF("id", "text")
    for (docs <- Seq(real, edge)) {
      val native = GopherRules.dropRepeatedLines(docs, "text")
      val ref = GopherRules.dropRepeatedLines(docs, "text", native = false)
      assert(native.columns.sameElements(ref.columns))
      assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
        s"native scrub diverged from the reference: " +
          native.exceptAll(ref).limit(3).collect().mkString(" | "))
    }
  }

  test("NgramRepetitionExpr == independent Scala reference (ties, unicode, edges)") {
    // reference implemented with idiomatic collections (sliding/groupBy),
    // structurally unlike the expression's while-loops — an independent
    // derivation of the same contract
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val m = math.min(x.length, y.length)
      var i = 0
      while (i < m) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
    def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    def ref(text: String): Seq[Long] = {
      val ws = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val wordChars = ws.map(cp).sum
      val tops = (2 to 4).flatMap { n =>
        val counts = if (ws.length < n) Map.empty[String, Long]
          else ws.sliding(n).map(_.mkString(" ")).toSeq
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
        if (counts.isEmpty) Seq(0L, 0L)
        else {
          val best = counts.values.max
          val gram = counts.filter(_._2 == best).keys
            .reduce((a, b) => if (utf8Lt(a, b)) a else b)
          Seq(best, best * cp(gram))
        }
      }
      val dups = (5 to 10).map { n =>
        if (ws.length < n) 0L
        else {
          val grams = ws.sliding(n).map(_.mkString(" ")).toSeq
          val dup = grams.groupBy(identity).filter(_._2.size >= 2).keySet
          val covered = grams.zipWithIndex
            .filter { case (g, _) => dup(g) }
            .flatMap { case (_, i) => i until (i + n) }.toSet
          covered.toSeq.map(i => cp(ws(i))).sum
        }
      }
      Seq(ws.length.toLong, wordChars) ++ tops ++ dups
    }
    val texts = Seq(
      "a b c a b c a b c",                       // heavy 2/3-gram repeats
      "x y x y x y x y x y x y",                 // long alternation: dup 5..10
      "aa bb aa bb cc dd cc dd",                 // 2-gram tie: 'aa bb' vs 'cc dd'
      "é ü é ü é ü",                             // unicode grams
      "one two three four five six seven eight nine ten eleven",
      "w w w w w w w w w w w w",                 // single repeated word
      "short", "", "  \t ",
      ("p q r s t u v w x y z " * 3).trim)       // 11-gram repeat: dup 5..10 all fire
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", graft.functions.NgramRepetitionExpr($"t").as("r"))
      .select($"id" +: graft.functions.NgramRepetitionExpr.schema.fields
        .map(f => col(s"r.${f.name}")): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long]))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"id=$i text='$t'")
    }
    // real corpus sweep
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", graft.functions.NgramRepetitionExpr($"text").as("r"))
      .select($"doc_id" +: graft.functions.NgramRepetitionExpr.schema.fields
        .map(f => col(s"r.${f.name}")): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long]))
      .toMap
    docs.foreach { case (id, t) =>
      assert(real(id) == ref(t), s"doc_id=$id diverges from reference")
    }
  }

  test("ngramBattery: flags fire strictly above thresholds; keep composes") {
    // 'a b ' x 6: 12 words, top-2-gram 'a b' x6 (dominates), dup-5 covers all
    val hot = ("a b " * 6).trim
    // long enough that a 1-count top gram is a small char fraction
    val cold = (1 to 40).map(i => s"word$i").mkString(" ")
    val out = GopherRules.ngramBattery(
        Seq((1L, hot), (2L, cold)).toDF("id", "t"), "id", "t")
      .select("id", "flag_top2", "flag_dup5", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1)
    assert(out(0) === ((1L, true, true, false)))
    assert(out(1) === ((2L, false, false, true)))
  }

  test("importanceResample: matches the naive full-sort draw, any partitioning") {
    val scored = spark.range(0, 1000)
      .select(col("id"), (col("id") % 97L * 1000L - 48000L).as("w_e6"))
    val naive = scored
      .withColumn("g", round(-log(-log(
        (DataMix.knuthHash(col("id")).cast("double") + 0.5) / 4294967296.0))
        * 1e6).cast("long"))
      .withColumn("k", col("w_e6") + col("g"))
      .orderBy(col("k").desc, col("id"))
      .limit(50).select("id").as[Long].collect().toSet
    for (parts <- Seq(1, 13)) {
      val got = DataMix.importanceResample(
          scored.repartition(parts), "id", "w_e6", k = 50)
        .select("id").as[Long].collect()
      assert(got.length === 50)
      assert(got.toSet === naive)
    }
  }

  test("importanceResample: k beyond the corpus returns every row") {
    val scored = spark.range(0, 7).select(col("id"), lit(0L).as("w_e6"))
    assert(DataMix.importanceResample(scored, "id", "w_e6", k = 100)
      .count() === 7)
  }

  test("importanceResample: temperature flattens the draw toward uniform") {
    // 50-nat weight gap (the hash-Gumbel tail caps at ~23 nats, u within
    // 2^-33 of 1): at T=1 the top-weight rows always win; at a huge T the
    // weights wash out and the hash-luckiest rows win instead
    val scored = spark.range(0, 200)
      .select(col("id"),
        when(col("id") < 20L, lit(50000000L)).otherwise(lit(0L)).as("w_e6"))
    val sharp = DataMix.importanceResample(scored, "id", "w_e6", k = 20)
      .select("id").as[Long].collect().toSet
    assert(sharp === (0L until 20L).toSet)
    val flat = DataMix.importanceResample(scored, "id", "w_e6", k = 20,
      temperature = 1e9)
      .select("id").as[Long].collect().toSet
    assert(flat !== (0L until 20L).toSet)
  }
}
