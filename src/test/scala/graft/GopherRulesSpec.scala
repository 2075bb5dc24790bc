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
