package graft

import graft.functions.{TextFns, TextStatsExpr}
import org.apache.spark.sql.functions._

/** Pins the native `TextStatsExpr` compiled loop to the interpreted
  * higher-order-function column reference (`qualityStructCols` /
  * `repetitionStructCols`) — the same equivalence contract
  * `SortedHashedShinglesExpr` carries, including non-ASCII and
  * supplementary-plane (surrogate pair) text where Java `String.length`
  * and Spark `length()` (code points) diverge. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq("the", "a", "of", "and", "is")

  private val texts = Seq(
    "The quick brown Fox jumps over the lazy dog",
    "the the the the the",
    "a b a b a b a b",
    "  leading and trailing   whitespace\tand\ttabs  ",
    "der schnelle braune Fuchs springt über den FLUSS",
    "这 是 一个 中文 文本 的 测试 样本",
    "emoji 😀 and 🚀 surrogate pairs 😀",
    "repeat repeat repeat repeat repeat",
    "two words",
    "one",
    "   ",
    "")

  test("native repetitionStruct == HOF column reference (incl. non-ASCII, emoji)") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val rows = df.select($"id",
        TextFns.repetitionStruct($"t").as("nat"),
        TextFns.repetitionStructCols($"t").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getStruct(1) == r.getStruct(2), s"id=${r.getLong(0)}: ${r.getStruct(1)} != ${r.getStruct(2)}")
    }
  }

  test("native qualityStruct == HOF column reference") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val rows = df.select($"id",
        TextFns.qualityStruct($"t", stops).as("nat"),
        TextFns.qualityStructCols($"t", stops).as("ref"))
      .collect()
    rows.foreach { r =>
      val (n, f) = (r.getStruct(1), r.getStruct(2))
      assert(n.getLong(0) == f.getLong(0), s"id=${r.getLong(0)} n_words")
      // empty docs carry NULL ratios in both forms
      (1 to 2).foreach { i =>
        assert(n.isNullAt(i) == f.isNullAt(i), s"id=${r.getLong(0)} field $i nullness")
        if (!n.isNullAt(i))
          assert(java.lang.Double.doubleToLongBits(n.getDouble(i)) ==
            java.lang.Double.doubleToLongBits(f.getDouble(i)), s"id=${r.getLong(0)} field $i")
      }
    }
  }

  test("real corpus sweep: every sf0.001 document agrees on both structs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diffRep = docs.select(
        TextFns.repetitionStruct($"text").as("a"),
        TextFns.repetitionStructCols($"text").as("b"))
      .filter($"a" =!= $"b").count()
    assert(diffRep == 0)
    val q = docs.select(
        TextFns.qualityStruct($"text", stops).as("a"),
        TextFns.qualityStructCols($"text", stops).as("b"))
      // docs all non-empty => no NaN ratios; struct equality is safe here
      .filter($"a" =!= $"b").count()
    assert(q == 0)
  }

  test("native stop_counts / langIdPredict == HOF column references on corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .unionByName(texts.toDF("text"))
    val markers = TextFns.langMarkers
    val sc = graft.functions.StopCountsExpr($"text", markers.map(_._2))
    val ws = TextFns.words($"text")
    val refCounts = array(markers.map { case (_, m) =>
      TextFns.stopwordCount(ws, m).cast("long") }: _*)
    val diff = docs.select(sc.as("nat"), refCounts.as("ref"),
        TextFns.langIdPredict($"text").as("pnat"),
        TextFns.langIdPredictCols($"text").as("pref"))
      .filter($"nat" =!= $"ref" || $"pnat" =!= $"pref").count()
    assert(diff == 0)
  }

  test("native bag_of_words fingerprint == HOF column reference on corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .unionByName(texts.toDF("text"))
    val diff = docs.select(
        TextFns.fingerprintSha($"text").as("nat"),
        TextFns.fingerprintShaCols($"text").as("ref"))
      .filter($"nat" =!= $"ref").count()
    assert(diff == 0)
  }

  test("top_bigram_n counts the dominant bigram multiplicity") {
    // "x y x y x y" bigrams: (x y)x3, (y x)x2 -> top = 3
    val r = Seq("x y x y x y").toDF("t")
      .select(TextStatsExpr($"t", Nil).as("s"))
      .select($"s.n_words", $"s.n_bigrams", $"s.top_bigram_n")
      .head()
    assert(r.getLong(0) == 6 && r.getLong(1) == 5 && r.getLong(2) == 3)
  }

  test("null text yields null struct") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(TextStatsExpr($"t", Nil).as("s")).head()
    assert(r.isNullAt(0))
  }
}
