package graft

import java.util.Locale

import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The Turkish-locale landmine (r11 verdict): Java's default-locale
  * `String.toLowerCase()` maps ASCII 'I' to dotless 'ı' on a `tr_TR` JVM,
  * while Spark's `lower()` lowers full-ASCII strings through a
  * locale-independent fast path — so any native kernel that tokenizes via
  * `toString.toLowerCase` silently diverges from its column-form contract the
  * day the engine runs on a Turkish-locale JVM. Every tokenizing kernel now
  * lowers through `UTF8String.toLowerCase` — the EXACT code Spark's `Lower`
  * runs — which this suite pins by forcing the default locale to `tr-TR`
  * and asserting kernel == column form on dotted/dotless-I inputs, kernel
  * by kernel, plus a source-level lint that keeps the pattern out of future
  * kernels. */
class LocaleProofSpec extends SparkSpec {
  import spark.implicits._

  private def withTurkishLocale[A](body: => A): A = {
    val prev = Locale.getDefault
    Locale.setDefault(Locale.forLanguageTag("tr-TR"))
    try body finally Locale.setDefault(prev)
  }

  // dotted/dotless-I battery: ASCII 'I' (the tr_TR landmine), U+0130 'İ',
  // U+0131 'ı', stop-word 'I's, repeated lines, shingle-width texts
  private lazy val docs: DataFrame = Seq(
    (1L, "TITLE I TITLE I FIX THE TITLE I"),
    (2L, "İSTANBUL ıı II İİ title i Istanbul"),
    (3L, "The THE the I a A of I I of of"),
    (4L, " mixed CASE\t I\nİ ı \nI İ ı\nI İ ı "),
    (5L, "I"),
    (6L, "İ"),
    (7L, "sıfır SIFIR sifir SİFİR irmak IRMAK")).toDF("doc_id", "text")
    .repartition(2)

  private def pin(label: String, native: DataFrame, reference: DataFrame): Unit = {
    val n = native.collect().toSeq
    val r = reference.collect().toSeq
    assert(n.nonEmpty && n == r, s"$label diverged under tr-TR:\n  native=$n\n  ref=$r")
  }

  test("the landmine is real: default-locale String lowering breaks ASCII under tr-TR") {
    withTurkishLocale {
      assert("TITLE I".toLowerCase == "tıtle ı") // what the kernels MUST NOT do
      assert(UTF8String.fromString("TITLE I").toLowerCase.toString == "title i")
    }
  }

  test("tokenizing kernels == column forms under a forced tr-TR default locale") {
    withTurkishLocale {
      // ShingleExpr family: native sorted hashed shingles vs the HOF column
      // reference (lower() + split + xxhash64)
      pin("sortedHashedShingles",
        docs.select($"doc_id", TextFns.sortedHashedShingles($"text", 2)),
        docs.select($"doc_id", TextFns.sortedHashedShinglesCols($"text", 2)))
      // DistinctShinglesExpr: native distinct string shingles vs column form
      pin("stringShingles",
        docs.select($"doc_id", TextFns.stringShingles($"text", 1)),
        docs.select($"doc_id",
          array_distinct(TextFns.words($"text"))
            .cast("array<string>")))
      // TextStatsExpr: the quality struct vs its column reference, with a
      // stop list whose hits depend on lowering ASCII 'I' correctly
      val stops = Seq("i", "the", "of")
      pin("qualityStruct",
        docs.select($"doc_id", TextFns.qualityStruct($"text", stops)),
        docs.select($"doc_id", TextFns.qualityStructCols($"text", stops)))
      // BagOfWordsExpr: canonical bag fingerprint vs column reference
      pin("fingerprintSha",
        docs.select($"doc_id", TextFns.fingerprintSha($"text")),
        docs.select($"doc_id", TextFns.fingerprintShaCols($"text")))
      // NgramRepetitionExpr: repetition struct vs column reference
      pin("repetitionStruct",
        docs.select($"doc_id", TextFns.repetitionStruct($"text")),
        docs.select($"doc_id", TextFns.repetitionStructCols($"text")))
      // StopCountsExpr: language-ID marker scoring vs column reference
      pin("langIdPredict",
        docs.select($"doc_id", TextFns.langIdPredict($"text")),
        docs.select($"doc_id", TextFns.langIdPredictCols($"text")))
      // SimHashExpr: native signatures vs the 64-conditional-sum reference
      pin("simhash64",
        Dedup.simhash64(docs, "doc_id", "text").orderBy($"doc_id"),
        Dedup.simhash64Agg(docs, "doc_id", "text").orderBy($"doc_id"))
    }
  }

  test("no kernel lowers through the default locale (source lint)") {
    // Structural rule, not pattern-matching: tokenizing kernels lower ONLY
    // through `KernelTok.words` (receiver typed UTF8String — the
    // default-locale path is unrepresentable there), so the `toLowerCase`
    // token is banned OUTRIGHT in every other kernel file, comments
    // included aside, on code lines. This closes the pattern-lint gap where
    // `val s = text.toString; s.toLowerCase` (no parens, not contiguous
    // with toString) slipped a String-receiver lowering past a
    // `toString.toLowerCase` + `toLowerCase()` check.
    val allowed = Set(
      "KernelTok.scala",        // the one sanctioned UTF8String lowering
      "NormalizeTextExpr.scala" // lowers a UTF8String pre-accent-strip
    )
    val dir = java.nio.file.Paths.get("src/main/scala/graft/functions")
    val offenders = ysCollect(dir, allowed)
    assert(offenders.isEmpty, s"default-locale lowering in kernels: $offenders")
    // and inside the allowed files, the String-receiver shapes stay banned
    val shapeOffenders = ysCollect(dir, Set.empty).filter(allowed)
      .filter { name =>
        val src = java.nio.file.Files.readString(dir.resolve(name))
        src.contains("toString.toLowerCase") ||
          codeLines(src).exists(_.matches(""".*\btoLowerCase\(\).*"""))
      }
    assert(shapeOffenders.isEmpty,
      s"String-receiver lowering in allowlisted kernels: $shapeOffenders")
  }

  private def codeLines(src: String): Iterator[String] =
    src.linesIterator.filterNot(l =>
      l.trim.startsWith("*") || l.trim.startsWith("//"))

  /** Files under `dir` (minus `allowed`) with any code-line `toLowerCase`. */
  private def ysCollect(dir: java.nio.file.Path,
                        allowed: Set[String]): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filterNot(p => allowed(p.getFileName.toString))
      .filter { p =>
        codeLines(java.nio.file.Files.readString(p))
          .exists(_.contains("toLowerCase"))
      }
      .map(_.getFileName.toString).toSeq
  }
}
