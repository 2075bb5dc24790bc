package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document-repetition rule battery (Rae et al. 2021
  * arXiv:2112.11446 §A1.1): the line-level repetition signals the word-level
  * battery (q48 `TextFns.repetitionStruct`) cannot see — what fraction of a
  * document's LINES are duplicates of other lines in the same document, what
  * fraction of its CHARACTERS sit in those duplicated lines, and how much of
  * the text one single word accounts for — plus the composite keep/drop flag
  * the filter actually gates on. The reference pipeline's validation
  * predicates (SURVEY §2 P9) are this same shape at time-series scale:
  * per-entity rule thresholds folded to one boolean.
  *
  * Every statistic is an exact long computed IN-ROW: lines split, sort, and
  * fold inside the row (no explode, no per-doc groupBy — the corpus pass
  * stays a narrow projection in the scan stage at any scale), and every flag
  * compares integers cross-multiplied against percentage thresholds
  * (`100·x > pct·y`), so the battery is bit-reproducible in plain SQL — no
  * float ratio ever materializes.
  */
object GopherRules {

  /** Non-empty lines of a newline-delimited text, in order. */
  private def lines(text: Column): Column =
    filter(split(text, "\n"), l => length(l) > 0)

  /** Line-repetition statistics over a newline-delimited text column:
    * `n_lines`, `n_dup_lines` (every occurrence of any line value that
    * appears 2+ times), `n_line_chars` (total line characters), and
    * `n_dup_line_chars` (characters inside duplicated occurrences). One
    * sorted in-row fold with a (prev, run, dups, dupChars) accumulator —
    * when a value's run reaches 2 both occurrences enter the counts, each
    * further repeat adds one more. */
  def lineRepetitionStruct(text: Column): Column = {
    val ls = lines(text)
    val folded = aggregate(array_sort(ls),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("dl"), lit(0L).as("dc")),
      (acc, x) => {
        val newRun = when(acc("prev").isNotNull && (x === acc("prev")),
          acc("run") + 1L).otherwise(lit(1L))
        val add = when(newRun === 2L, lit(2L))
          .when(newRun > 2L, lit(1L)).otherwise(lit(0L))
        struct(x.as("prev"), newRun.as("run"),
          (acc("dl") + add).as("dl"),
          (acc("dc") + add * length(x).cast("long")).as("dc"))
      },
      acc => struct(acc("dl").as("dl"), acc("dc").as("dc")))
    struct(
      size(ls).cast("long").as("n_lines"),
      folded("dl").as("n_dup_lines"),
      aggregate(ls, lit(0L), (a, x) => a + length(x).cast("long"))
        .as("n_line_chars"),
      folded("dc").as("n_dup_line_chars"))
  }

  /** Top-word concentration statistics: word count, total word characters,
    * the multiplicity of the most frequent word, and the characters that
    * word accounts for (`count · len`). Ties resolve to the
    * lexicographically smallest word (the fold walks the sorted array and
    * only a STRICTLY longer run displaces the champion) — the same row an
    * `ORDER BY c DESC, w LIMIT 1` oracle picks. */
  def topWordStruct(text: Column): Column = {
    val ws = TextFns.words(text)
    val folded = aggregate(array_sort(ws),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit(0L).as("bestChars"), lit(0L).as("chars")),
      (acc, x) => {
        val newRun = when(acc("prev").isNotNull && (x === acc("prev")),
          acc("run") + 1L).otherwise(lit(1L))
        val better = newRun > acc("best")
        struct(x.as("prev"), newRun.as("run"),
          when(better, newRun).otherwise(acc("best")).as("best"),
          when(better, newRun * length(x).cast("long"))
            .otherwise(acc("bestChars")).as("bestChars"),
          (acc("chars") + length(x).cast("long")).as("chars"))
      },
      acc => struct(acc("best").as("best"), acc("bestChars").as("bestChars"),
        acc("chars").as("chars")))
    struct(
      size(ws).cast("long").as("n_words"),
      folded("chars").as("n_word_chars"),
      folded("best").as("top_word_n"),
      folded("bestChars").as("top_word_chars"))
  }

  /** The full battery over `docs(idCol, textCol)` (text newline-delimited;
    * use [[chunkIntoLines]] first for corpora without natural lines): every
    * statistic above plus the Gopher rule flags —
    *
    *   - `flag_dup_lines`: duplicate-line fraction > `maxDupLinePct`%
    *   - `flag_dup_chars`: duplicate-line-character fraction > `maxDupCharPct`%
    *   - `flag_top_word`: top-word character fraction > `maxTopWordPct`%
    *   - `flag_word_count`: word count outside [`minWords`, `maxWords`]
    *   - `keep`: none of the above fired
    *
    * All comparisons are integer cross-multiplications; zero-line /
    * zero-word documents fail the word-count rule and nothing else (0 > 0
    * is false), so the battery never divides and never sees a NULL. */
  def battery(docs: DataFrame, idCol: String, textCol: String,
              maxDupLinePct: Int = 30, maxDupCharPct: Int = 20,
              maxTopWordPct: Int = 10, minWords: Long = 50,
              maxWords: Long = 100000, native: Boolean = true): DataFrame = {
    require(maxDupLinePct >= 0 && maxDupCharPct >= 0 && maxTopWordPct >= 0,
      "percentage thresholds must be non-negative")
    require(minWords >= 0 && maxWords >= minWords,
      s"need 0 <= minWords <= maxWords, got [$minWords, $maxWords]")
    // few-file corpora would run the per-doc kernel at file-count
    // parallelism (measured r10: ONE task over the 500k-doc sf10 corpus,
    // 2 parquet files — 4+ minutes single-threaded); the exchange guard is
    // the same seam every Dedup prep stage carries
    val docsP = Dedup.ensureParallel(docs)
    // native (default): ONE compiled loop per doc (LineStatsExpr) inside
    // whole-stage codegen; native=false keeps the interpreted column-fold
    // reference the equivalence spec pins the expression against.
    val stats =
      if (native)
        docsP.withColumn("__st",
          graft.functions.LineStatsExpr(col(textCol)))
          .select(col(idCol),
            col("__st.n_lines").as("n_lines"),
            col("__st.n_dup_lines").as("n_dup_lines"),
            col("__st.n_line_chars").as("n_line_chars"),
            col("__st.n_dup_line_chars").as("n_dup_line_chars"),
            col("__st.n_words").as("n_words"),
            col("__st.n_word_chars").as("n_word_chars"),
            col("__st.top_word_n").as("top_word_n"),
            col("__st.top_word_chars").as("top_word_chars"))
      else docsP
        .withColumn("__lr", lineRepetitionStruct(col(textCol)))
        .withColumn("__tw", topWordStruct(col(textCol)))
        .select(col(idCol),
          col("__lr.n_lines").as("n_lines"),
          col("__lr.n_dup_lines").as("n_dup_lines"),
          col("__lr.n_line_chars").as("n_line_chars"),
          col("__lr.n_dup_line_chars").as("n_dup_line_chars"),
          col("__tw.n_words").as("n_words"),
          col("__tw.n_word_chars").as("n_word_chars"),
          col("__tw.top_word_n").as("top_word_n"),
          col("__tw.top_word_chars").as("top_word_chars"))
    stats
      .withColumn("flag_dup_lines",
        col("n_dup_lines") * 100L > col("n_lines") * maxDupLinePct.toLong)
      .withColumn("flag_dup_chars",
        col("n_dup_line_chars") * 100L >
          col("n_line_chars") * maxDupCharPct.toLong)
      .withColumn("flag_top_word",
        col("top_word_chars") * 100L >
          col("n_word_chars") * maxTopWordPct.toLong)
      .withColumn("flag_word_count",
        col("n_words") < minWords || col("n_words") > maxWords)
      .withColumn("keep",
        !(col("flag_dup_lines") || col("flag_dup_chars") ||
          col("flag_top_word") || col("flag_word_count")))
  }

  /** The word n-gram half of the Gopher repetition battery (Rae 2112.11446
    * §A1.1, Table A1) — the signals the line battery above cannot see:
    * top-{2,3,4}-gram character concentration and dup-{5..10}-gram character
    * coverage, all from ONE compiled pass per document
    * ([[graft.functions.NgramRepetitionExpr]]), flagged by integer
    * cross-multiplication against per-n percentage thresholds (defaults =
    * the paper's, ×100). Both fraction families share the word-character
    * denominator; zero-word documents trip nothing (0 > 0 is false). */
  def ngramBattery(docs: DataFrame, idCol: String, textCol: String,
                   topPcts: Map[Int, Int] = Map(2 -> 20, 3 -> 18, 4 -> 16),
                   dupPcts: Map[Int, Int] = Map(5 -> 15, 6 -> 14, 7 -> 13,
                     8 -> 12, 9 -> 11, 10 -> 10)): DataFrame = {
    require(topPcts.keySet == Set(2, 3, 4) && dupPcts.keySet == (5 to 10).toSet,
      "thresholds must cover exactly top-{2,3,4} and dup-{5..10}")
    require((topPcts.values ++ dupPcts.values).forall(_ >= 0),
      "percentage thresholds must be non-negative")
    val statCols = Seq("n_words", "n_word_chars") ++
      (2 to 4).flatMap(n => Seq(s"top${n}_n", s"top${n}_chars")) ++
      (5 to 10).map(n => s"dup${n}_chars")
    // same file-count-parallelism guard as `battery` (the r10 sf10 receipt
    // caught this stage serializing on one task)
    val base = Dedup.ensureParallel(docs)
      .withColumn("__nr", graft.functions.NgramRepetitionExpr(col(textCol)))
      .select(col(idCol) +: statCols.map(f => col(s"__nr.$f").as(f)): _*)
    val flagged = (2 to 4).foldLeft(base) { (df, n) =>
      df.withColumn(s"flag_top$n",
        col(s"top${n}_chars") * 100L >
          col("n_word_chars") * topPcts(n).toLong)
    }
    val flagged2 = (5 to 10).foldLeft(flagged) { (df, n) =>
      df.withColumn(s"flag_dup$n",
        col(s"dup${n}_chars") * 100L >
          col("n_word_chars") * dupPcts(n).toLong)
    }
    val flagCols = (2 to 4).map(n => col(s"flag_top$n")) ++
      (5 to 10).map(n => col(s"flag_dup$n"))
    flagged2.withColumn("keep", !flagCols.reduce(_ || _))
  }

  /** The REMEDY to the flag: drop every repeat of a line within the
    * document, keeping the first occurrence in place — the C4/RefinedWeb
    * within-page boilerplate scrub (distinct from `Dedup.lineDedup`, which
    * dedups lines across the CORPUS and needs a shuffle; this is pure in-row
    * and costs nothing at any scale). Native (default): one compiled
    * seen-set pass per doc (`LineScrubExpr`); `native=false` keeps the
    * `array_position` survivorship-walk reference (O(L²) interpreted array
    * scans per doc) that the equivalence spec pins the expression against.
    * Returns the doc frame with `textCol` rewritten and `n_removed`. */
  def dropRepeatedLines(docs: DataFrame, textCol: String,
                        native: Boolean = true): DataFrame =
    if (native)
      Dedup.ensureParallel(docs)
        .withColumn("__s", graft.functions.LineScrubExpr(col(textCol)))
        .withColumn("n_removed", col("__s.n_removed"))
        .withColumn(textCol, col("__s.text"))
        .drop("__s")
    else {
      val ls = lines(col(textCol))
      val kept = filter(ls, (l, i) => array_position(ls, l) === i + 1L)
      docs
        .withColumn("__k", kept)
        .withColumn("n_removed",
          (size(lines(col(textCol))) - size(col("__k"))).cast("long"))
        .withColumn(textCol, array_join(col("__k"), "\n"))
        .drop("__k")
    }

  /** Re-line a flat text: split to words, regroup into `wordsPerLine`-word
    * lines joined by `\n` — gives line-rule semantics to corpora whose texts
    * carry no newlines (the synthetic tables here; also minified HTML/JS in
    * the wild). One normalize-join plus ONE codegen'd `regexp_replace` pass
    * (insert `\n` in place of the space after every `wordsPerLine`-th
    * word) — the slice-per-line fold this replaces was O(L²) interpreted
    * array copies and dominated the q90/q92 bench rows 7:1
    * ([[chunkIntoLinesCols]] keeps it as the spec-pinned reference). */
  def chunkIntoLines(text: Column, wordsPerLine: Int): Column = {
    require(wordsPerLine > 0, s"wordsPerLine must be positive, got $wordsPerLine")
    regexp_replace(
      array_join(TextFns.words(text), " "),
      s"((?:\\S+ ){${wordsPerLine - 1}}\\S+) ", "$1\n")
  }

  /** Reference column-expression implementation of [[chunkIntoLines]]. */
  def chunkIntoLinesCols(text: Column, wordsPerLine: Int): Column = {
    require(wordsPerLine > 0, s"wordsPerLine must be positive, got $wordsPerLine")
    val ws = TextFns.words(text)
    val nLines = ceil(size(ws).cast("double") / wordsPerLine).cast("long")
    when(size(ws) > 0,
      array_join(
        transform(sequence(lit(0L), nLines - 1L),
          i => array_join(
            slice(ws, (i * wordsPerLine + 1L).cast("int"),
              lit(wordsPerLine)), " ")),
        "\n"))
      .otherwise(lit(""))
  }
}
