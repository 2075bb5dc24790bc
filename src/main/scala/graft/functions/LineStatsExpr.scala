package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression for the Gopher line-rule battery
  * (`GopherRules.battery`): every line-repetition and top-word statistic in ONE
  * compiled loop per document, replacing two `aggregate()` folds over
  * `array_sort`ed arrays that Spark evaluates interpreted (lambda higher-order
  * functions don't participate in whole-stage codegen — the q48 cost shape,
  * cured there by `TextStatsExpr` at 14.7→0.6 s).
  *
  * Bit-compat contract (pinned by GopherRulesSpec against the column-fold
  * reference forms `lineRepetitionStruct`/`topWordStruct`, incl. non-ASCII and
  * tie cases):
  *  - lines = `filter(split(text, "\n"), len > 0)`; `len`/char counts are code
  *    points (Spark `length()` semantics);
  *  - a line value occurring k>=2 times contributes k to `n_dup_lines` and
  *    k·len to `n_dup_line_chars`;
  *  - words = `filter(split(lower(trim(text)), "\s+"), len > 0)` semantics;
  *  - `top_word_n` ties resolve to the UTF8-binary-smallest word (the word
  *    `array_sort` visits first), exactly like the reference fold.
  */
case class LineStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"line_stats requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LineStatsExpr.schema
  override def prettyName: String = "line_stats"

  override def nullSafeEval(input: Any): Any =
    LineStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LineStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LineStatsExpr =
    copy(child = newChild)
}

object LineStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_dup_lines", LongType, nullable = false),
    StructField("n_line_chars", LongType, nullable = false),
    StructField("n_dup_line_chars", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("n_word_chars", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("top_word_chars", LongType, nullable = false)))

  /** Referenced from generated code. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString

    // ---- line repetition: value -> count, then fold counts >= 2 ----
    var nLines = 0L
    var lineChars = 0L
    var dupLines = 0L
    var dupChars = 0L
    val lineCounts = new java.util.HashMap[String, Long]()
    val rawLines = s.split("\n", -1)
    var i = 0
    while (i < rawLines.length) {
      val l = rawLines(i)
      if (l.nonEmpty) {
        nLines += 1
        lineChars += l.codePointCount(0, l.length)
        lineCounts.merge(l, 1L, (a, b) => a + b)
      }
      i += 1
    }
    val lit = lineCounts.entrySet().iterator()
    while (lit.hasNext) {
      val e = lit.next()
      val k = e.getValue
      if (k >= 2L) {
        dupLines += k
        dupChars += k * e.getKey.codePointCount(0, e.getKey.length)
      }
    }

    // ---- top-word concentration: value -> count, champion by (count, binary asc) ----
    val words = KernelTok.words(text)
    var wordChars = 0L
    val wordCounts = new java.util.HashMap[String, Long]()
    i = 0
    while (i < words.length) {
      val w = words(i)
      wordChars += w.codePointCount(0, w.length)
      wordCounts.merge(w, 1L, (a, b) => a + b)
      i += 1
    }
    var best = 0L
    var bestWord: UTF8String = null
    val wit = wordCounts.entrySet().iterator()
    while (wit.hasNext) {
      val e = wit.next()
      val k = e.getValue
      if (k > best) { best = k; bestWord = UTF8String.fromString(e.getKey) }
      else if (k == best && best > 0L) {
        // tie: the reference fold keeps the word array_sort visits first,
        // i.e. the UTF8-binary-smallest
        val cand = UTF8String.fromString(e.getKey)
        if (cand.compareTo(bestWord) < 0) bestWord = cand
      }
    }
    val bestChars =
      if (bestWord == null) 0L
      else {
        val bw = bestWord.toString
        best * bw.codePointCount(0, bw.length)
      }

    new GenericInternalRow(Array[Any](
      nLines, dupLines, lineChars, dupChars,
      words.length.toLong, wordChars, best, bestChars))
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      LineStatsExpr(org.apache.spark.sql.graft.ColumnBridge.expression(text)))
}

/** Native codegen expression for `GopherRules.dropRepeatedLines`: keep the
  * FIRST occurrence of every non-empty line in document order, drop empties and
  * repeats, return `struct(text, n_removed)`. The column reference form is an
  * `array_position` survivorship walk — O(L²) interpreted array scans per doc;
  * this is one pass with a seen-set. Bit-compat pinned by GopherRulesSpec. */
case class LineScrubExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"line_scrub requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LineScrubExpr.schema
  override def prettyName: String = "line_scrub"

  override def nullSafeEval(input: Any): Any =
    LineScrubExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LineScrubExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LineScrubExpr =
    copy(child = newChild)
}

object LineScrubExpr {

  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  /** Referenced from generated code. */
  def compute(text: UTF8String): InternalRow = {
    val rawLines = text.toString.split("\n", -1)
    val seen = new java.util.LinkedHashSet[String]()
    var nonEmpty = 0L
    var i = 0
    while (i < rawLines.length) {
      val l = rawLines(i)
      if (l.nonEmpty) {
        nonEmpty += 1
        seen.add(l) // first occurrence wins; LinkedHashSet keeps doc order
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder
    val it = seen.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append('\n')
      sb.append(it.next())
      first = false
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), nonEmpty - seen.size.toLong))
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      LineScrubExpr(org.apache.spark.sql.graft.ColumnBridge.expression(text)))
}
