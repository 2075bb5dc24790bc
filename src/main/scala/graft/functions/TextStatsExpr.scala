package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: every per-document text statistic the quality /
  * repetition filters need — word count, distinct words, character sum, stopword
  * hits, bigram count, top-bigram multiplicity — in ONE compiled loop per row.
  *
  * The column-expression forms (`aggregate()` folds and `transform()` bigrams in
  * `TextFns.qualityStructCols` / `repetitionStructCols`) are semantically
  * identical but built from higher-order functions, which Spark evaluates
  * INTERPRETED — lambda expressions don't participate in whole-stage codegen.
  * Round 2 measured the same anti-pattern at ~6× on the shingle pipeline and
  * fixed it with `SortedHashedShinglesExpr`; this expression applies the
  * identical cure to the quality/repetition hot path (q48 was the slowest
  * driver-bench query on the interpreted form).
  *
  * Bit-compat contract (pinned by TextStatsSpec, incl. non-ASCII):
  *  - tokens = `filter(split(lower(trim(text)), "\s+"), len > 0)` semantics;
  *  - `char_sum` counts CODE POINTS per word (Spark `length()` on strings);
  *  - `top_bigram_n` is the max run of equal xxhash64(seed 42) bigram hashes in
  *    sorted order — the same values the column form sorts, so a (≈1e-15)
  *    hash collision produces the SAME answer in both implementations.
  */
case class TextStatsExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = TextStatsExpr.schema
  override def prettyName: String = "text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stops.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatsExpr.compute($c, $stopsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false),
    StructField("stop_count", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false)))

  /** Referenced from generated code. One pass over the token array; the bigram
    * multiplicity reuses the hash-sort-run technique of the column reference so
    * results are bit-identical to `array_sort(transform(bg, xxhash64))` +
    * max-run-length. */
  def compute(text: UTF8String, stops: java.util.HashSet[String]): InternalRow = {
    val words = KernelTok.words(text)
    val nWords = words.length
    var charSum = 0L
    var stopCount = 0L
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < nWords) {
      val w = words(i)
      charSum += w.codePointCount(0, w.length)
      if (stops.contains(w)) stopCount += 1
      distinct.add(w)
      i += 1
    }
    val nBigrams = if (nWords >= 2) nWords - 1 else 0
    var topBigram = 0L
    if (nBigrams > 0) {
      val hashes = new Array[Long](nBigrams)
      val sb = new java.lang.StringBuilder
      i = 0
      while (i < nBigrams) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1))
        hashes(i) = XxHash64Function.hash(
          UTF8String.fromString(sb.toString), StringType, 42L)
        i += 1
      }
      java.util.Arrays.sort(hashes)
      var run = 1L
      topBigram = 1L
      i = 1
      while (i < nBigrams) {
        if (hashes(i) == hashes(i - 1)) run += 1 else run = 1
        if (run > topBigram) topBigram = run
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      nWords.toLong, distinct.size.toLong, charSum, stopCount,
      nBigrams.toLong, topBigram))
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column, stops: Seq[String]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      TextStatsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), stops))

  /** SQL registration: `SELECT text_stats(text)` (no stopword argument —
    * stopword-dependent callers construct the expression directly). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_stats", exprs => TextStatsExpr(exprs.head, Nil), "built-in")
}
