package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: the canonical bag-of-words string — sorted
  * DISTINCT lowercase tokens joined by single spaces — in one compiled loop.
  * `sha2(bag_of_words(text), 256)` is the content id robust to word order and
  * repetition; the column form (`array_join(array_sort(array_distinct(words)))`)
  * pays an interpreted filter lambda per row for the tokenization. Sort order
  * matches Spark's `array_sort` on strings (UTF8String binary order).
  * Equivalence is spec-pinned. */
case class BagOfWordsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bag_of_words requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "bag_of_words"

  override def nullSafeEval(input: Any): Any =
    BagOfWordsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BagOfWordsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BagOfWordsExpr =
    copy(child = newChild)
}

object BagOfWordsExpr {

  /** Referenced from generated code. Token semantics match `TextFns.words`;
    * dedup + sort in UTF8String binary order, the same collation Spark's
    * `array_sort` applies to strings. */
  def compute(text: UTF8String): UTF8String = {
    val words = KernelTok.words(text)
    if (words.isEmpty) return UTF8String.EMPTY_UTF8
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < words.length) {
      set.add(UTF8String.fromString(words(i)))
      i += 1
    }
    val it = set.iterator()
    val sb = new java.lang.StringBuilder
    var first = true
    while (it.hasNext) {
      if (!first) sb.append(' ')
      sb.append(it.next().toString)
      first = false
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BagOfWordsExpr(org.apache.spark.sql.graft.ColumnBridge.expression(text)))
}
