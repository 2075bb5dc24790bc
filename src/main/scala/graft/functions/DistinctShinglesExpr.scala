package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: distinct word n-gram shingles AS STRINGS, in
  * first-occurrence order — the compiled form of
  * `array_distinct(TextFns.wordShingles(TextFns.words(text), n))`, which is
  * built from `transform`/`slice`/`array_join` higher-order functions that
  * Spark evaluates interpreted (the q48/q90 cost shape; measured 8.8× of the
  * whole q94 row at sf1). String-gram consumers (the bloom-contamination
  * family, whose DuckDB oracles need string grams) get one Java loop per row.
  *
  * Bit-compat contract (pinned by spec, incl. non-ASCII):
  *  - tokens = `filter(split(lower(trim(text)), "\s+"), len > 0)` semantics
  *    (the `SortedHashedShinglesExpr.positionalHashes` token rule);
  *  - shingles are space-joined in document order; distinct keeps the FIRST
  *    occurrence (Spark `array_distinct` order);
  *  - documents with fewer than n words return an EMPTY array, exactly like
  *    the column form's `.otherwise(array())`. */
case class DistinctShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"distinct_shingles requires a string argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"

  override def nullSafeEval(input: Any): Any =
    DistinctShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DistinctShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): DistinctShinglesExpr = copy(child = newChild)
}

object DistinctShinglesExpr {

  /** Referenced from generated code. Returns an empty array for docs shorter
    * than n words (the column form's `.otherwise(array())`). */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val words = KernelTok.words(text)
    val m = words.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var w = 0
    while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
    new GenericArrayData(out)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DistinctShinglesExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n))
}
