package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: character-distribution Shannon entropy of a
  * string, in the repo's e6 scaled-integer convention — the gibberish /
  * low-diversity quality signal (a document that is one character repeated,
  * binary spill, or keyboard mash has near-zero char entropy; natural text
  * sits near ln(alphabet)). Complements the word-level repetition battery
  * (`TextStatsExpr`): entropy sees sub-word pathology the word stats cannot.
  *
  * Exact integer carrier, bit-reproducible in SQL: with c = per-code-point
  * count and n = total code points,
  *   entropy_e6 = round(ln(n)·10⁶) − (Σ round(c·ln(c)·10⁶)) ÷ n
  * (÷ = floor division; every term a long; n = 0 → 0). The per-count log
  * terms are rounded BEFORE summing, so the double summation order that
  * would make a float entropy engine-dependent never exists — DuckDB replays
  * the identical integers.
  *
  * One compiled loop per row (sort + run-count over the code points), inside
  * whole-stage codegen: a narrow scan-stage projection, zero shuffle. */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy_e6 requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy_e6"

  override def nullSafeEval(input: Any): Any =
    CharEntropyExpr.entropyE6(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyExpr.entropyE6($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropyExpr = copy(child = newChild)
}

object CharEntropyExpr {

  /** Referenced from generated Java code — must stay public. */
  def entropyE6(s: UTF8String): Long = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    java.util.Arrays.sort(cps)
    var sumLp = 0L
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && cps(j) == cps(i)) j += 1
      val c = (j - i).toDouble
      sumLp += Math.round(c * Math.log(c) * 1e6)
      i = j
    }
    Math.round(Math.log(n.toDouble) * 1e6) - sumLp / n
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CharEntropyExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Register as a SQL function: `SELECT char_entropy_e6(x)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy_e6", exprs => CharEntropyExpr(exprs.head), "built-in")
}
