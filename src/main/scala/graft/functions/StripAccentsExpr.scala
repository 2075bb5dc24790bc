package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: accent/diacritic removal — Unicode NFD
  * decomposition, then every combining mark (category Mn) dropped. The
  * pre-hash text normalization step of CCNet-style pipelines (Wenzek et al.
  * 2019, arXiv:1911.00359 §4.1 normalizes before dedup hashing so `café` and
  * `cafe` collide); DuckDB's `strip_accents` computes the same mapping for
  * Latin-script input, which is what makes the full normalization pipeline
  * oracle-checkable.
  *
  * Codegen'd (one static call — stays inside whole-stage codegen), with an
  * ASCII fast path that returns the input UTF8String untouched: on a mostly-
  * ASCII corpus the expression costs one byte scan per row, no allocation,
  * no NFD machinery. */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents_g requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents_g"

  override def nullSafeEval(input: Any): Any =
    StripAccentsExpr.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripAccentsExpr.strip($c)")

  override protected def withNewChildInternal(
      newChild: Expression): StripAccentsExpr = copy(child = newChild)
}

object StripAccentsExpr {

  /** Referenced from generated Java code — must stay public. */
  def strip(s: UTF8String): UTF8String = {
    // ASCII fast path: no byte ≥ 0x80 means no decomposable code point
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val ch = nfd.charAt(j)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      StripAccentsExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Register as a SQL function: `SELECT strip_accents_g(x)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_accents_g", exprs => StripAccentsExpr(exprs.head), "built-in")
}
