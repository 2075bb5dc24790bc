package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit polynomial rolling hash over a string's UTF-8
  * bytes (`h = h*1099511628211 ^ byte`, FNV-style) — the document-fingerprinting
  * primitive. Implemented as a codegen'd `UnaryExpression` (not a Scala UDF) so it
  * participates in whole-stage codegen: no boxing, no serialization, evaluated inline
  * in the generated loop over the column batch. SURVEY.md §2.10 — the engine prefers a
  * native `Expression` over a UDF wherever logic cannot be composed from built-ins.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any =
    RollingHash64.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash64.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  final val Prime = 1099511628211L
  final val Offset = -3750763034362895579L // FNV-1a 64 offset basis

  /** Referenced from generated Java code — must stay public + static-reachable. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      RollingHash64(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Register as a SQL function: `SELECT rolling_hash64(text)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")
}
