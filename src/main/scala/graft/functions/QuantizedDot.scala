package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen expression: integer dot product of two pre-quantized long
  * vectors — the pairwise kernel of every cosine path (brute-force ANN, IVF
  * cells, LSH buckets, embedding near-dup). The column form
  * (`aggregate(zip_with(a, b, _*_), 0, _+_)`) allocates a zipped array and
  * evaluates its lambdas interpreted for EVERY pair; this is the same exact
  * integer sum in one fused loop, no allocation. Equality with the column form
  * is pinned by spec (both eval and codegen paths). */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quantized_dot requires array<bigint> args, got " +
          s"${l.simpleString(10)}, ${r.simpleString(10)}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(l: Any, r: Any): Any =
    QuantizedDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.QuantizedDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {

  /** Referenced from generated code. Components beyond the shorter vector's
    * length contribute nothing (zip_with would pair them with null -> null
    * product -> the column form's sum skips them the same way only when inputs
    * are equal-length; callers quantize from equal-dimension embeddings, so the
    * lengths always agree — min() is pure defensive clamping). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      QuantizedDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot", exprs => QuantizedDot(exprs.head, exprs(1)), "built-in")
}
