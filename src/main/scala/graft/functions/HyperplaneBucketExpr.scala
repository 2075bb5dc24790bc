package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen expression: the `nPlanes`-bit hyperplane sign signature of an
  * embedding vector — quantize, per-plane integer dot, sign bits — in ONE
  * compiled loop over the vector.
  *
  * The column form (`VectorFns.hyperplaneBucketCols`) nests
  * aggregate/zip_with/transform lambdas PER PLANE, all interpreted: at 12
  * planes × 8 bands that is 96 interpreted folds per corpus row in the LSH
  * dedup prep — the dominant per-row cost of the scale path. This expression
  * reproduces the exact bits: planes from `xxhash64(p·4099 + d)` (long input,
  * seed 42) mod 2001 − 1000, components HALF_UP-quantized like
  * `round(x·1e6)`, bit set iff the integer dot ≥ 0. Equivalence spec-pinned. */
case class HyperplaneBucketExpr(child: Expression, nPlanes: Int, planeOffset: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket requires array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    HyperplaneBucketExpr.compute(input.asInstanceOf[ArrayData],
      nPlanes, planeOffset, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBucketExpr.compute($c, $nPlanes, $planeOffset, $elemIsFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

object HyperplaneBucketExpr {

  /** Referenced from generated code. Bit-compatible with the column form:
    * HALF_UP quantization (Spark `round` on doubles goes through BigDecimal,
    * NOT Math.round — they differ on negative .5 ties), xxhash64 over the
    * LONG plane/dim index with seed 42, `pmod` semantics for the plane
    * component. One pass: all plane dots accumulate per component. */
  def compute(vec: ArrayData, nPlanes: Int, planeOffset: Int,
              elemIsFloat: Boolean): Int = {
    val dims = vec.numElements()
    val dots = new Array[Long](nPlanes)
    var d = 0
    while (d < dims) {
      val x = if (elemIsFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
      val scaled = x * VectorFns.Scale
      // non-finite components quantize to 0, matching VectorFns.quantize —
      // BigDecimal.valueOf(NaN) would throw and kill the job, and saturated
      // longs would overflow the plane multiplication
      val q =
        if (java.lang.Double.isNaN(scaled) || java.lang.Double.isInfinite(scaled)) 0L
        else java.math.BigDecimal.valueOf(scaled)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      var pl = 0
      while (pl < nPlanes) {
        // the column form feeds xxhash64 an INT expression — IntegerType and
        // LongType hash differently, so the type here is load-bearing
        val h = XxHash64Function.hash(
          (pl + planeOffset) * 4099 + d, IntegerType, 42L)
        var m = h % 2001L
        if (m < 0) m += 2001L
        dots(pl) += q * (m - 1000L)
        pl += 1
      }
      d += 1
    }
    var bucket = 0
    var pl = 0
    while (pl < nPlanes) {
      if (dots(pl) >= 0) bucket |= 1 << pl
      pl += 1
    }
    bucket
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HyperplaneBucketExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec),
        nPlanes, planeOffset))
}
