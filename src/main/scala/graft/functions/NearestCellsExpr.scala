package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen expression: the ids of a vector's `take` nearest IVF
  * centroids — per-centroid integer dot, cosine, HALF_UP 6-dp round, ordered
  * by (cosine desc, centroid_id asc) — in one compiled loop over the packed
  * centroid array.
  *
  * The column form (`Similarity.nearestCellIdsCols`: `transform` + `array_sort`
  * over the struct array) evaluates interpreted per row; cell assignment runs
  * once per CORPUS vector at index build, making it the 100 TB hot path of the
  * IVF family. Results are bit-compatible (same rounding, same tie order) and
  * spec-pinned. Inputs: `cents` = array<struct<centroid_id:long,
  * centv:array<long>, centn:double>> (the broadcast packed-centroid row),
  * `vec` = the row's quantized vector, `norm` = its precomputed norm. */
case class NearestCellsExpr(first: Expression, second: Expression,
                            third: Expression, take: Int)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(_: StructType, _), ArrayType(LongType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"nearest_cells requires (array<struct>, array<bigint>, double), got " +
          s"${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(cents: Any, vec: Any, norm: Any): Any =
    NearestCellsExpr.compute(cents.asInstanceOf[ArrayData],
      vec.asInstanceOf[ArrayData], norm.asInstanceOf[Double], take)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, v, n) =>
      s"graft.functions.NearestCellsExpr.compute($c, $v, $n, $take)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): NearestCellsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCellsExpr {

  /** Referenced from generated code. Centroid struct layout is positional:
    * (centroid_id long, centv array<long>, centn double). Rounding matches
    * Spark `round(x, 6)` (BigDecimal HALF_UP, not Math.round). */
  def compute(cents: ArrayData, vec: ArrayData, norm: Double,
              take: Int): GenericArrayData = {
    val nCells = cents.numElements()
    val dims = vec.numElements()
    val negcos = new Array[Double](nCells)
    val cids = new Array[Long](nCells)
    var c = 0
    while (c < nCells) {
      val row = cents.getStruct(c, 3)
      val centv = row.getArray(1)
      var dot = 0L
      var d = 0
      while (d < dims) {
        dot += vec.getLong(d) * centv.getLong(d)
        d += 1
      }
      val cos = dot.toDouble / (norm * row.getDouble(2))
      // Spark's RoundBase passes NaN/Infinity through untouched;
      // BigDecimal.valueOf would throw on them (zero-norm degenerate vectors)
      val rounded =
        if (java.lang.Double.isNaN(cos) || java.lang.Double.isInfinite(cos)) cos
        else java.math.BigDecimal.valueOf(cos)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      negcos(c) = -rounded
      cids(c) = row.getLong(0)
      c += 1
    }
    // selection sort of the tiny cell list by (negcos asc, cid asc) — nCells is
    // index-configuration-sized (tens), not data-sized
    val k = math.min(take, nCells)
    val out = new Array[Long](k)
    val used = new Array[Boolean](nCells)
    var slot = 0
    while (slot < k) {
      var best = -1
      var i = 0
      while (i < nCells) {
        if (!used(i) && (best < 0 || negcos(i) < negcos(best) ||
          (negcos(i) == negcos(best) && cids(i) < cids(best)))) best = i
        i += 1
      }
      used(best) = true
      out(slot) = cids(best)
      slot += 1
    }
    new GenericArrayData(out)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(cents: Column, vec: Column, norm: Column, take: Int): Column = {
    val B = org.apache.spark.sql.graft.ColumnBridge
    B.column(NearestCellsExpr(
      B.expression(cents), B.expression(vec), B.expression(norm), take))
  }
}
