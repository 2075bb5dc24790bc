package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: marker-stopword hit counts for N word lists in
  * ONE tokenize pass — `array(count(w in set1), ..., count(w in setN))`.
  *
  * The column form (`filter(ws, w => array_contains(stops, w))` per list)
  * evaluates N interpreted lambdas per row AND re-tokenizes per list; the
  * language-ID heuristic scores 5 lists per document, making it the last
  * interpreted-HOF consumer in the per-document hot path. Equivalence with
  * the column form is spec-pinned. */
case class StopCountsExpr(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stop_counts requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "stop_counts"

  @transient private lazy val markerSets: Array[java.util.HashSet[String]] =
    markers.map { m =>
      val s = new java.util.HashSet[String]()
      m.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    StopCountsExpr.compute(input.asInstanceOf[UTF8String], markerSets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", markerSets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StopCountsExpr.compute($c, $setsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopCountsExpr =
    copy(child = newChild)
}

object StopCountsExpr {

  /** Referenced from generated code. Token semantics match `TextFns.words`. */
  def compute(text: UTF8String,
              sets: Array[java.util.HashSet[String]]): GenericArrayData = {
    val words = KernelTok.words(text)
    val counts = new Array[Long](sets.length)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var k = 0
      while (k < sets.length) {
        if (sets(k).contains(w)) counts(k) += 1
        k += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column, markers: Seq[Seq[String]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      StopCountsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), markers))
}
