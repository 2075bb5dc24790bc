package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED, DISTINCT long arrays via a
  * linear merge walk — zero allocation per row.
  *
  * This is the hot kernel of n-gram Jaccard dedup: `array_intersect` rebuilds a hash
  * set of one side for EVERY candidate pair (O(n) allocations × millions of pairs);
  * pre-sorting each document's shingle set once (O(n log n), per doc not per pair)
  * turns every pairwise intersection into an allocation-free two-pointer scan. Codegen
  * emits the loop inline in the whole-stage-generated function. Inputs that are not
  * sorted+distinct give undefined counts — callers own the contract (array_sort over
  * hashedShingles satisfies it). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires array<bigint> args, got " +
          s"${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var cnt = 0L
    val an = a.numElements(); val bn = b.numElements()
    while (i < an && j < bn) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0;
         |final int $an = $a.numElements();
         |final int $bn = $b.numElements();
         |long ${ev.value}_cnt = 0L;
         |while ($i < $an && $j < $bn) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value}_cnt++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}_cnt;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs.head, exprs(1)), "built-in")

  /** Column form; requires `register(spark)` to have run in this session. */
  def apply(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)
}

/** Native Catalyst expression: the SMALLEST common element of two SORTED long
  * arrays (NULL if disjoint) — the same zero-allocation merge walk as
  * `SortedIntersectCount`, stopped at the first hit.
  *
  * This is the "first shared band" trick transplanted to the PPJoin prefix
  * join: a candidate pair sharing k prefix tokens is matched k times by the
  * token equi-join, and gating the emit on `tok == sorted_intersect_min(prefA,
  * prefB)` keeps exactly one of those matches — candidate sets are
  * duplicate-free by construction, with no distinct/shuffle-dedupe stage. */
case class SortedIntersectMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_min requires array<bigint> args, got " +
          s"${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_min"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0
    val an = a.numElements(); val bn = b.numElements()
    while (i < an && j < bn) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) return x
      else if (x < y) i += 1
      else j += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0;
         |final int $an = $a.numElements();
         |final int $bn = $b.numElements();
         |${ev.isNull} = true;
         |while ($i < $an && $j < $bn) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value} = $x; ${ev.isNull} = false; break; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectMin =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectMin {
  /** Column form — direct expression construction, no registry required. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SortedIntersectMin(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
