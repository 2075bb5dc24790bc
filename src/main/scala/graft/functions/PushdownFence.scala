package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that STOPS the optimizer from moving work below the
  * few-file parallelism guard. A filter on a kernel-derived column (e.g.
  * `simhash64`'s `isNotNull`, the curation word-count gate) is pushed by
  * Catalyst straight through the guard's `Repartition` into the parquet
  * scan — with the kernel expression inlined — so the expensive per-doc
  * kernel runs in the scan stage at FILE-count parallelism, exactly what the
  * guard exists to prevent (the `shingleFrame` pushdown trap, striking
  * wherever there is no persist() barrier to stop it).
  *
  * The fence is semantically the identity (same value, same null, codegen
  * passes the child's code through untouched) but reports
  * `deterministic = false`, which Catalyst treats as a movement barrier:
  * filters referencing the fenced alias cannot cross its Project, and
  * CollapseProject will not inline it into downstream projections. Use it ON
  * the kernel expression whose alias is later filtered, immediately above an
  * `ensureParallel` exchange. Do not use fenced columns directly as join or
  * grouping KEYS (reference the aliased attribute instead — every current
  * call site does); scope it to guard sites, since non-determinism also
  * disables legitimate reorderings for anything that references it. */
case class PushdownFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pushdown_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): PushdownFence =
    copy(child = newChild)
}

object PushdownFence {
  /** Column form — direct expression construction, no registry required. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PushdownFence(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
