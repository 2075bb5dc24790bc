package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernel for the exact-substring scrub's REBUILD half
  * (`Dedup.scrubSharedWindows`): given a document and the SORTED start
  * positions of its duplicated `window`-token spans, drop every token covered
  * by any span and re-join the survivors — one two-pointer pass per row.
  *
  * The pre-r11 plan materialized the rebuild corpus-side: a token posexplode,
  * a `window`×-amplified drop-mark explode (+ distinct), a token-scale
  * anti-join, and a per-doc sort-struct collect_list — measured 66 s at sf1 on
  * the duplicate-dense census corpus, all of it row traffic this kernel makes
  * in-row. The doc-bounded `collect_list` of duplicate START positions is the
  * only thing that still crosses a shuffle. That exploded plan is kept as
  * `Dedup.scrubSharedWindowsExploded`, the spec-pinned reference this kernel
  * is bit-equal to.
  *
  * Tokenization matches `TextFns.words` exactly (lowercase, trim, split on
  * whitespace runs, empty tokens dropped) — the same contract
  * `SortedHashedShinglesExpr.positionalHashes` pins, so a start position `p`
  * from `posexplode(positionalShingles(...))` addresses the same token index
  * this kernel sees. Coverage rule: token `t` is dropped iff some start `p`
  * satisfies `p <= t <= p + window - 1`. Starts MUST be ascending (callers
  * use `sort_array`); overlapping/adjacent spans merge naturally via the
  * running coverage end. Returns struct(n_tokens, kept: bigint, scrubbed:
  * string) — n_tokens = total token count (so callers never pay a second
  * tokenize for it), kept = surviving token count, scrubbed = survivors
  * joined by single spaces ("" when everything was cut). */
case class ScrubTokensExpr(left: Expression, right: Expression, window: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"scrub_tokens requires (string, array<int>) args, got " +
          s"${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("kept", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
  override def prettyName: String = "scrub_tokens"

  override def nullSafeEval(text: Any, starts: Any): Any =
    ScrubTokensExpr.compute(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.ScrubTokensExpr.compute($t, $s, $window)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScrubTokensExpr =
    copy(left = newLeft, right = newRight)
}

object ScrubTokensExpr {

  /** Referenced from generated code. */
  def compute(text: UTF8String, starts: ArrayData, window: Int): InternalRow = {
    val words = KernelTok.words(text)
    val ns = starts.numElements()
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var si = 0
    var covEnd = -1L
    var t = 0
    while (t < words.length) {
      while (si < ns && starts.getInt(si) <= t) {
        val e = starts.getInt(si).toLong + (window - 1)
        if (e > covEnd) covEnd = e
        si += 1
      }
      if (t > covEnd) {
        if (kept > 0L) sb.append(' ')
        sb.append(words(t))
        kept += 1L
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](words.length.toLong, kept,
      UTF8String.fromString(sb.toString)))
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column, starts: Column, window: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ScrubTokensExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        org.apache.spark.sql.graft.ColumnBridge.expression(starts), window))
}
