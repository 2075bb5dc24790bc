package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: the whole 64-bit SimHash signature — tokenize,
  * xxhash64 each token occurrence, per-bit sign sums, sign threshold — as ONE
  * compiled loop per row.
  *
  * The relational formulation (`Dedup.simhash64Agg`: explode words, 64
  * conditional-sum aggregates) shuffles every token occurrence of the corpus —
  * at 100 TB that exchange IS the cost of the operator. The signature is a
  * pure per-document function, so it belongs in the scan-stage projection:
  * this expression computes identical signatures (same tokens, same xxhash64
  * seed-42 values, same `sum > 0` bit rule, token MULTIPLICITY counted) with
  * zero shuffle. NULL for documents with no tokens — the aggregate form emits
  * no row for those, and equivalence is pinned by spec.
  * ref: SURVEY.md §2 beyond-reference dedup family. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("sim")
      s"""
         |java.lang.Long $boxed = graft.functions.SimHash64Expr.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {

  /** Referenced from generated code. Token semantics match `TextFns.words`
    * (lowercase, trim, split on whitespace, empties dropped); every token
    * OCCURRENCE contributes its hash bits, matching the aggregate form.
    * Returns null (no signature) for token-less documents. */
  def compute(text: UTF8String): java.lang.Long = {
    val words = KernelTok.words(text)
    if (words.isEmpty) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = XxHash64Function.hash(
        UTF8String.fromString(words(i)), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sim |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHash64Expr(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** SQL registration: `SELECT simhash64(text)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "built-in")
}
