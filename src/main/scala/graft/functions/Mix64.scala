package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the splitmix64 finalizer (Steele et al. 2014,
  * "Fast Splittable Pseudorandom Number Generators" — the same fmix shape as
  * MurmurHash3's) over a 64-bit value. FNV-1a (`RollingHash64`) avalanches
  * its LOW bits well but leaves the HIGH bits of short inputs nearly
  * constant — fatal for any consumer that partitions the hash positionally
  * (HLL buckets = top bits, rho = leading zeros). One xorshift-multiply
  * cascade makes every output bit depend on every input bit. Java `long`
  * arithmetic wraps mod 2⁶⁴ by definition, so the expression is immune to
  * ANSI overflow modes, and the identical walk is re-derivable in integer
  * SQL (xor on the signed view, multiply mod 2⁶⁴ on the unsigned view). */
case class Mix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix64 requires a bigint argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"

  override def nullSafeEval(input: Any): Any =
    Mix64.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mix64.mix($c)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

object Mix64 {
  /** Referenced from generated Java code — must stay public. */
  def mix(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      Mix64(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Register as a SQL function: `SELECT mix64(x)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mix64", exprs => Mix64(exprs.head), "built-in")
}
