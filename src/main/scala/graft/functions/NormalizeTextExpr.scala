package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the whole CCNet normalization pipeline
  * (lowercase → strip accents → digits→0 → collapse whitespace → trim) as
  * ONE compiled pass — bit-identical to the four chained column stages
  * (`TextFns.normalizeTextCols`, the spec-pinned reference), which cost two
  * regex engines per row on the hot path. On ASCII input (the common case at
  * corpus scale) the kernel is a single byte loop with zero regex, zero
  * Normalizer, and one output allocation.
  *
  * Bit-equality notes, stage by stage:
  *  - lowercase = `UTF8String.toLowerCase` (exactly Spark's `Lower`);
  *    the ASCII fast path folds A–Z inline.
  *  - accent strip = [[StripAccentsExpr.strip]] (NFD + drop Mn); pure-ASCII
  *    bytes skip it entirely, matching its own fast path.
  *  - digit map replays `regexp_replace(x, "[0-9]", "0")`: '0'–'9' → '0'.
  *  - whitespace replays `trim(regexp_replace(x, "\s+", " "))`: Java `\s`
  *    is exactly [ \t\n\u000B\f\r] (no Unicode ws without the flag), a run
  *    becomes one space, and the leading/trailing runs that `trim` would
  *    drop are never emitted. */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeTextExpr.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeTextExpr = copy(child = newChild)
}

object NormalizeTextExpr {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Referenced from generated Java code — must stay public. */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) {
      // single byte pass: lower + digit map + ws collapse + trim
      val out = new Array[Byte](n)
      var o = 0
      var sawWs = false
      var j = 0
      while (j < n) {
        val b = s.getByte(j)
        if (isWs(b.toChar)) sawWs = true
        else {
          if (sawWs && o > 0) { out(o) = ' '; o += 1 }
          sawWs = false
          out(o) =
            if (b >= 'A' && b <= 'Z') (b + 32).toByte
            else if (b >= '1' && b <= '9') '0'.toByte
            else b
          o += 1
        }
        j += 1
      }
      UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
    } else {
      val stripped = StripAccentsExpr.strip(s.toLowerCase).toString
      val sb = new java.lang.StringBuilder(stripped.length)
      var sawWs = false
      var j = 0
      while (j < stripped.length) {
        val c = stripped.charAt(j)
        if (isWs(c)) sawWs = true
        else {
          if (sawWs && sb.length > 0) sb.append(' ')
          sawWs = false
          sb.append(if (c >= '0' && c <= '9') '0' else c)
        }
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NormalizeTextExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Register as a SQL function: `SELECT normalize_text(x)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text", exprs => NormalizeTextExpr(exprs.head), "built-in")
}
