package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernel: hashed character n-gram feature buckets — the
  * fastText-LID feature shape (subword evidence needs no tokenizer and no
  * language-specific rules; language identity lives in character-sequence
  * statistics). One row-pass emits, for every n in [nMin, nMax], the FNV-1a
  * 64 hash of each n-CODEPOINT window's UTF-8 bytes, positive-mod `dim` —
  * exactly `pmod(rolling_hash64(substr(s, i, n)), dim)` per window, so a SQL
  * oracle re-derives every bucket from `substr` + the q85 FNV walk
  * byte-for-byte (DuckDB's `substr`/`len` are codepoint-based; windows here
  * are codepoint-aligned byte ranges of the SAME UTF-8 bytes `encode()`
  * yields).
  *
  * The window hash runs directly over the shared byte buffer (offsets at
  * codepoint boundaries) — no per-window substring allocation; the whole
  * expression participates in whole-stage codegen (higher-order-function
  * `transform(sequence(...))` forms evaluate interpreted — the BASELINE r2
  * lesson). Counts are NOT deduplicated: the bag semantics (one entry per
  * occurrence) is what the downstream count aggregate expects. */
case class CharNgramBucketsExpr(child: Expression, nMin: Int, nMax: Int,
                                dim: Int) extends UnaryExpression {
  require(nMin >= 1 && nMax >= nMin, s"bad n-gram range [$nMin, $nMax]")
  require(dim > 0, s"dim must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngram_buckets requires a string argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_ngram_buckets"

  override def nullSafeEval(input: Any): Any =
    CharNgramFns.buckets(input.asInstanceOf[UTF8String], nMin, nMax, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharNgramFns.buckets($c, $nMin, $nMax, $dim)")

  override protected def withNewChildInternal(
      newChild: Expression): CharNgramBucketsExpr = copy(child = newChild)
}

object CharNgramFns {

  /** Referenced from generated Java code — must stay public. */
  def buckets(s: UTF8String, nMin: Int, nMax: Int,
              dim: Int): GenericArrayData = {
    val bytes = s.getBytes
    // codepoint start offsets (+ end sentinel): a UTF-8 continuation byte
    // is 10xxxxxx, every other byte starts a codepoint
    var cp = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) cp += 1
      i += 1
    }
    val starts = new Array[Int](cp + 1)
    var k = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(k) = i; k += 1 }
      i += 1
    }
    starts(cp) = bytes.length
    var total = 0
    var n = nMin
    while (n <= nMax) { total += math.max(0, cp - n + 1); n += 1 }
    val out = new Array[Int](total)
    var o = 0
    n = nMin
    while (n <= nMax) {
      var w = 0
      val last = cp - n
      while (w <= last) {
        var h = RollingHash64.Offset
        var p = starts(w)
        val end = starts(w + n)
        while (p < end) {
          h = (h ^ (bytes(p) & 0xffL)) * RollingHash64.Prime
          p += 1
        }
        val m = (h % dim).toInt
        out(o) = if (m < 0) m + dim else m
        o += 1
        w += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Column form. */
  def charNgramBuckets(c: org.apache.spark.sql.Column, nMin: Int, nMax: Int,
                       dim: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CharNgramBucketsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), nMin, nMax, dim))

  /** Register as SQL: `char_ngram_buckets(text, nMin, nMax, dim)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngram_buckets", exprs => CharNgramBucketsExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int],
        exprs(3).eval().asInstanceOf[Int]), "built-in")
}
