package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: the whole shingle pipeline — lowercase, tokenize,
  * word n-grams, xxhash64, distinct, sort — as ONE Java loop per row.
  *
  * The column-expression form (`array_sort(transform(array_distinct(...)))`)
  * is semantically identical but built from higher-order functions, which Spark
  * evaluates INTERPRETED (lambda expressions don't participate in whole-stage
  * codegen): measured ~2.5s to shingle 2k documents. This expression produces
  * bit-identical arrays (same tokens, same `xxhash64` seed-42 values, same
  * sorted-distinct contract required by `SortedIntersectCount`) in a tight
  * compiled loop. Equivalence with the column form is pinned by spec, including
  * non-ASCII text. */
case class SortedHashedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_hashed_shingles requires a string argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    SortedHashedShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SortedHashedShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): SortedHashedShinglesExpr = copy(child = newChild)
}

object SortedHashedShinglesExpr {

  /** The POSITIONAL hash sequence (one xxhash64 per n-gram window, document
    * order) both shingle expressions derive from. Token semantics match the
    * column pipeline: `filter(split(lower(trim(text)), "\s+"), len > 0)` —
    * leading/trailing whitespace yields empty tokens that the non-empty
    * filter drops, so java `trim` (which strips all control whitespace, not
    * just spaces) produces the identical token list. Lowercasing goes
    * through `UTF8String.toLowerCase` — the EXACT code Spark's `Lower`
    * runs — so the kernels match the column forms bit-for-bit in every JVM
    * default locale (a `tr_TR` JVM maps ASCII 'I' to dotless 'ı' under
    * default-locale `String.toLowerCase`, silently breaking every
    * kernel==column pin; `UTF8String`'s ASCII fast path cannot). All nine
    * tokenizing kernels share this discipline — LocaleProofSpec pins it
    * under a forced Turkish default locale. */
  private[functions] def positionalHashes(text: UTF8String,
                                          n: Int): Array[Long] = {
    val words = KernelTok.words(text)
    val m = words.length - n + 1
    if (m <= 0) return Array.empty[Long]
    val hashes = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      hashes(i) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      i += 1
    }
    hashes
  }

  /** Sort + in-place dedup, shared by both shingle expressions. */
  private[functions] def sortedDistinct(hashes: Array[Long]): GenericArrayData = {
    if (hashes.isEmpty) return new GenericArrayData(Array.empty[Long])
    java.util.Arrays.sort(hashes)
    var w = 1
    var i = 1
    while (i < hashes.length) {
      if (hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }

  /** Referenced from generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData =
    sortedDistinct(positionalHashes(text, n))

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SortedHashedShinglesExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  /** SQL registration: `SELECT sorted_hashed_shingles(text, 3)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_hashed_shingles", exprs => SortedHashedShinglesExpr(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()), "built-in")
}

/** Winnowed (minimizer-sampled) window hashes — the standard cost reducer
  * for exact-substring dedup (Schleimer et al., "Winnowing: Local Algorithms
  * for Document Fingerprinting", SIGMOD'03): over the POSITIONAL n-gram hash
  * sequence, keep the minimum value of every `stride` consecutive positions,
  * then distinct-sort the kept values. ~stride× fewer emitted hashes with a
  * hard recall contract: any two documents sharing ≥ (n + stride − 1)
  * consecutive tokens share `stride` consecutive window hashes, each
  * document has a winnowing window exactly covering that run, and both
  * select the run's minimum VALUE — so the pair still collides on at least
  * one sampled hash. `stride = 1` degenerates to exactly
  * `SortedHashedShinglesExpr`. Documents with fewer than `stride` windows
  * emit the minimum of what exists (never silently nothing). */
case class WinnowedShinglesExpr(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnowed_shingles requires a string argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowed_shingles"

  override def nullSafeEval(input: Any): Any =
    WinnowedShinglesExpr.compute(input.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowedShinglesExpr.compute($c, $n, $stride)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowedShinglesExpr = copy(child = newChild)
}

object WinnowedShinglesExpr {

  /** Referenced from generated code. Sliding-window minimum via a monotonic
    * index deque — O(m) regardless of stride. */
  def compute(text: UTF8String, n: Int, stride: Int): GenericArrayData = {
    val hashes = SortedHashedShinglesExpr.positionalHashes(text, n)
    val m = hashes.length
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    if (stride <= 1) return SortedHashedShinglesExpr.sortedDistinct(hashes)
    val wins = math.max(1, m - stride + 1)
    val sel = new Array[Long](wins)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // deque holds indices with increasing hash values: [head, tail)
    var i = 0
    while (i < m) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - stride) head += 1
      if (i >= stride - 1) sel(i - stride + 1) = hashes(deque(head))
      i += 1
    }
    if (m < stride) sel(0) = hashes(deque(head)) // short doc: one window
    SortedHashedShinglesExpr.sortedDistinct(sel)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column, n: Int, stride: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WinnowedShinglesExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n, stride))
}

/** POSITIONAL window hashes — the scrub family's input: one xxhash64(seed 42)
  * per n-token window, DOCUMENT ORDER, no sort, no dedup (`posexplode`
  * consumers need the position). The compiled form of
  * `transform(wordShingles(words(text), n), g => xxhash64(g))`, which rides
  * interpreted HOFs; bit-identical by the shared
  * [[SortedHashedShinglesExpr.positionalHashes]] kernel (same tokens, same
  * joined grams, same seed). Short docs yield an empty array, exactly like
  * the column form's `.otherwise(array())` after transform. */
case class PositionalShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"positional_shingles requires a string argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positional_shingles"

  override def nullSafeEval(input: Any): Any =
    PositionalShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PositionalShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): PositionalShinglesExpr = copy(child = newChild)
}

object PositionalShinglesExpr {

  /** Referenced from generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData =
    new GenericArrayData(SortedHashedShinglesExpr.positionalHashes(text, n))

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PositionalShinglesExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n))
}
