package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native `TypedImperativeAggregate` sketch: one mutable
  * `Array[Long]` buffer of `numHashes` minima, updated per hashed-shingle row with
  * `numHashes` cheap splitmix64 permutations, merged elementwise — instead of
  * planning 64 separate `min()` aggregate expressions.
  *
  * Scale properties: the buffer is fixed-size (numHashes × 8 bytes) regardless of
  * document length; update/merge are associative+commutative, so partial aggregation
  * runs map-side and the signature is identical under any partitioning — verified by
  * the partition-invariance spec. SURVEY.md §7.5's MinHash-sketch extension. */
case class MinHashSketch(child: Expression, numHashes: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch requires a bigint input (hashed shingle), got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val p = MinHashSketch.mix(h ^ MinHashSketch.seed(i))
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)
}

object MinHashSketch {
  private final val MaxHashes = 1024
  /** splitmix64 finalizer — cheap, well-mixed 64-bit permutation family. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private val seeds: Array[Long] = Array.tabulate(MaxHashes)(i => mix(i.toLong))
  def seed(i: Int): Long = seeds(i)

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sketch", exprs => {
        val k = exprs(1).eval(null).asInstanceOf[Number].intValue()
        require(k > 0 && k <= MaxHashes, s"numHashes must be in (0, $MaxHashes]")
        MinHashSketch(exprs.head, k)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", exprs => {
        val k = exprs(1).eval(null).asInstanceOf[Number].intValue()
        require(k > 0 && k <= MaxHashes, s"numHashes must be in (0, $MaxHashes]")
        MinHashSignature(exprs.head, k)
      }, "built-in")
  }

  /** Column form; requires `register(spark)` in this session. */
  def apply(hashedShingle: Column, numHashes: Int): Column =
    call_function("minhash_sketch", hashedShingle,
      org.apache.spark.sql.functions.lit(numHashes))

  /** Referenced from `MinHashSignature` generated code: signature of one
    * hashed-shingle array. Identical values to the aggregate form (same mix/seed),
    * wrap-around arithmetic native to the JVM (no ANSI overflow concerns). */
  def sigFromArray(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                   k: Int): GenericArrayData = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val p = mix(h ^ seed(i))
        if (p < out(i)) out(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** In-row signature over a hashed-shingle ARRAY column: sig[i] = min over
    * shingles h of mix(h ^ seed(i)) — the exact values the `MinHashSketch`
    * aggregate produces, but computed per row with zero explode and zero shuffle
    * (`MinHashSignature` native expression). Use this form when the shingles are
    * already an array column (the LSH dedup path); use the aggregate when shingle
    * rows arrive exploded. Equality of the two forms is pinned by spec.
    * Requires `register(spark)`. */
  def sketchCol(hashedShingles: Column, numHashes: Int): Column =
    call_function("minhash_signature", hashedShingles,
      org.apache.spark.sql.functions.lit(numHashes))
}

/** Native codegen expression: MinHash signature (array<bigint>[numHashes]) of a
  * hashed-shingle array, one inlined double loop per row — the shuffle-free
  * signature path for LSH dedup (SURVEY.md §2.10 altitude: native Expression over
  * UDF over driver logic). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires array<bigint>, got ${t.simpleString(10)}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSketch.sigFromArray(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSketch.sigFromArray($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
