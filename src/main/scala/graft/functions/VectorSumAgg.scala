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

/** Elementwise sum of `array<bigint>` columns as one native aggregate — the
  * centroid-accumulation primitive for k-means over quantized embeddings.
  *
  * The relational alternative (`posexplode` to (dim, q) rows + groupBy) row-
  * amplifies the corpus by its dimensionality and shuffles every component;
  * this buffer is one long[] per group, updates add in place, partials combine
  * map-side, and integer addition makes the result bit-identical under any
  * partitioning (the engine's scaled-integer convention). Rows of differing
  * length raise: a dimension mismatch is corrupt input, not data. */
case class VectorSumAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_sum requires array<bigint>, got ${t.simpleString(10)}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val acc = if (buf.isEmpty) new Array[Long](n) else buf
    require(acc.length == n,
      s"vector_sum: dimension mismatch (${acc.length} vs $n)")
    var i = 0
    while (i < n) { acc(i) += arr.getLong(i); i += 1 }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a.length == b.length,
      s"vector_sum: dimension mismatch (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "vector_sum"

  override def withNewMutableAggBufferOffset(offset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)
}

object VectorSumAgg {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_sum", exprs => VectorSumAgg(exprs.head), "built-in")

  /** Column form; requires `register(spark)` in this session. */
  def apply(quantizedVec: Column): Column =
    call_function("vector_sum", quantizedVec)
}
