package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Bounded-heap top-k per group as a native `TypedImperativeAggregate` — the
  * 100 TB plan for "top k rows per key".
  *
  * The ranking-window form (`row_number().over(partitionBy(g).orderBy(...)) <=
  * k`) shuffles EVERY row of the corpus to its group's partition and fully
  * sorts each group before discarding all but k rows. This aggregate keeps a
  * k-entry buffer per group ordered by (sort DESC, tie ASC): updates are O(k)
  * bounded, partial aggregation runs map-side (a mapper emits at most k rows
  * per group it saw — the shuffle carries k·groups·mappers rows worst case,
  * not the corpus), and merge is an O(k) two-pointer step. With a total
  * (sort, tie) order the result is EXACTLY the window form's row set,
  * independent of partitioning — pinned by spec and by the q63/q07 shared
  * oracle.
  *
  * Input: a struct whose field 0 is the LONG sort key (descending — use the
  * engine's scaled-integer convention for monetary/float keys) and field 1
  * the LONG tie-break (ascending, unique within a group for full
  * determinism); remaining fields are payload carried to the output. Returns
  * the struct array ordered best→worst (index = rank − 1). */
case class TopKAgg(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buffer] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length >= 2 &&
      s(0).dataType == LongType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      "topk_struct requires struct<sort: bigint, tie: bigint, payload...>, " +
        s"got ${t.simpleString(10)}")
  }

  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val sort = row.getLong(0)
      val tie = row.getLong(1)
      // copy only when the row actually enters the buffer
      if (buf.wouldAccept(sort, tie)) buf.insert(sort, tie, proj(row).copy())
    }
    buf
  }

  override def merge(a: TopKAgg.Buffer, b: TopKAgg.Buffer): TopKAgg.Buffer = {
    var i = 0
    while (i < b.size) {
      if (a.wouldAccept(b.sorts(i), b.ties(i))) a.insert(b.sorts(i), b.ties(i), b.rows(i))
      else i = b.size // b is ordered: first rejection rejects the rest
      i += 1
    }
    a
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) { out(i) = buf.rows(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeLong(buf.sorts(i))
      out.writeLong(buf.ties(i))
      val bytes = buf.rows(i).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKAgg.Buffer(k)
    var i = 0
    while (i < n) {
      val sort = in.readLong()
      val tie = in.readLong()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf.insert(sort, tie, row) // entries arrive ordered; inserts are O(1) appends
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "topk_struct"

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {

  /** k-bounded ordered buffer: entries kept sorted by (sort DESC, tie ASC).
    * Arrays, no boxing; insert shifts at most k entries. */
  final class Buffer(k: Int) {
    val sorts = new Array[Long](k)
    val ties = new Array[Long](k)
    val rows = new Array[UnsafeRow](k)
    var size = 0

    /** True iff (sort, tie) beats the current worst or the buffer has room. */
    def wouldAccept(sort: Long, tie: Long): Boolean =
      size < k || better(sort, tie, sorts(size - 1), ties(size - 1))

    private def better(s1: Long, t1: Long, s2: Long, t2: Long): Boolean =
      s1 > s2 || (s1 == s2 && t1 < t2)

    def insert(sort: Long, tie: Long, row: UnsafeRow): Unit = {
      var pos = size
      while (pos > 0 && better(sort, tie, sorts(pos - 1), ties(pos - 1))) pos -= 1
      if (pos >= k) return
      val last = math.min(size, k - 1)
      var i = last
      while (i > pos) {
        sorts(i) = sorts(i - 1); ties(i) = ties(i - 1); rows(i) = rows(i - 1)
        i -= 1
      }
      sorts(pos) = sort; ties(pos) = tie; rows(pos) = row
      if (size < k) size += 1
    }
  }

  private final val MaxK = 4096

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_struct", exprs => {
        val k = exprs(1).eval(null).asInstanceOf[Number].intValue()
        require(k > 0 && k <= MaxK, s"k must be in (0, $MaxK]")
        TopKAgg(exprs.head, k)
      }, "built-in")

  /** Column form; requires `register(spark)` in this session. */
  def apply(struct: Column, k: Int): Column =
    call_function("topk_struct", struct,
      org.apache.spark.sql.functions.lit(k))
}
