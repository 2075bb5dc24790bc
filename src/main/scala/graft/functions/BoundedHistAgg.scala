package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bin-bounded sorted-histogram collect: `collect_list(struct(v, c))` with the
  * cardinality guard INSIDE the aggregation buffer — the refusal is enforced
  * where the memory would actually be spent, not by a separate probe job.
  *
  * `Quantiles.strataStats` packs each stratum's value histogram into one row;
  * that is only safe when the value column is histogram-shaped. The r6 guard
  * ran an EAGER per-stratum distinct-count probe first, which cost a second
  * aggregation job plus a persisted histogram (doubled q66, leaked cache on
  * long-lived sessions — r6 ADVICE). Here the guard is free: every partial
  * buffer (and every merge) refuses loudly the moment a group's bin count
  * crosses `maxBins`, BEFORE the oversized array is materialized anywhere —
  * map-side partials are bounded too, so no executor ever holds more than
  * `maxBins` entries per group. One aggregation, zero extra jobs, no cache.
  *
  * Input rows must be (v, c) pairs unique per (group, v) — exactly what a
  * prior `groupBy(group, v).count()` emits. Output: the pairs sorted by v
  * ascending as `array<struct<__v, __c>>` (the `rankSelect` layout). Duplicate
  * v across inputs would simply yield adjacent bins, which cumulative-rank
  * readers handle, but the intended contract is the pre-grouped form. */
case class BoundedHistAgg(child: Expression, maxBins: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedHistAgg.Buffer] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 2 &&
      s(0).dataType == LongType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bounded_hist requires struct<v: bigint, c: bigint>, got ${t.simpleString(10)}")
  }

  override def createAggregationBuffer(): BoundedHistAgg.Buffer =
    new BoundedHistAgg.Buffer(maxBins)

  override def update(buf: BoundedHistAgg.Buffer, input: InternalRow): BoundedHistAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.append(row.getLong(0), row.getLong(1))
    }
    buf
  }

  override def merge(a: BoundedHistAgg.Buffer, b: BoundedHistAgg.Buffer): BoundedHistAgg.Buffer = {
    var i = 0
    while (i < b.size) { a.append(b.vs(i), b.cs(i)); i += 1 }
    a
  }

  override def eval(buf: BoundedHistAgg.Buffer): Any = {
    val order = (0 until buf.size).sortBy(i => buf.vs(i))
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      val j = order(i)
      out(i) = InternalRow(buf.vs(j), buf.cs(j))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: BoundedHistAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.vs(i)); out.writeLong(buf.cs(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedHistAgg.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new BoundedHistAgg.Buffer(maxBins)
    var i = 0
    while (i < n) { buf.append(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("__v", LongType, nullable = false),
      StructField("__c", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bounded_hist"

  override def withNewMutableAggBufferOffset(offset: Int): BoundedHistAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedHistAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedHistAgg =
    copy(child = newChildren.head)
}

object BoundedHistAgg {

  /** Growable (v, c) pair store, append-only, bounded by `maxBins`. */
  final class Buffer(maxBins: Int) {
    var vs = new Array[Long](16)
    var cs = new Array[Long](16)
    var size = 0

    def append(v: Long, c: Long): Unit = {
      if (size >= maxBins)
        throw new IllegalStateException(
          s"bounded_hist: a group exceeds $maxBins distinct values of the " +
            "rank column — the value column is too high-cardinality for an " +
            "in-row histogram; bucket it first (e.g. cast to a coarser " +
            "unit), raise maxBinsPerStratum deliberately, or use " +
            "Quantiles.strataStatsApprox (mergeable sketch, no bin bound)")
      if (size == vs.length) {
        vs = java.util.Arrays.copyOf(vs, vs.length * 2)
        cs = java.util.Arrays.copyOf(cs, cs.length * 2)
      }
      vs(size) = v
      cs(size) = c
      size += 1
    }
  }

  private final val MaxBinsCeiling = 64 * 1024 * 1024

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_hist", exprs => {
        val maxBins = exprs(1).eval(null).asInstanceOf[Number].intValue()
        require(maxBins > 0 && maxBins <= MaxBinsCeiling,
          s"maxBins must be in (0, $MaxBinsCeiling]")
        BoundedHistAgg(exprs.head, maxBins)
      }, "built-in")

  /** Column form; requires `register(spark)` in this session. */
  def apply(vc: Column, maxBins: Long): Column =
    call_function("bounded_hist", vc,
      org.apache.spark.sql.functions.lit(maxBins))
}
