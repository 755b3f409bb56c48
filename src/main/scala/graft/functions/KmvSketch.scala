package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The MATERIALIZED half of the KMV distinct sketch: aggregates values
  * into the serialized k-min buffer itself (`BinaryType`), so partial
  * sketches can be STORED — one row per (day, shard, …) in a summary
  * table — and re-aggregated later with [[KmvMergeDistinct]] without
  * touching the raw data again. This is the lakehouse sketch-rollup
  * pattern (store daily sketches, answer weekly/monthly distincts by
  * merging k·8-byte blobs), the batch sibling of the streaming
  * sketch-buffer-as-state gates.
  *
  * Buffer layout matches [[KmvDistinct.serialize]]: int32 count then
  * that many int64 hashes, ascending.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(XxHash64Function.hash(v, child.dataType, 42L))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    serialize(buf)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvSketchAgg.write(buf)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvSketchAgg.read(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
}

object KmvSketchAgg {
  private[functions] def write(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  private[functions] def read(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  /** Aggregate values into a serialized KMV buffer (store me). */
  def kmv_sketch(c: Column, k: Int = 1024): Column =
    GraftColumnBridge.column(
      KmvSketchAgg(GraftColumnBridge.expression(c), k).toAggregateExpression())
}

/** Re-aggregation half: merges SERIALIZED KMV buffers (as produced by
  * [[KmvSketchAgg]]) and evaluates the distinct estimate — exact while
  * the merged sketch stays below k, the same contract as
  * [[KmvDistinct]]. Merging never needs the raw data: a year of daily
  * sketches re-rolls from 365 blobs.
  */
case class KmvMergeDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.addAll(KmvSketchAgg.read(v.asInstanceOf[Array[Byte]]))
      while (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      val r = (buf.last().doubleValue() - Long.MinValue.toDouble) / math.pow(2, 64)
      math.round((k - 1) / math.max(r, java.lang.Double.MIN_VALUE))
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvSketchAgg.write(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvSketchAgg.read(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvMergeDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
}

object KmvMergeDistinct {
  /** Merge serialized KMV buffers into the distinct estimate. */
  def kmv_merge_distinct(c: Column, k: Int = 1024): Column =
    GraftColumnBridge.column(
      KmvMergeDistinct(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
