package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WEIGHTED Space-Saving heavy hitters (Metwally et al.'s algorithm
  * under weighted updates): each key admits its row's non-negative
  * LONG weight instead of 1, so the sketch answers "top keys by total
  * weight" (revenue per customer, bytes per host) in one bounded-state
  * aggregation. The guarantee generalizes verbatim — on eviction the
  * newcomer inherits the minimum total, so every reported total is an
  * upper bound with error ≤ W/m (W = total weight seen); while
  * distinct keys ≤ m no eviction happens and totals are EXACT, which
  * is the oracle's validity window. State is the same ≤ m-entry
  * counter map as [[TopKFreqSketch]] ([[TopKFreqSketch.Summary]] is
  * reused, including its O(log m) eviction index).
  *
  * Returns array<struct<word string, cnt long>> sorted by
  * (cnt desc, word asc).
  */
case class TopKWeightedSketch(
    child: Expression,
    weight: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKFreqSketch.Summary] {

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("cnt", LongType))), containsNull = false)

  override def createAggregationBuffer(): TopKFreqSketch.Summary =
    new TopKFreqSketch.Summary

  override def update(buf: TopKFreqSketch.Summary,
                      input: InternalRow): TopKFreqSketch.Summary = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val wl = w.asInstanceOf[Long]
      require(wl >= 0, "weighted Space-Saving needs non-negative weights")
      buf.admit(v.asInstanceOf[UTF8String], wl, m)
    }
    buf
  }

  override def merge(b1: TopKFreqSketch.Summary,
                     b2: TopKFreqSketch.Summary): TopKFreqSketch.Summary = {
    b2.counts.foreach { case (k, c) => b1.admit(k, c, m) }
    b1
  }

  override def eval(buf: TopKFreqSketch.Summary): Any = {
    val sorted = buf.counts.toArray.sortBy { case (w, c) => (-c, w) }(
      Ordering.Tuple2(Ordering.Long, TopKFreqSketch.utf8Ordering))
    new GenericArrayData(sorted.map { case (w, c) =>
      InternalRow(w, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKFreqSketch.Summary): Array[Byte] = {
    val entries = buf.counts.toArray
    val size = 4 + entries.map(e => 4 + e._1.numBytes() + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (w, c) =>
      val bytes = w.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKFreqSketch.Summary = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKFreqSketch.Summary
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.insert(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKWeightedSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKWeightedSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs(0), weight = cs(1))
}

object TopKWeightedSketch {
  /** Column entry: weighted heavy-hitters summary. */
  def topk_weighted(c: Column, w: Column, m: Int = 1024): Column =
    GraftColumnBridge.column(
      TopKWeightedSketch(GraftColumnBridge.expression(c),
        GraftColumnBridge.expression(w), m).toAggregateExpression())
}
