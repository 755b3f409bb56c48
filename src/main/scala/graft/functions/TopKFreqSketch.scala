package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch as a `TypedImperativeAggregate`:
  * at most `m` (word, count) counters; on overflow the minimum counter
  * is evicted and inherited (count becomes an upper bound with error
  * ≤ n/m). While total distinct ≤ m no eviction ever happens and every
  * count is EXACT — which is what the oracle checks; at 100 TB the
  * bound is what makes global top-k over an unbounded vocabulary a
  * fixed-memory single-shuffle aggregation.
  *
  * Returns array<struct<word string, cnt long>> sorted by
  * (cnt desc, word asc); slice/explode downstream for top-k rows.
  */
case class TopKFreqSketch(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("cnt", LongType))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def admit(buf: mutable.HashMap[UTF8String, Long],
                    w: UTF8String, c: Long): Unit =
    buf.get(w) match {
      case Some(prev) => buf.update(w, prev + c)
      case None if buf.size < m => buf.update(w.clone(), c)
      case None =>
        // Space-Saving eviction: replace the min counter, inherit count
        val (minW, minC) = buf.minBy(_._2)
        buf.remove(minW)
        buf.update(w.clone(), minC + c)
    }

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) admit(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
                     b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (w, c) => admit(b1, w, c) }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (w, c) => (-c, w) }
    new GenericArrayData(sorted.map { case (w, c) =>
      InternalRow(w, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val size = 4 + entries.map(e => 4 + e._1.numBytes() + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (w, c) =>
      val bytes = w.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKFreqSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFreqSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
}

object TopKFreqSketch {
  /** Column entry: heavy-hitters summary of a string column. */
  def topk_sketch(c: Column, m: Int = 1024): Column =
    GraftColumnBridge.column(
      TopKFreqSketch(GraftColumnBridge.expression(c), m).toAggregateExpression())
}
