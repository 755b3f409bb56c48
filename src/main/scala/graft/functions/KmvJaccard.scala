package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StructField, StructType}

/** Two-set KMV sketch with SET OPERATIONS — the "store one sketch per
  * shard, union/intersect later" pattern next to [[KmvDistinct]]'s
  * plain cardinality: rows carry a boolean side, the buffer keeps the
  * k smallest distinct xxhash64 values PER SIDE, and eval reports
  * `(n_a, n_b, n_inter, jaccard_ppm)`.
  *
  * Exactness contract (what the oracle checks at test scale): while
  * BOTH sides stay below k the buffers are the complete hash sets, so
  * intersection/union counts are exact (modulo the ~n²/2⁶⁴ hash
  * collision odds every hash-based distinct shares). Past k the
  * estimator is the classic k-min-union: keep the k smallest of
  * A ∪ B; `jaccard ≈ |S ∩ A_k ∩ B_k| / k` and
  * `|union| ≈ (k−1)/R_k`, each within ~1/√k — and the buffer is
  * bounded at 2·8k bytes per group no matter the cardinality.
  */
case class KmvJaccard(
    child: Expression,
    side: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvJaccard.Buf] {

  override def children: Seq[Expression] = Seq(child, side)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_a", LongType, nullable = false),
    StructField("n_b", LongType, nullable = false),
    StructField("n_inter", LongType, nullable = false),
    StructField("jaccard_ppm", LongType, nullable = false)))

  override def createAggregationBuffer(): KmvJaccard.Buf =
    new KmvJaccard.Buf(
      new java.util.TreeSet[java.lang.Long](),
      new java.util.TreeSet[java.lang.Long]())

  private def trim(s: java.util.TreeSet[java.lang.Long]): Unit =
    while (s.size > k) s.pollLast()

  override def update(buf: KmvJaccard.Buf, input: InternalRow): KmvJaccard.Buf = {
    val v = child.eval(input)
    val s = side.eval(input)
    if (v != null && s != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val t = if (s.asInstanceOf[Boolean]) buf.a else buf.b
      t.add(h)
      trim(t)
    }
    buf
  }

  override def merge(b1: KmvJaccard.Buf, b2: KmvJaccard.Buf): KmvJaccard.Buf = {
    b1.a.addAll(b2.a); trim(b1.a)
    b1.b.addAll(b2.b); trim(b1.b)
    b1
  }

  override def eval(buf: KmvJaccard.Buf): Any = {
    val (na, nb) = (buf.a.size, buf.b.size)
    val out = new GenericInternalRow(4)
    if (na < k && nb < k) {
      // complete hash sets: exact counts
      var inter = 0L
      val it = buf.a.iterator()
      while (it.hasNext) if (buf.b.contains(it.next())) inter += 1
      val uni = na.toLong + nb.toLong - inter
      out.update(0, na.toLong); out.update(1, nb.toLong)
      out.update(2, inter)
      out.update(3, if (uni == 0L) 0L else inter * 1000000L / uni)
    } else {
      // k-min-union estimator
      val s = new java.util.TreeSet[java.lang.Long](buf.a)
      s.addAll(buf.b)
      while (s.size > k) s.pollLast()
      var inBoth = 0L
      val it = s.iterator()
      while (it.hasNext) {
        val h = it.next()
        if (buf.a.contains(h) && buf.b.contains(h)) inBoth += 1
      }
      def est(t: java.util.TreeSet[java.lang.Long]): Long =
        if (t.size < k) t.size.toLong
        else {
          val r = (t.last().doubleValue() - Long.MinValue.toDouble) / math.pow(2, 64)
          math.round((k - 1) / math.max(r, java.lang.Double.MIN_VALUE))
        }
      val jPpm = inBoth * 1000000L / s.size
      val uniEst = est(s)
      out.update(0, est(buf.a)); out.update(1, est(buf.b))
      // integer form (truncating): keeps the estimator branch inside
      // the same integer-determinism contract as the exact branch
      out.update(2, uniEst * jPpm / 1000000L)
      out.update(3, jPpm)
    }
    out
  }

  override def serialize(buf: KmvJaccard.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * (buf.a.size + buf.b.size))
    bb.putInt(buf.a.size); bb.putInt(buf.b.size)
    buf.a.forEach(v => bb.putLong(v))
    buf.b.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvJaccard.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val (na, nb) = (bb.getInt, bb.getInt)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < na) { buf.a.add(bb.getLong); i += 1 }
    i = 0
    while (i < nb) { buf.b.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvJaccard =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvJaccard =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head, side = cs(1))
}

object KmvJaccard {
  final class Buf(
      val a: java.util.TreeSet[java.lang.Long],
      val b: java.util.TreeSet[java.lang.Long])

  /** Column-level entry: `side` true routes the row to set A, false to
    * set B; output struct (n_a, n_b, n_inter, jaccard_ppm), exact
    * while both sides stay below k.
    */
  def kmv_jaccard(c: Column, side: Column, k: Int = 1024): Column =
    GraftColumnBridge.column(
      KmvJaccard(GraftColumnBridge.expression(c),
        GraftColumnBridge.expression(side), k).toAggregateExpression())
}
