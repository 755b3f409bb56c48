package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a Catalyst
  * `TypedImperativeAggregate` — the point-frequency sibling of the
  * [[BloomFilterAgg]] membership filter and [[TopKFreqSketch]]
  * heavy-hitter list: `depth × width` counters in `array<long>`, each
  * value incrementing one counter per row at
  * `pmod(xxhash64(value, d), width)`, the EXACT builtin two-argument
  * `xxhash64` chain — which is what lets [[CountMinAgg.estimate]]
  * probe the finished sketch with nothing but codegen'd builtin
  * expressions (min over the depth counters), no custom eval on the
  * read path.
  *
  * Merge is element-wise addition of fixed-size buffers (the sketch is
  * a linear projection of the count vector, so partial/final composes
  * exactly); state is `depth·width·8` bytes per partial regardless of
  * corpus size. Estimates are exact unless a key collides with heavier
  * keys in EVERY one of the `depth` rows — probability
  * ≈ (n_distinct/width)^depth, and deterministic for a fixed hash: the
  * driver oracle (exact counts) IS the collision check at gate scale,
  * the documented validity-window contract all the graft sketches use.
  * At 100 TB: one scan builds it, the single-row result broadcasts,
  * and any stream of point queries reads it without touching the
  * corpus again.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, "depth must be in 1..16")
  require(width > 0, "width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // identical to builtin xxhash64(value, d): seed 42, args chained
      val h1 = XxHash64Function.hash(v, child.dataType, 42L)
      var d = 0
      while (d < depth) {
        val h2 = XxHash64Function.hash(d.toLong, LongType, h1)
        buf(d * width + java.lang.Math.floorMod(h2, width.toLong).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
}

object CountMinAgg {

  /** Aggregate a column into a `depth × width` count-min sketch
    * (`array<long>`, row-major).
    */
  def cms_agg(c: Column, depth: Int = 5, width: Int = 1 << 14): Column =
    GraftColumnBridge.column(
      CountMinAgg(GraftColumnBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** Point-frequency estimate: min over the `depth` counters hashed by
    * `key`. Builtin expressions only (xxhash64 / pmod / element_at /
    * least), so the probe stays in whole-stage codegen. MUST be called
    * with the (depth, width) the sketch was built with AND the same
    * Catalyst type as the build column ([[BloomFilterAgg.mightContain]]
    * documents the type-dispatch trap).
    */
  def estimate(cms: Column, key: Column, depth: Int = 5,
               width: Int = 1 << 14): Column =
    least((0 until depth).map { d =>
      val pos = pmod(xxhash64(key, lit(d.toLong)), lit(width.toLong))
      element_at(cms, (lit(d.toLong * width) + pos + 1L).cast("int"))
    }: _*)
}
