package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ShiftRight, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom filter as a Catalyst `TypedImperativeAggregate` — the build
  * side of an explicit runtime row-level filter (the pattern Spark's
  * own `InjectRuntimeFilter` rule applies to shuffle joins, here
  * surfaced as a first-class operator the user controls).
  *
  * The filter is `numBits` bits stored as `array<long>` words; each
  * value sets `numHashes` bits at positions
  * `pmod(xxhash64(value, i), numBits)` for `i in [0, numHashes)`,
  * where `xxhash64(value, i)` is EXACTLY Spark's builtin two-argument
  * `xxhash64` chain (seed 42, then each argument folded in). That
  * contract is what lets [[BloomFilterAgg.mightContain]] probe the
  * filter with nothing but codegen'd builtin expressions — the probe
  * side of the join stays inside whole-stage codegen with zero custom
  * eval on the hot path.
  *
  * Merge is a word-wise OR of fixed-size buffers; the partial/final
  * split rides the normal hash-agg machinery (no driver state). At
  * 100 TB: build over the small/filtered side (one scan, `numBits/8`
  * bytes of state per partial), broadcast the single-row result, and
  * the fact scan drops non-candidate rows before the shuffle — the
  * exact verify join afterwards keeps the result set exact regardless
  * of the false-positive rate.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0, "numHashes must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // identical to builtin xxhash64(value, i): seed 42, args chained
      val h1 = XxHash64Function.hash(v, child.dataType, 42L)
      var i = 0
      while (i < numHashes) {
        val h2 = XxHash64Function.hash(i.toLong, LongType, h1)
        val pos = java.lang.Math.floorMod(h2, numBits.toLong).toInt
        buf(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
}

object BloomFilterAgg {

  /** Aggregate a column into a bloom filter (`array<long>` of
    * `numBits/64` words).
    */
  def bloom_agg(c: Column, numBits: Int = 1 << 17, numHashes: Int = 5): Column =
    GraftColumnBridge.column(
      BloomFilterAgg(GraftColumnBridge.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Probe predicate: true iff every one of `key`'s bit positions is
    * set in `bloom`. Built entirely from builtin expressions
    * (xxhash64 / pmod / element_at / shift) so the probe stays in
    * whole-stage codegen. MUST be called with the same
    * (numBits, numHashes) the filter was built with — AND with the same
    * Catalyst data type as the build column: xxhash64 dispatches on
    * type, so an int probe against a bigint-built filter (or any other
    * width/type mismatch) hashes differently and silently never
    * matches. Cast both sides to a common type (e.g. `.cast("long")`
    * for integral keys) before building and probing.
    */
  def mightContain(bloom: Column, key: Column, numBits: Int = 1 << 17,
                   numHashes: Int = 5): Column =
    (0 until numHashes).map { i =>
      val pos = pmod(xxhash64(key, lit(i.toLong)), lit(numBits.toLong))
      val word = element_at(bloom, (shiftright(pos, 6) + 1).cast("int"))
      val bit = pos.bitwiseAND(lit(63L)).cast("int")
      GraftColumnBridge.column(ShiftRight(
        GraftColumnBridge.expression(word),
        GraftColumnBridge.expression(bit)))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
