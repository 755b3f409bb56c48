package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFilterAgg
import graft.operators.RuntimeFilter

/** Bloom filter aggregate + explicit runtime row-level filtering. */
class BloomFilterSpec extends SparkSpec {

  private val Bits = 1 << 14
  private val Hashes = 5

  test("no false negatives, and FP rate stays near theory") {
    import spark.implicits._
    val members = spark.range(0, 2000).select(col("id"))
    val bloom = members
      .agg(BloomFilterAgg.bloom_agg(col("id"), Bits, Hashes).as("bf"))
    // every inserted key must probe true (bloom filters never miss)
    val misses = members.join(broadcast(bloom))
      .where(!BloomFilterAgg.mightContain(col("bf"), col("id"), Bits, Hashes))
    assert(misses.isEmpty)
    // non-members: expected FP ≈ (1 - e^(-kn/m))^k ≈ 2.2% at this fill
    val fps = spark.range(1000000, 1010000).select(col("id"))
      .join(broadcast(bloom))
      .where(BloomFilterAgg.mightContain(col("bf"), col("id"), Bits, Hashes))
      .count()
    assert(fps < 1000, s"false-positive rate too high: $fps / 10000")
  }

  test("merge over many partitions equals single-partition build") {
    val one = spark.range(0, 5000).repartition(1)
      .agg(BloomFilterAgg.bloom_agg(col("id"), Bits, Hashes))
      .first().getSeq[Long](0)
    val many = spark.range(0, 5000).repartition(16)
      .agg(BloomFilterAgg.bloom_agg(col("id"), Bits, Hashes))
      .first().getSeq[Long](0)
    assert(one == many)
  }

  test("strings hash through the same xxhash64 contract as the probe") {
    val words = Tables.documents(spark, sf0001).select(col("source"))
    val bloom = words.agg(
      BloomFilterAgg.bloom_agg(col("source"), Bits, Hashes).as("bf"))
    val misses = words.distinct().join(broadcast(bloom))
      .where(!BloomFilterAgg.mightContain(col("bf"), col("source"), Bits, Hashes))
    assert(misses.isEmpty)
  }

  test("bloomPrunedRevenue equals the plain exact semi-join") {
    val got = RuntimeFilter.bloomPrunedRevenue(spark, sf0001)
    val hi = Tables.orders(spark, sf0001)
      .where(col("o_totalprice") > 400000.0).select("o_orderkey")
    val want = Tables.lineitem(spark, sf0001)
      .join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
      .orderBy("l_returnflag")
    assert(got.collectAsList() == want.collectAsList())
  }
}
