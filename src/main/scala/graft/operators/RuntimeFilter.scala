package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.BloomFilterAgg

/** Explicit runtime row-level filtering: build a bloom filter over the
  * selective side of a join, broadcast it, and drop non-candidate fact
  * rows BEFORE they reach the shuffle — then verify exactly. Spark's
  * `InjectRuntimeFilter` does this automatically for some plans; this
  * operator is the user-controlled form (filter size/hash count
  * chosen to the workload), built on [[graft.functions.BloomFilterAgg]].
  */
object RuntimeFilter {

  /** Revenue of lineitems belonging to high-value orders. The orders
    * side is aggregated into a `numBits`-bit bloom (one row,
    * broadcast); the lineitem scan keeps only might-contain rows —
    * at 100 TB that prunes the fact shuffle to ~selectivity + FP rate —
    * and the left-semi join against the real key set makes the final
    * answer exact regardless of false positives.
    */
  def bloomPrunedRevenue(spark: SparkSession, dir: String,
                         minTotal: Double = 400000.0,
                         numBits: Int = 1 << 17,
                         numHashes: Int = 5): DataFrame = {
    val hiOrders = Tables.orders(spark, dir)
      .where(col("o_totalprice") > minTotal)
      .select("o_orderkey")
    val bloom = hiOrders
      .agg(BloomFilterAgg.bloom_agg(col("o_orderkey"), numBits, numHashes).as("bf"))
    val prefiltered = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"))
      .join(broadcast(bloom))
      .where(BloomFilterAgg.mightContain(col("bf"), col("l_orderkey"),
        numBits, numHashes))
      .drop("bf")
    prefiltered
      .join(hiOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), sum("rev_c").as("revenue_cents"))
      .orderBy("l_returnflag")
  }
}
