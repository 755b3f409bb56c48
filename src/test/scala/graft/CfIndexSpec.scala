package graft

import graft.operators.Basket
import graft.sources.CfIndex

/** The persisted CF index must be invisible to consumers: every probe
  * result equals the recompute operator byte-for-byte (the driver
  * gates share the recompute oracles, so this equivalence IS the
  * correctness contract of the index).
  */
class CfIndexSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("cfNeighbors probe equals the recompute operator") {
    val got = rows(CfIndex.cfNeighbors(spark, sf0001))
    val want = rows(Basket.cfNeighbors(
      Tables.lineitem(spark, sf0001), Tables.orders(spark, sf0001)))
    assert(got == want)
  }

  test("recommendations probe equals the recompute operator") {
    val got = rows(CfIndex.recommendations(spark, sf0001))
    val want = rows(Basket.recommendations(
      Tables.lineitem(spark, sf0001), Tables.orders(spark, sf0001)))
    assert(got == want)
  }

  test("recEval probe equals the recompute operator (same split)") {
    val got = rows(CfIndex.recEval(spark, sf0001))
    val want = rows(Basket.recEval(
      Tables.lineitem(spark, sf0001), Tables.orders(spark, sf0001)))
    assert(got == want)
  }
}
