package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMinAgg

/** Count-min sketch aggregate + builtin-expression point estimates. */
class CountMinSpec extends SparkSpec {

  private val Depth = 5
  private val Width = 1 << 12

  test("estimates never undercount, and are exact without full-row collisions") {
    import spark.implicits._
    // skewed frequencies: key k appears k times, k in 1..50
    val rows = (1 to 50).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val cms = rows.agg(CountMinAgg.cms_agg(col("k"), Depth, Width).as("cms"))
    val est = rows.distinct().join(broadcast(cms))
      .select(col("k"),
        CountMinAgg.estimate(col("cms"), col("k"), Depth, Width).as("est"))
      .as[(Long, Long)].collect().toMap
    (1 to 50).foreach { k =>
      assert(est(k.toLong) >= k.toLong, s"CMS undercounted key $k")
      // 50 keys in 4096 cells x 5 rows: all-row collision ~ 0 => exact
      assert(est(k.toLong) == k.toLong, s"CMS inexact for key $k: ${est(k.toLong)}")
    }
  }

  test("merge over many partitions equals single-partition build") {
    val one = spark.range(0, 5000).repartition(1)
      .agg(CountMinAgg.cms_agg(col("id"), Depth, Width))
      .first().getSeq[Long](0)
    val many = spark.range(0, 5000).repartition(16)
      .agg(CountMinAgg.cms_agg(col("id"), Depth, Width))
      .first().getSeq[Long](0)
    assert(one == many)
    // total mass per depth row = input rows (the sketch is a linear
    // projection: merges add, nothing is lost)
    (0 until Depth).foreach { d =>
      assert(one.slice(d * Width, (d + 1) * Width).sum == 5000L)
    }
  }

  test("strings hash through the same xxhash64 contract as the probe") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "beta", "gamma", "gamma", "gamma").toDF("w")
    val cms = words.agg(CountMinAgg.cms_agg(col("w"), Depth, Width).as("cms"))
    val est = words.distinct().join(broadcast(cms))
      .select(col("w"),
        CountMinAgg.estimate(col("cms"), col("w"), Depth, Width).as("est"))
      .as[(String, Long)].collect().toMap
    assert(est == Map("alpha" -> 1L, "beta" -> 2L, "gamma" -> 3L))
  }

  test("graft_cms is a first-class SQL aggregate") {
    GraftSql.registerViews(spark, sf0001)
    val arr = spark.sql(
      s"SELECT graft_cms(doc_id, $Depth, 64) AS s FROM documents")
      .first().getSeq[Long](0)
    assert(arr.length == Depth * 64 && arr.sum > 0)
  }
}
