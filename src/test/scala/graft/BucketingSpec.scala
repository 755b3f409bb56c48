package graft

import graft.sources.Bucketing

/** Co-located join via bucketing: same join, with and without bucket
  * layout — the bucketed plan must contain no shuffle Exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans with zero exchanges; unbucketed shuffles") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf0001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketing.joinBucketed(spark, "li_b", "o_b", "l_orderkey")
      assert(bucketed.count() > 0)
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$bucketedPlan")

      val plain = li.join(o, "l_orderkey")
      assert(plain.count() > 0)
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedup index probe: the persisted band table joins without its own exchange") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf0001)
    graft.sources.DedupIndex.writeIndex(docs.where(col("doc_id") <= 25),
      tag = "planspec", n = 3, b = 32, r = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val report = graft.sources.DedupIndex.incrementAgainstIndex(spark,
        "planspec", docs.where(col("doc_id") > 25),
        n = 3, b = 32, r = 4, num = 4, den = 5)
      val plan = report.queryExecution.executedPlan.toString
      // the scan of the bucketed band table must feed its join directly:
      // "Bucketed: true" in the scan and no Exchange between them is
      // approximated by asserting the scan reports bucketed reading
      assert(plan.contains("Bucketed: true"),
        s"band index scan should read its bucket layout:\n$plan")
      assert(report.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
