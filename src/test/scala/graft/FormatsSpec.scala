package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Skew, WordCount}

/** Source/sink breadth: the word-count pipeline must read identically
  * from parquet, csv, json, and text; partitioned writes must prune.
  */
class FormatsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
  private def counts(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    WordCount.wordCount(df, "text").collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("wordcount is identical across parquet/csv/json round-trips") {
    val base = counts(docs)
    val tmp = Files.createTempDirectory("graft_fmt").toString
    docs.select("doc_id", "text").write.option("header", "true").csv(s"$tmp/csv")
    docs.select("doc_id", "text").write.json(s"$tmp/json")
    val fromCsv = spark.read.option("header", "true").csv(s"$tmp/csv")
    val fromJson = spark.read.json(s"$tmp/json")
    assert(counts(fromCsv) == base)
    assert(counts(fromJson) == base)
  }

  test("xml round-trip escapes entities without changing the text") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_xml").toString
    val d = Seq((1L, "a <b> & \"c\" 'd'"), (2L, "plain words here"))
      .toDF("doc_id", "text")
    d.write.format("xml").option("rootTag", "docs").option("rowTag", "doc")
      .save(s"$tmp/xml")
    val back = spark.read.option("rowTag", "doc")
      .schema("doc_id LONG, text STRING").format("xml").load(s"$tmp/xml")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(back == Map(1L -> "a <b> & \"c\" 'd'", 2L -> "plain words here"))
  }

  test("partitioned parquet write prunes partitions on read") {
    val tmp = Files.createTempDirectory("graft_part").toString
    docs.write.partitionBy("lang").parquet(s"$tmp/bylang")
    val de = spark.read.parquet(s"$tmp/bylang").where(col("lang") === "de")
    val expected = docs.where(col("lang") === "de").count()
    assert(de.count() == expected && expected > 0)
    val scan = de.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey")
      .groupBy("l_orderkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val salted = Skew.saltedJoin(li, o, "l_orderkey", 8)
      .groupBy("l_orderkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(salted == plain)
  }

  test("schema evolution: mergeSchema unions generations, gen-1 reads NULL") {
    val lake = graft.sources.PartitionedLake.schemaEvolutionLake(spark, sf0001)
    val merged = spark.read.option("mergeSchema", "true").parquet(lake)
    assert(merged.columns.contains("value_cents"))
    // generation-1 (even ids) rows surface NULL for the added column
    assert(merged.where(col("event_id") % 2 === 0)
      .where(col("value_cents").isNotNull).isEmpty)
    assert(merged.where(col("event_id") % 2 === 1)
      .where(col("value_cents").isNull).isEmpty)
    // row count preserved across generations
    assert(merged.count() == Tables.events(spark, sf0001).count())
  }
}
