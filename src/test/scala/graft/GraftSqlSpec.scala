package graft

/** The SQL surface must express the flagship pipeline and agree with
  * the DataFrame formulation.
  */
class GraftSqlSpec extends SparkSpec {

  test("flagship word count via spark.sql equals the DataFrame result") {
    GraftSql.registerViews(spark, sf0001)
    val sql = spark.sql(
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT lower(regexp_extract(tok, '^[A-Za-z\\[\\\\\\]^_`\']*', 0)) AS word
        |  FROM (SELECT explode(split(text, '\\s+')) AS tok FROM documents)
        |) WHERE length(word) > 0
        |GROUP BY word ORDER BY word""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val df = operators.WordCount.wordCount(Tables.documents(spark, sf0001))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sql == df)
  }

  test("graft functions + views compose in SQL (simhash near-dup probe)") {
    GraftSql.registerViews(spark, sf0001)
    val n = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT graft_simhash(transform(split(text, '\\s+'), w -> xxhash64(w))) AS sh
        |  FROM documents
        |)""".stripMargin).collect().head.getLong(0)
    assert(n > 0)
  }
}
