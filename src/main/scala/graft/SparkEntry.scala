package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star extension); every entry in [[oracleSql]] is the equivalent
  * DuckDB SQL over the same parquet tables. Column names are aliased
  * identically on both sides (the driver sorts columns by name before
  * hashing values).
  */
object SparkEntry {

  /** The reference's regex, escaped for embedding in a single-quoted
    * DuckDB SQL literal (only `'` needs doubling; RE2 accepts the same
    * class escapes as Java regex).
    */
  private val SqlCleanPattern = "^[A-Za-z\\[\\\\\\]^_`'']*"

  /** DuckDB fragment: one row per surviving lowercased token of
    * `documents.text` — mirrors [[WordCount.explodeWords]].
    */
  private def sqlWords(extra: String = ""): String =
    s"""SELECT$extra lower(cleaned) AS word FROM (
       |  SELECT *, regexp_extract(tok, '$SqlCleanPattern', 0) AS cleaned FROM (
       |    SELECT *, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents
       |  )
       |) WHERE length(cleaned) > 0""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WordCount.wordCount(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordcount" -> ((s, dir) =>
      WordCount.wordCount(Tables.documents(s, dir))),
    "wordcount_rdd" -> ((s, dir) =>
      WordCount.wordCountRdd(s, Tables.documents(s, dir))),
    "wordcount_per_source" -> ((s, dir) =>
      WordCount.wordCountBy(Tables.documents(s, dir), "text", "source")),
    "distinct_words" -> ((s, dir) =>
      WordCount.distinctWords(Tables.documents(s, dir))),
    "topk_words" -> ((s, dir) =>
      WordCount.topK(Tables.documents(s, dir), 20)),
    "word_length_hist" -> ((s, dir) =>
      WordCount.wordLengthHist(Tables.documents(s, dir))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "wordcount" ->
      s"""SELECT word, count(*) AS cnt FROM (${sqlWords()}) GROUP BY word ORDER BY word""",
    "wordcount_rdd" ->
      s"""SELECT word, count(*) AS cnt FROM (${sqlWords()}) GROUP BY word ORDER BY word""",
    "wordcount_per_source" ->
      s"""SELECT source, word, count(*) AS cnt FROM (${sqlWords(" source,")})
         |GROUP BY source, word ORDER BY source, word""".stripMargin,
    "distinct_words" ->
      s"""SELECT count(DISTINCT word) AS n_words FROM (${sqlWords()})""",
    "topk_words" ->
      s"""SELECT word, count(*) AS cnt FROM (${sqlWords()})
         |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "word_length_hist" ->
      s"""SELECT length(word) AS word_len, count(*) AS cnt FROM (${sqlWords()})
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
