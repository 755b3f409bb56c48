package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the 100 TB co-located-join path. Writing
  * both join sides bucketed (and sorted) by the join key lets Spark
  * plan a sort-merge join with ZERO exchanges — the shuffle happens
  * once at write time and is amortized over every subsequent join,
  * which is how a fact table should be laid out for repeated joins.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket column — plans
    * without any Exchange when bucket counts match.
    */
  def joinBucketed(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
