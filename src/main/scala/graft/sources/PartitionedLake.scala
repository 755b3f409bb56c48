package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout: the 100 TB selective-scan
  * path. Writing a fact table partitioned on its dominant filter column
  * turns `WHERE col = v` into directory pruning — the scan never opens
  * files outside the matching partition, so a 1-of-N-type query reads
  * 1/N of the data no matter how large the lake grows. (Bucketing
  * co-locates JOINS; partitioning prunes FILTERS — the two compose.)
  */
object PartitionedLake {

  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Write `events` partitioned by event_type once per (session, dir);
    * returns the lake path. Partition count = distinct event types
    * (5 here) — low-cardinality columns only; partitioning on a
    * high-cardinality key would produce millions of tiny files.
    */
  def eventsByTypeLake(spark: SparkSession, dir: String): String =
    staged.computeIfAbsent(dir, _ => {
      val out = graft.TempDirs.scratchString("graft_lake_")
      graft.Tables.events(spark, dir)
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      out
    })

  /** Daily spend for ONE event type through the partitioned lake — the
    * `event_type = t` predicate is a partition filter (directory
    * prune), not a row filter; `PlanAuditSpec` asserts the scan's
    * PartitionFilters carries it.
    */
  def prunedDailySpend(spark: SparkSession, dir: String,
                       eventType: String = "purchase"): DataFrame =
    spark.read.parquet(eventsByTypeLake(spark, dir))
      .where(col("event_type") === eventType)
      .select(expr("ts_ms div 86400000").as("epoch_day"),
        round(col("value") * 100).cast("long").as("value_c"))
      .groupBy("epoch_day")
      .agg(count(lit(1)).as("n_events"), sum("value_c").as("sum_value_cents"))
      .orderBy("epoch_day")
}
