package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver testdata tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")

  /** `events` with `ts` normalized to a `ts_ms` epoch-milliseconds
    * bigint. The testdata stores TIMESTAMP(NANOS), readable only under
    * the nanos-as-long legacy flag — set in [[GraftSession.builder]]
    * (the single source of session config), not here; epoch millis is
    * also the representation every oracle query compares on
    * (engine-native timestamp types don't round-trip identically).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = apply(s, dir, "events")
    val tsMs = df.schema("ts").dataType match {
      case LongType => expr("ts div 1000000")  // nanos → millis
      case _        => unix_millis(col("ts"))
    }
    df.withColumn("ts_ms", tsMs).drop("ts")
  }
  def lineitem(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "region")
}
