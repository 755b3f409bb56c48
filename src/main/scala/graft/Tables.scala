package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")

  /** `ts` → epoch-milliseconds bigint, for every physical type the
    * fixture has shipped as across rounds:
    *  - INT64 TIMESTAMP(NANOS): readable only as a long under the
    *    nanos-as-long legacy flag (set in [[GraftSession.builder]]) →
    *    integer division to millis;
    *  - TIMESTAMP_NTZ (timestamp[us] with no UTC adjustment — the
    *    round-7 regeneration): `unix_millis` rejects NTZ, so cast to
    *    the LTZ type first — the session timezone is pinned UTC, so
    *    the wall clock IS the epoch, exactly what DuckDB's
    *    `epoch_ms(ts)` yields for the same naive value;
    *  - plain TIMESTAMP: `unix_millis` directly.
    */
  def tsMsExpr(dt: DataType): Column = dt match {
    case LongType         => expr("ts div 1000000") // nanos → millis
    case TimestampNTZType => unix_millis(col("ts").cast(TimestampType))
    case _                => unix_millis(col("ts"))
  }

  /** `events` with `ts` normalized to a `ts_ms` epoch-milliseconds
    * bigint — epoch millis is the representation every oracle query
    * compares on (engine-native timestamp types don't round-trip
    * identically).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = apply(s, dir, "events")
    df.withColumn("ts_ms", tsMsExpr(df.schema("ts").dataType)).drop("ts")
  }
  def lineitem(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "region")
}
