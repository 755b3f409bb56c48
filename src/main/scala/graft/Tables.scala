package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
  def events(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "events")
  def lineitem(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "region")
}
