package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

import graft.operators.WordCount

/** Structured Streaming surface: the reference is batch-only
  * (SURVEY.md §2 "Streaming: none"), so these are north-star
  * extensions — the same operators expressed incrementally.
  *
  * All state lives in Spark's state store (RocksDB/HDFS-backed on a
  * cluster): watermarks bound it, nothing accumulates on the driver.
  */
object Streams {

  /** Streaming word count over a directory of text files — the
    * reference pipeline (`sendFileByFile.cpp:82-392`) as an
    * incremental query. Complete output mode: the running (word, cnt)
    * table.
    */
  def wordCountStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)
      .select(explode(WordCount.cleanWords(col("value"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** [[wordCountStream]] driven to completion with an AvailableNow
    * trigger and a memory sink: processes every file present, then
    * terminates — the batch-equivalence form (must equal
    * [[WordCount.wordCount]] over the same lines, which is what the
    * driver's wordcount oracle checks). Complete output mode keeps the
    * full running (word, cnt) state table; ordering is applied on the
    * returned batch view.
    */
  def wordCountAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_wc_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = wordCountStream(spark, dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("word")
  }

  /** Tumbling event-time windows with a watermark: counts + cents sum
    * per (window, event_type); append mode emits each window once its
    * watermark passes.
    */
  def windowedEventCounts(events: DataFrame, width: String = "10 minutes",
                          watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value_cents"))

  /** Streaming exact dedup on a fingerprint column with a watermark —
    * the streaming-ingest form of [[graft.operators.Dedup.exact]]:
    * keeps one row per fingerprint, state bounded by the watermark.
    */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(col("text")))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermark)
      // dropDuplicates("fp") alone would keep one state entry per
      // fingerprint FOREVER (the watermark only bounds state when the
      // event-time column participates); the WithinWatermark variant
      // actually evicts expired fingerprints.
      .dropDuplicatesWithinWatermark("fp")

  /** Per-user running session counts via mapGroupsWithState: the
    * custom-state form of sessionization (gap > gapMs starts a new
    * session). Emits (user_id, session_count_so_far) per trigger.
    */
  def sessionCounts(spark: SparkSession, events: DataFrame,
                    gapMs: Long = 1800000L): DataFrame = {
    import spark.implicits._
    events.select(col("user_id").as[Long], col("ts_ms").as[Long])
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var (lastMs, n) = state.getOption.getOrElse((Long.MinValue, 0L))
          sorted.foreach { ts =>
            if (lastMs == Long.MinValue || ts - lastMs > gapMs) n += 1
            lastMs = ts
          }
          state.update((lastMs, n))
          (user, n)
      }
      .toDF("user_id", "n_sessions")
  }
}
