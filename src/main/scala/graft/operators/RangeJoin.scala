package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlap joins with NO equality key, made shuffle-friendly.
  *
  * Spark plans a bare `a JOIN b ON ts BETWEEN lo AND hi` as
  * BroadcastNestedLoopJoin — O(n·m) comparisons and a broadcast of one
  * whole side, both fatal at 100 TB. The standard fix is bucketing:
  * quantize time into fixed-width buckets, explode each interval to the
  * buckets it covers, tag each point with its single containing bucket,
  * equi-join on the bucket (ordinary hash shuffle join), then apply the
  * exact range predicate to the per-bucket candidates.
  */
object RangeJoin {

  /** Point-in-interval join via bucketing. Each interval costs
    * `(len / bucketMs) + 1` exploded rows; each point lands in exactly
    * ONE bucket, so every (interval, point) candidate pair arises from
    * exactly one shared bucket and needs no distinct pass afterwards.
    * Bucket width is the knob: near the median interval length the
    * explode factor stays ~2 while candidates stay tight. Output is the
    * joined rows (interval cols + point cols) with the exact predicate
    * applied.
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
                      bucketMs: Long,
                      startCol: String = "start_ms", endCol: String = "end_ms",
                      tsCol: String = "ts_ms"): DataFrame = {
    val iv = intervals.withColumn("bkt",
      explode(expr(s"sequence($startCol div $bucketMs, $endCol div $bucketMs)")))
    val pt = points.withColumn("bkt", expr(s"$tsCol div $bucketMs"))
    iv.join(pt, "bkt")
      .where(col(tsCol).between(col(startCol), col(endCol)))
      .drop("bkt")
  }

  /** Gate shape: per user session (gap-based, [[Relational.sessions]]),
    * how many `click` events from ANY user fell inside the session's
    * time window — a genuine no-equi-key overlap (the clicking user is
    * unrelated to the session owner). Left join keeps click-free
    * sessions with a 0 count.
    */
  def sessionClickCounts(events: DataFrame, gapSec: Long,
                         bucketMs: Long): DataFrame = {
    val sess = Relational.sessions(events, gapSec)
      .select("user_id", "session_id", "start_ms", "end_ms")
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id"), col("ts_ms"))
    val cand = pointInInterval(sess, clicks, bucketMs)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("c"))
    sess.join(cand, Seq("user_id", "session_id"), "left")
      .select(col("user_id"), col("session_id"),
        coalesce(col("c"), lit(0L)).as("n_clicks"))
      .orderBy("user_id", "session_id")
  }
}
