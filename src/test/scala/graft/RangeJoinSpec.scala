package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval: exact containment across bucket boundaries") {
    val iv = Seq((1L, 100L, 250L), (2L, 300L, 310L), (3L, 900L, 950L))
      .toDF("iv_id", "start_ms", "end_ms")
    val pt = Seq((10L, 99L), (11L, 100L), (12L, 199L), (13L, 250L),
      (14L, 251L), (15L, 305L), (16L, 1000L)).toDF("p_id", "ts_ms")
    // bucket width 100: interval 1 spans buckets 1..2, point 13 (ts 250)
    // sits in bucket 2 — found via the shared bucket, kept by BETWEEN
    val got = RangeJoin.pointInInterval(iv, pt, bucketMs = 100L)
      .select("iv_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 11L), (1L, 12L), (1L, 13L), (2L, 15L)))
  }

  test("pointInInterval: each qualifying pair appears exactly once") {
    // interval spanning many buckets; candidate pairs must not duplicate
    val iv = Seq((1L, 0L, 1000L)).toDF("iv_id", "start_ms", "end_ms")
    val pt = (0L to 1000L by 50L).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }.toDF("p_id", "ts_ms")
    val rows = RangeJoin.pointInInterval(iv, pt, bucketMs = 100L)
    assert(rows.count() == 21)
    assert(rows.groupBy("p_id").count().where(col("count") > 1).count() == 0)
  }

  test("sessionClickCounts keeps click-free sessions at zero") {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val ev = Seq(
      // user 1: one session with an own view and a foreign click inside
      (1L, 1L, base + 1000, "view", 1.0),
      (2L, 1L, base + 2000, "view", 1.0),
      (3L, 2L, base + 1500, "click", 1.0),
      // user 2's click above is its own session with 1 click (itself)
      // user 3: far-away session, no clicks anywhere near
      (4L, 3L, base + 100000000L, "view", 1.0))
      .toDF("event_id", "user_id", "ts_ms", "event_type", "value")
    val got = RangeJoin.sessionClickCounts(ev, gapSec = 1800, bucketMs = 60000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 0L)))
  }
}
