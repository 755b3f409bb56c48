package graft

/** Dev micro-bench: time individual SparkEntry queries by name (3 runs
  * each, noop sink) without paying the full Bench sweep — used to
  * separate plan regressions from host noise.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-benchone", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // SPARK_GRAFT_EXPLAIN=1: dump the formatted physical plan once per
    // query before timing (the plan-audit loop of the build workflow)
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      for (name <- args) {
        println(s"==== PLAN $name ====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    // deterministic run counters (VERDICT r14 #1): every run prints
    // job/task counts, shuffle volume and summed job-submit→first-task
    // scheduler latency — the decomposition that separates per-job
    // fixed overhead (tiny-jobs class) from compute
    val meter = BenchMetrics.install(spark.sparkContext)
    for (name <- args; i <- 1 to 3) {
      meter.reset()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val s = meter.snapshot()
      // SPARK_GRAFT_METRICS=1: executed-plan shuffle metrics of a
      // SECOND run via PlanMetrics (kept for plan-level attribution;
      // the listener totals above cover the whole run incl. staging)
      val metrics = if (sys.env.get("SPARK_GRAFT_METRICS").contains("1")) {
        val (bytes, recs) = PlanMetrics.shuffleTotals(df)
        f" planShuffleMB=${bytes / 1e6}%.1f planShuffleRecs=$recs"
      } else ""
      println(f"BENCHONE $name run$i $secs%.2f s jobs=${s.jobs} " +
        f"tasks=${s.tasks} shufMB=${s.shuffleBytes / 1e6}%.1f " +
        f"shufRecs=${s.shuffleRecs} schedMs=${s.schedDelayMs}$metrics")
    }
    spark.stop()
  }
}
