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
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"BENCHONE $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
