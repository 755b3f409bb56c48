package graft


/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints the per-query JSON line, BRACKETED by
  * an identical compact headline line before and after it (captures
  * truncated from either direction keep the total + failure list).
  * Queries are fully materialized through the noop sink (not count(),
  * which lets Catalyst prune most of the work); a small warmup query
  * absorbs JVM/session startup so measured numbers are steady-state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder("graft-bench", s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    // three runs, report the min: run 1 pays Catalyst plan compile +
    // JIT (~3x inflation on complex plans) and the host shows ±30%
    // noise between runs; min = steady-state.
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val ts = Seq.fill(3)(once(name))
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query must make the bench LOUDER, not faster: each one
    // lands in "failed" and adds a 600 s penalty to the total
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.map(_._2).filter(_ >= 0).sum + 600.0 * failed.size
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // compact headline FIRST: a tail-truncated capture of the big
    // per-query line (it happened to BENCH_r02.json) must still retain
    // the total + failure list
    val headline =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failedJson,"sf":"$sfDir"}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(headline)
    println(full)
    // ...and AGAIN after it: BENCH_r04.json was tail-captured (kept the
    // END of output), which lost the leading headline — emitting it on
    // both sides survives truncation from either direction.
    println(headline)
    // The stdout capture has been truncated to ~15% of the per-query
    // map every round; ALSO persist the full map to a file so per-query
    // regressions stay diffable round over round.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      sys.props.getOrElse("user.dir", ".") + "/BENCH_SELF.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // bench output file is best-effort
    spark.stop()
  }
}
