package graft


/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints the per-query JSON line, BRACKETED by
  * an identical compact headline line before and after it (captures
  * truncated from either direction keep the total + failure list).
  * Queries are fully materialized through the noop sink (not count(),
  * which lets Catalyst prune most of the work); a small warmup query
  * absorbs JVM/session startup so measured numbers are steady-state.
  *
  * Round-13 budget hardening (BENCH_r12 was rc 124 with `wordcount`
  * itself unmeasured — the sweep was cut at the alphabetical tail and
  * every unreached query charged a 600 s penalty):
  *
  *  - HEAVIEST-FIRST order: queries run by descending last-capture
  *    time (read from the committed BENCH_SELF.json; queries with no
  *    prior — i.e. new this round — run first, as unknown cost). A
  *    budget-cut sweep now truncates the cheap tail, never the
  *    flagship queries. The output map stays name-keyed, so ordering
  *    is invisible to consumers.
  *  - INCREMENTAL flush: the per-query map is rewritten to
  *    SPARK_GRAFT_BENCH_OUT after EVERY query (marked "partial":true
  *    until the sweep completes). A killed sweep keeps everything it
  *    measured instead of recording nothing but penalties.
  *  - ADAPTIVE repeats: run 1 pays Catalyst plan compile + JIT (~3×
  *    inflation on complex plans), so every query gets ≥ 2 runs and
  *    reports the min; the third run happens when the first two
  *    disagree by > 20% OR the query is expensive (min > 1.0 s) —
  *    regression adjudication reads the heavy queries' minimums, so
  *    those keep full min-of-3, while cheap stable queries take a
  *    min-of-2 fast path, cutting sweep wall-clock by ~⅓.
  *  - STAGING pre-warm (ADVICE r13): the session-staged families
  *    (DedupStage/CfIndex/AnnIndex) derive their shared state BEFORE
  *    any timed run, and the derivation cost is reported as its own
  *    top-level `staging` field. Without this, whichever staged-family
  *    gate the prior-file order happened to run first paid the
  *    derivation in its run 1 — discarded by min, but leaving run-1
  *    noise and wall-clock attribution order-dependent round-over-
  *    round. Deliberately-live derivations (the d=2 fuzzy gate) are
  *    not pre-warmed — the sweep still measures them.
  */
object Bench {
  /** Sweep order: by DESCENDING last-capture time, alphabetical within
    * ties; queries with no prior (new this round) first. A budget-cut
    * sweep then truncates the cheap tail, never the flagship queries.
    */
  private[graft] def orderNames(names: Seq[String],
                                prior: Map[String, Double]): Seq[String] =
    names.sorted.sortBy(n => -prior.getOrElse(n, Double.MaxValue))

  /** Excursion detector (round 15, VERDICT r14 #4): BENCH_r14 carries
    * `word_hits` 66.9 s and `corpus_build_v3` 59.8 s — lone host
    * stalls 13–20× the same-code steady state that became the round's
    * permanent record AND the next sweep's ordering prior. A measured
    * min is an excursion worth one end-of-sweep re-run when it exceeds
    * 3× the committed prior and is expensive enough (> 1 s) that the
    * ratio is not sub-second noise-floor jitter. Failed queries (−1)
    * are not excursions — they must stay loud.
    */
  private[graft] def isExcursion(min: Double, prior: Double): Boolean =
    prior > 0 && min > 3 * prior && min > 1.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder("graft-bench", s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // derive the session-staged family state up front (see scaladoc);
    // each getter localCheckpoints/saves on first call, so count() /
    // the cheapest consumer forces materialization. Best-effort: a
    // failed pre-warm just returns the old run-1 behavior.
    // r16: the nine family chains are INDEPENDENT, so they overlap on
    // a small driver thread pool (guide §2.6 — Spark happily runs
    // concurrent jobs; each chain's tail leaves cores the next chain's
    // tasks back-fill). Within a chain order is preserved (ccLabels
    // derives from pairs, fuzzyClusters from fuzzyPairs) so dependent
    // derivations stay single-computed. Sequential staging measured
    // 36-77 s; overlapped ~⅓ of that on the same host. Best-effort as
    // before: a failed chain just returns the old run-1 behavior.
    val stagingSec: Double = {
      val t0 = System.nanoTime()
      import graft.sources.{AnnIndex, CfIndex, DedupStage, GraphStage, MediaStage}
      val chains: Seq[() => Unit] = Seq(
        () => MediaStage.media(spark, sfDir).count(),
        () => GraphStage.copurchase(spark, sfDir).count(),
        () => GraphStage.wordEdgeCounts(spark, sfDir).count(),
        () => { DedupStage.pairs(spark, sfDir).count()
                DedupStage.ccLabels(spark, sfDir).count() },
        () => DedupStage.minhashPairs(spark, sfDir).count(),
        () => DedupStage.islands(spark, sfDir).count(),
        () => { DedupStage.fuzzyPairs(spark, sfDir).count()
                DedupStage.fuzzyClusters(spark, sfDir).count() },
        () => CfIndex.cfNeighbors(spark, sfDir).count(),
        () => AnnIndex.annIncrementDrift(spark, sfDir).count())
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val futures = chains.map(c => pool.submit(new Runnable {
          def run(): Unit = try c() catch { case _: Throwable => () }
        }))
        futures.foreach(f => try f.get() catch { case _: Throwable => () })
      } finally pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }

    // deterministic run counters (VERDICT r14 #1/#2): jobs, tasks,
    // shuffle bytes/records, scheduler latency per query — recorded
    // alongside seconds so host-vs-code adjudication is mechanical
    // (benchdiff auto-classifies: seconds up + counters flat = host)
    val meter = BenchMetrics.install(spark.sparkContext)

    def once(name: String): (Double, BenchMetrics.Snap) = {
      meter.reset()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, meter.snapshot())
      } catch { case _: Throwable => (-1.0, null) }
    }

    // last-capture per-query seconds, for the heaviest-first order:
    // SPARK_GRAFT_BENCH_PRIOR if set, else the repo's committed
    // BENCH_SELF.json next to the output path. Regex-parsed ("name":N
    // pairs) — the non-query headline keys it also picks up ("value",
    // "sf") never collide with query names.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      sys.props.getOrElse("user.dir", ".") + "/BENCH_SELF.json")
    val priorPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR",
      sys.props.getOrElse("user.dir", ".") + "/BENCH_SELF.json")
    val prior: Map[String, Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(priorPath)), "UTF-8")
      "\"([A-Za-z0-9_]+)\":(-?[0-9][-0-9.Ee]*)".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
    val names = orderNames(SparkEntry.queries.keys.toSeq, prior)

    val qmetrics =
      scala.collection.mutable.Map[String, BenchMetrics.Snap]()
    val excursions = scala.collection.mutable.Map[String, Double]()

    def writeOut(done: Seq[(String, Double)], partial: Boolean): Unit = {
      val qs = done.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val failed = done.collect { case (k, v) if v < 0 => k }
      val total = done.map(_._2).filter(_ >= 0).sum + 600.0 * failed.size
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val flag = if (partial) "\"partial\":true," else ""
      val qm = qmetrics.toSeq.sortBy(_._1)
        .map { case (k, s) => "\"" + k + "\":" + s.json }
        .mkString("{", ",", "}")
      val exc = excursions.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val full = s"""{"metric":"total",$flag"value":$total,""" +
        s""""unit":"sec","n_queries":${done.size},"queries":$qs,""" +
        s""""failed":$failedJson,"staging":$stagingSec,""" +
        s""""qmetrics":$qm,"excursions":$exc,"sf":"$sfDir"}"""
      try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (full + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () } // bench output file is best-effort
    }

    // min-of-runs seconds AND the min run's counters (the clean run is
    // the one adjudication reads; a retried-stage excursion's inflated
    // task count must not pollute the deterministic record)
    def measure(name: String): Double = {
      var best = Double.MaxValue
      var bestSnap: BenchMetrics.Snap = null
      def run(): Double = {
        val (t, s) = once(name)
        if (t >= 0 && t < best) { best = t; bestSnap = s }
        t
      }
      val t1 = run()
      val t2 = run()
      val t = if (t1 < 0 || t2 < 0) -1.0
      else {
        val m = math.min(t1, t2)
        // third run when the first two disagree beyond host noise OR
        // the query is expensive — regression adjudication reads the
        // heavy queries' minimums, so those keep full min-of-3; the
        // ~2/3 of queries that are cheap AND stable stay at two runs
        if (math.abs(t1 - t2) > 0.2 * m || m > 1.0) {
          val t3 = run()
          if (t3 < 0) -1.0 else math.min(m, t3)
        } else m
      }
      if (t >= 0 && bestSnap != null) qmetrics(name) = bestSnap
      t
    }

    val results = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    names.foreach { name =>
      results += name -> measure(name)
      writeOut(results.toSeq, partial = true)
    }
    // end-of-sweep excursion retry (VERDICT r14 #4): a min > 3× its
    // committed prior is re-measured ONCE now that the host has moved
    // past whatever stalled it; the original value is preserved in the
    // `excursions` field so the stall is recorded, not laundered, and
    // the query's reported value stays the min over ALL its runs —
    // the sweep's existing methodology.
    for (i <- results.indices) {
      val (name, t) = results(i)
      if (isExcursion(t, prior.getOrElse(name, 0.0))) {
        val (t2, s2) = once(name)
        if (t2 >= 0 && t2 < t) {
          excursions(name) = t
          results(i) = name -> t2
          if (s2 != null) qmetrics(name) = s2
        }
      }
    }
    if (excursions.nonEmpty) writeOut(results.toSeq, partial = true)
    val sortedR = results.toSeq.sortBy(_._1)
    val qs = sortedR.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query must make the bench LOUDER, not faster: each one
    // lands in "failed" and adds a 600 s penalty to the total
    val failed = sortedR.collect { case (k, v) if v < 0 => k }
    val total = sortedR.map(_._2).filter(_ >= 0).sum + 600.0 * failed.size
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // compact headline FIRST: a tail-truncated capture of the big
    // per-query line (it happened to BENCH_r02.json) must still retain
    // the total + failure list
    val headline =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${sortedR.size},"failed":$failedJson,"sf":"$sfDir"}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"staging":$stagingSec,"sf":"$sfDir"}"""
    println(headline)
    println(full)
    // ...and AGAIN after it: BENCH_r04.json was tail-captured (kept the
    // END of output), which lost the leading headline — emitting it on
    // both sides survives truncation from either direction.
    println(headline)
    // The stdout capture has been truncated to ~15% of the per-query
    // map every round; the full map is also persisted at outPath
    // (final form: no "partial" flag).
    writeOut(results.toSeq, partial = false)
    spark.stop()
  }
}
