package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capstone SOAK harness (round 13): the composed end-to-end pipelines
  * — `corpus_build_v3`, `dedup_increment_indexed`,
  * `customer_cf_increment` — replicated to 10× and ~100× the base SF
  * row count and measured for wall seconds AND shuffle bytes/records,
  * the two curves that expose super-linear composition effects the
  * per-operator 10× [[ScaleProbe]] can't see (each probe there
  * isolates one operator; the capstones chain a dozen).
  *
  * Replication uses the established salt idiom: ids shift by a large
  * constant per copy and document text is perturbed PER TOKEN with a
  * copy tag (every word gets a `c<i>` suffix), so cross-copy documents
  * share no 3-shingles at all — copies are fresh corpora, not
  * near-duplicates of each other, and the probe measures clean volume
  * scaling. Order/customer keys shift together so baskets replicate
  * per copy without cross-copy pairs. The base of the increment probes
  * (doc_id ≤ 250 / pre-cut orders in copy 0 only) stays fixed while
  * arrivals scale — the nightly-increment cost curve, matching
  * production where the increment grows but yesterday's base is
  * already indexed.
  *
  * WHY token-level (round 14, closing VERDICT r13 #4): the r13
  * generator only APPENDED one tag token per copy, which left copies
  * of the same document genuine near-duplicates (3-shingle Jaccard
  * stays ≥ 4/5 on long docs) — so the soaked corpus carried Θ(N·F²)
  * TRUE near-dup pairs by construction, and the measured 150×
  * shuffle-record growth at 100× was the LSH banding CORRECTLY
  * finding them, not an index defect. Decomposition (sf0.01): within-
  * increment band-bucket candidates grew 8 → 22 535 → 2 698 055 at
  * factor 1/10/100 (∝ F²) while index-probe candidates stayed linear
  * beyond factor 10 (2 461 → 26 941 for 10× incoming). Candidates ∝
  * true pairs is the operator's contract — a corpus quadratic in true
  * pairs costs quadratic work in ANY banding scheme; the generator,
  * not the operator, owed the fix.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.SoakProbe [factors…]`
  * (default `10 100`). One JSON line per (capstone, factor) with
  * wall/shuffle measurements plus the base point, then a summary line.
  */
object SoakProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val factors = (if (args.nonEmpty) args.toSeq else Seq("10", "100"))
      .map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder("graft-soak", s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outPath = java.nio.file.Files.createTempDirectory("graft_soak_")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(outPath).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () }))

    /** Write a factor-replicated table dir shaped like a testdata SF
      * dir, so the dir-keyed index capstones stage against it as they
      * would against a real corpus drop.
      */
    def replicate(factor: Int): String = {
      val dir = s"$outPath/f$factor"
      def scale(df: DataFrame, idCols: Seq[String], shift: Long,
                perturbText: Boolean): DataFrame =
        (0 until factor).map { i =>
          var c = df
          idCols.foreach(id => c = c.withColumn(id, col(id) + lit(i * shift)))
          // copy 0 keeps the original text (the increment probes' base
          // lives there); every other copy suffixes EVERY token so
          // cross-copy docs share no shingles (see object scaladoc) —
          // within-copy dup/near-dup structure is untouched (a uniform
          // rewrite preserves pairwise Jaccard inside the copy)
          if (perturbText && i > 0)
            c = c.withColumn("text",
              regexp_replace(col("text"), "(\\S+)", s"$$1c$i"))
          c
        }.reduce(_ unionByName _)
      scale(Tables.documents(spark, sfDir), Seq("doc_id"), 10000000L,
          perturbText = true)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      scale(Tables.lineitem(spark, sfDir), Seq("l_orderkey"), 100000000L,
          perturbText = false)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      scale(Tables.orders(spark, sfDir), Seq("o_orderkey", "o_custkey"),
          100000000L, perturbText = false)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }

    /** Wall seconds + shuffle (bytes, records) of one capstone run,
      * measured across EVERY job the run fires — a session-level
      * listener tally, not plan-local metrics, because the staged
      * operators materialize checkpointed state eagerly at DataFrame
      * CONSTRUCTION time (those derivation jobs are the production
      * cost a soak exists to measure) and their shuffles never appear
      * in the final serving plan's metrics. Single-shot by design: a
      * soak measures the cold composed pipeline, not a warmed min.
      */
    def measure(f: => DataFrame): (Double, Long, Long) = {
      val bytes = new java.util.concurrent.atomic.AtomicLong
      val recs = new java.util.concurrent.atomic.AtomicLong
      val tally = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          }
        }
      }
      spark.sparkContext.addSparkListener(tally)
      try {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener bus is async: drain it DETERMINISTICALLY before
        // reading the tally (and before the finally removes the
        // listener) — a fixed sleep could miss late task-end events on
        // a loaded host or bleed them into the next capstone
        org.apache.spark.GraftSparkInternals
          .waitListenerBusEmpty(spark.sparkContext)
        (sec, bytes.get, recs.get)
      } finally spark.sparkContext.removeSparkListener(tally)
    }

    def capstones(dir: String): Seq[(String, () => DataFrame)] = Seq(
      ("corpus_build_v3",
        () => operators.TextAnalysis.corpusBuildV3(
          Tables.documents(spark, dir))),
      ("dedup_increment_indexed",
        () => sources.DedupIndex.incrementReport(spark, dir,
          baseMaxId = 250L)),
      ("customer_cf_increment",
        () => sources.CfIndex.cfIncrement(spark, dir)))

    val rows = (Seq(1) ++ factors).flatMap { factor =>
      val dir = if (factor == 1) sfDir else replicate(factor)
      capstones(dir).map { case (name, thunk) =>
        val (sec, bytes, recs) = measure(thunk())
        println(f"""{"capstone":"$name","factor":$factor,"sec":$sec%.2f,"shuffle_mb":${bytes / 1e6}%.1f,"shuffle_recs":$recs}""")
        (name, factor, sec, bytes)
      }
    }
    // summary: per capstone, the wall and shuffle growth vs factor —
    // the scaling-exponent evidence NOTES records
    val summary = rows.groupBy(_._1).map { case (name, rs) =>
      val base = rs.find(_._2 == 1).get
      val pts = rs.sortBy(_._2).map { case (_, f, sec, bytes) =>
        f"""{"factor":$f,"sec":$sec%.2f,"wall_x":${sec / base._3}%.2f,"shuffle_x":${
          if (base._4 > 0) bytes.toDouble / base._4 else 0.0}%.2f}"""
      }
      s""""$name":[${pts.mkString(",")}]"""
    }
    println(summary.mkString("{", ",", s""","sf":"$sfDir"}"""))
    spark.stop()
  }
}
