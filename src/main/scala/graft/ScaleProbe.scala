package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence harness: synthesize a `factor`× copy of the
  * documents/events/lineitem tables in a temp dir (ids shifted per
  * copy; document text perturbed with a per-copy tag token so
  * near-dup structure isn't degenerate 10-clones), then time the
  * heaviest operators on base vs scaled. Prints one JSON line per
  * table scale with steady-state (min-of-2, after warmup) seconds —
  * the "would this hold at 10× the bench SF" measurement NOTES.md
  * records each round.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.ScaleProbe [factor]`
  */
object ScaleProbe {

  /** The CF increment's signed-delta derivation over plain frames:
    * base incidence from (liB, ordsB) before the cut, delta from
    * (liD, ordsD) after it — the probe holds the base fixed while the
    * delta scales, isolating the nightly-increment cost.
    */
  private def cfIncDeltas(liB: DataFrame, ordsB: DataFrame,
                          liD: DataFrame, ordsD: DataFrame): DataFrame = {
    val cut = to_timestamp(lit(graft.sources.CfIndex.CutDate))
    def inc(li: DataFrame, ords: DataFrame, pred: Column): DataFrame = li
      .join(ords.where(pred), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val cpB = inc(liB, ordsB, col("o_orderdate") < cut)
    val dcp = inc(liD, ordsD, col("o_orderdate") >= cut)
    val (_, _, dsh, _) = graft.sources.CfIndex.cfDeltas(dcp, cpB,
      cpB.select("p", "c"),
      cpB.groupBy("p").agg(count(lit(1)).as("df")), 30)
    dsh
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // args: [factor] [probe names...] — a non-numeric first arg is
    // treated as a probe name, not a factor (so `ScaleProbe file_ndv`
    // works without remembering to write the 10)
    val factorGiven = args.headOption.exists(a =>
      a.nonEmpty && a.forall(_.isDigit) && scala.util.Try(a.toInt).isSuccess)
    val factor = if (factorGiven) args(0).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession
      .builder("graft-scale-probe", s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outPath = java.nio.file.Files.createTempDirectory("graft_scale_")
    val out = outPath.toString
    // the scaled copies are sf1-sized (multi-GB at factor 10) — delete
    // them on exit so repeated probe runs can't fill the temp volume
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(outPath).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () }))

    def scaleAndWrite(name: String, df: DataFrame, idCols: Seq[String],
                      shift: Long, perturbText: Boolean): String = {
      val scaled = (0 until factor).map { i =>
        var c = df
        idCols.foreach(id => c = c.withColumn(id, col(id) + lit(i * shift)))
        if (perturbText)
          c = c.withColumn("text", concat_ws(" ", col("text"), lit(s"copytag$i")))
        c
      }.reduce(_ unionByName _)
      val path = s"$out/$name"
      scaled.write.mode("overwrite").parquet(path)
      path
    }

    val docs = scaleAndWrite("documents", Tables.documents(spark, sfDir),
      Seq("doc_id"), 10000000L, perturbText = true)
    val events = scaleAndWrite("events",
      Tables.events(spark, sfDir).withColumn("ts",
        // keep a ts column so Tables.events-style ms math still applies
        col("ts_ms")).drop("ts_ms"),
      Seq("event_id", "user_id"), 10000000L, perturbText = false)
    val li = scaleAndWrite("lineitem", Tables.lineitem(spark, sfDir),
      Seq("l_orderkey"), 100000000L, perturbText = false)
    val emb = scaleAndWrite("embeddings", Tables.embeddings(spark, sfDir),
      Seq("vec_id"), 10000000L, perturbText = false)
    // custkeys shift with the copy too, so each copy is an independent
    // customer population (baskets replicate, pairs don't cross copies)
    val ords = scaleAndWrite("orders", Tables.orders(spark, sfDir),
      Seq("o_orderkey", "o_custkey"), 100000000L, perturbText = false)

    def time(f: => DataFrame): Double = {
      def once: Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once // warmup/compile
      math.min(once, once)
    }

    val docsBase = Tables.documents(spark, sfDir)
    val docsBig = spark.read.parquet(docs)
    val eventsBase = Tables.events(spark, sfDir)
    val eventsBig = spark.read.parquet(events)
      .withColumn("ts_ms", col("ts")).drop("ts")
    val liBase = Tables.lineitem(spark, sfDir)
    val liBig = spark.read.parquet(li)
    val ordsBase = Tables.orders(spark, sfDir)
    val ordsBig = spark.read.parquet(ords)
    val embBase = Tables.embeddings(spark, sfDir)
    val embBig = spark.read.parquet(emb)
    // frozen base-trained centroids for the append probe (computed
    // once, eagerly — lloydCentroids checkpoints internally)
    val centsFixed = operators.Clustering.lloydCentroids(embBase, 8, 5)

    // thunks, NOT pre-built DataFrames: operators with eager side
    // effects at construction (crossDocSpans's localCheckpoint fires
    // the span-explode job immediately) must run INSIDE time(), or the
    // probe measures only the post-checkpoint tail
    val probes: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("wordcount",
        () => operators.WordCount.wordCount(docsBase),
        () => operators.WordCount.wordCount(docsBig)),
      ("boilerplate_scrub",
        () => operators.TextAnalysis.boilerplateScrub(docsBase),
        () => operators.TextAnalysis.boilerplateScrub(docsBig)),
      ("minhash_pairs",
        () => operators.Dedup.minhashPairs(docsBase, n = 3, b = 32, r = 4,
          num = 4, den = 5),
        () => operators.Dedup.minhashPairs(docsBig, n = 3, b = 32, r = 4,
          num = 4, den = 5)),
      ("crossdoc_spans",
        () => operators.Dedup.crossDocSpans(docsBase, w = 8),
        () => operators.Dedup.crossDocSpans(docsBig, w = 8)),
      ("sparse_dot_pairs",
        () => operators.TextAnalysis.sparseDotPairs(docsBase, maxDf = 100, minDot = 2L),
        () => operators.TextAnalysis.sparseDotPairs(docsBig, maxDf = 100, minDot = 2L)),
      ("peak_window",
        () => operators.Relational.peakWindowSpend(eventsBase),
        () => operators.Relational.peakWindowSpend(eventsBig)),
      ("skipgram_counts",
        () => operators.TextAnalysis.skipgramCounts(docsBase),
        () => operators.TextAnalysis.skipgramCounts(docsBig)),
      ("phash_neardup",
        () => operators.Multimodal.realPhashNearDup(spark,
          operators.Multimodal.realMediaOfKind(docsBase, 0)),
        () => operators.Multimodal.realPhashNearDup(spark,
          operators.Multimodal.realMediaOfKind(docsBig, 0))),
      ("rolling_7d",
        () => operators.Relational.rollingUserWindow(eventsBase),
        () => operators.Relational.rollingUserWindow(eventsBig)),
      ("word_hits",
        () => operators.Graph.wordHits(docsBase),
        () => operators.Graph.wordHits(docsBig)),
      ("prefix_filter",
        () => operators.Dedup.prefixFilterPairs(docsBase, n = 3, num = 4, den = 5),
        () => operators.Dedup.prefixFilterPairs(docsBig, n = 3, num = 4, den = 5)),
      ("pattern_match",
        () => operators.Basket.patternMatch(eventsBase),
        () => operators.Basket.patternMatch(eventsBig)),
      ("seq_bigrams",
        () => operators.Basket.seqBigrams(eventsBase),
        () => operators.Basket.seqBigrams(eventsBig)),
      ("coactivity_pairs",
        () => operators.Relational.coactivityPairs(eventsBase),
        () => operators.Relational.coactivityPairs(eventsBig)),
      ("since_last_error",
        () => operators.Relational.sinceLastError(eventsBase),
        () => operators.Relational.sinceLastError(eventsBig)),
      ("gap_regularity",
        () => operators.Relational.gapRegularity(eventsBase),
        () => operators.Relational.gapRegularity(eventsBig)),
      ("stl_decompose",
        () => operators.Relational.stlDecompose(eventsBase),
        () => operators.Relational.stlDecompose(eventsBig)),
      ("hapax_ratio",
        () => operators.TextAnalysis.hapaxRatio(docsBase),
        () => operators.TextAnalysis.hapaxRatio(docsBig)),
      ("hybrid_rrf",
        () => operators.TextAnalysis.hybridRrf(docsBase),
        () => operators.TextAnalysis.hybridRrf(docsBig)),
      ("zipf_slope",
        () => operators.TextAnalysis.zipfSlope(docsBase),
        () => operators.TextAnalysis.zipfSlope(docsBig)),
      ("index_increment",
        () => operators.TextAnalysis.indexIncrement(docsBase, 250L),
        () => operators.TextAnalysis.indexIncrement(docsBig, 250L)),
      ("recommendations",
        () => operators.Basket.recommendations(liBase, ordsBase),
        () => operators.Basket.recommendations(liBig, ordsBig)),
      ("q1_style_agg",
        () => liBase.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("s"),
            count(lit(1)).as("n")),
        () => liBig.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("s"),
            count(lit(1)).as("n"))),
      ("winnow_pairs",
        () => operators.Dedup.winnowPairs(docsBase),
        () => operators.Dedup.winnowPairs(docsBig)),
      ("walk_corpus",
        () => operators.Graph.walkCorpus(docsBase),
        () => operators.Graph.walkCorpus(docsBig)),
      ("rake_keyphrases",
        () => operators.TextAnalysis.rakeKeyphrases(docsBase),
        () => operators.TextAnalysis.rakeKeyphrases(docsBig)),
      ("char_collision",
        () => operators.TextAnalysis.charCollision(docsBase),
        () => operators.TextAnalysis.charCollision(docsBig)),
      ("table_checksum",
        () => operators.DataQuality.tableChecksum(docsBase),
        () => operators.DataQuality.tableChecksum(docsBig)),
      ("ktruss_edges",
        () => operators.Graph.ktrussEdges(docsBase),
        () => operators.Graph.ktrussEdges(docsBig)),
      ("word_triangles",
        () => operators.Graph.triangleCount(docsBase),
        () => operators.Graph.triangleCount(docsBig)),
      ("word_modularity",
        () => operators.Graph.wordModularity(docsBase),
        () => operators.Graph.wordModularity(docsBig)),
      ("repetition_profile",
        () => operators.TextAnalysis.repetitionProfile(docsBase),
        () => operators.TextAnalysis.repetitionProfile(docsBig)),
      // base stays copy-0-sized while arrivals 10x: measures the
      // increment-probe side alone, the nightly-batch cost that matters
      ("novelty_report",
        () => operators.Dedup.noveltyReport(docsBase, 250L, 8),
        () => operators.Dedup.noveltyReport(docsBig, 250L, 8)),
      ("seq_pack_stats",
        () => operators.TextAnalysis.seqPackStats(docsBase),
        () => operators.TextAnalysis.seqPackStats(docsBig)),
      ("minhash_eval",
        () => operators.Dedup.minhashEval(docsBase),
        () => operators.Dedup.minhashEval(docsBig)),
      ("bloom_fpr",
        () => operators.Dedup.bloomFprEval(docsBase, 250L),
        () => operators.Dedup.bloomFprEval(docsBig, 250L)),
      ("clustering_coeff",
        () => operators.Graph.clusteringCoefficients(
          operators.Graph.copurchaseEdges(liBase).select("a", "b")),
        () => operators.Graph.clusteringCoefficients(
          operators.Graph.copurchaseEdges(liBig).select("a", "b"))),
      ("delete_vectors",
        () => operators.Layout.deleteVectorStats(liBase),
        () => operators.Layout.deleteVectorStats(liBig)),
      ("silence_profile",
        () => operators.Multimodal.realSilenceProfile(spark,
          operators.Multimodal.realMediaOfKind(docsBase, 1)),
        () => operators.Multimodal.realSilenceProfile(spark,
          operators.Multimodal.realMediaOfKind(docsBig, 1))),
      ("rec_eval",
        () => operators.Basket.recEval(liBase, ordsBase),
        () => operators.Basket.recEval(liBig, ordsBig)),
      ("proximity_search",
        () => operators.TextAnalysis.proximitySearch(docsBase,
          Seq("hash", "join", "scan"), 6),
        () => operators.TextAnalysis.proximitySearch(docsBig,
          Seq("hash", "join", "scan"), 6)),
      ("hll_distinct",
        () => operators.TextAnalysis.hllDistinct(docsBase),
        () => operators.TextAnalysis.hllDistinct(docsBig)),
      ("seq_patterns3",
        () => operators.Basket.seqPatterns3(eventsBase),
        () => operators.Basket.seqPatterns3(eventsBig)),
      ("survival_table",
        () => operators.Relational.survivalTable(ordsBase),
        () => operators.Relational.survivalTable(ordsBig)),
      ("ivm_agg_delta",
        () => operators.Relational.ivmAggDelta(liBase),
        () => operators.Relational.ivmAggDelta(liBig)),
      ("bitmap_index",
        () => operators.Layout.bitmapIndexStats(liBase),
        () => operators.Layout.bitmapIndexStats(liBig)),
      ("classifier_score",
        () => operators.TextAnalysis.classifierScore(docsBase),
        () => operators.TextAnalysis.classifierScore(docsBig)),
      ("join_card_estimate",
        () => operators.DataQuality.joinCardEstimate(liBase),
        () => operators.DataQuality.joinCardEstimate(liBig)),
      ("hll_merged",
        () => operators.TextAnalysis.hllDistinctMerged(docsBase),
        () => operators.TextAnalysis.hllDistinctMerged(docsBig)),
      ("theilsen_trend",
        () => operators.Relational.theilSenTrend(eventsBase),
        () => operators.Relational.theilSenTrend(eventsBig)),
      ("markov_eval",
        () => operators.Relational.markovEval(eventsBase),
        () => operators.Relational.markovEval(eventsBig)),
      ("classifier_calibration",
        () => operators.TextAnalysis.classifierCalibration(docsBase),
        () => operators.TextAnalysis.classifierCalibration(docsBig)),
      ("window_funnel",
        () => operators.Relational.windowFunnel(eventsBase),
        () => operators.Relational.windowFunnel(eventsBig)),
      ("window_funnel4",
        () => operators.Relational.windowFunnelN(eventsBase,
          Seq("view", "click", "signup", "purchase")),
        () => operators.Relational.windowFunnelN(eventsBig,
          Seq("view", "click", "signup", "purchase"))),
      ("file_ndv",
        () => operators.Layout.fileNdvStats(liBase),
        () => operators.Layout.fileNdvStats(liBig)),
      ("mad_outliers",
        () => operators.Relational.madOutliers(eventsBase),
        () => operators.Relational.madOutliers(eventsBig)),
      ("cusum_changepoint",
        () => operators.Relational.cusumChangepoint(eventsBase),
        () => operators.Relational.cusumChangepoint(eventsBig)),
      ("funnel_latency",
        () => operators.Relational.funnelLatency(eventsBase),
        () => operators.Relational.funnelLatency(eventsBig)),
      ("orders_reconciliation",
        () => operators.Relational.ordersReconciliation(ordsBase, liBase),
        () => operators.Relational.ordersReconciliation(ordsBig, liBig)),
      // base CF state stays copy-0-sized while the delta orders 10x —
      // measures the signed-delta derivation alone (the nightly cost);
      // the novelty_report convention for increment probes
      ("cf_increment_delta",
        () => cfIncDeltas(liBase, ordsBase, liBase, ordsBase),
        () => cfIncDeltas(liBase, ordsBase, liBig, ordsBig)),
      ("classifier_train",
        () => operators.TextAnalysis.classifierTrain(docsBase, 256, 2),
        () => operators.TextAnalysis.classifierTrain(docsBig, 256, 2)),
      ("corpus_build_v2",
        () => operators.TextAnalysis.corpusBuildV2(docsBase),
        () => operators.TextAnalysis.corpusBuildV2(docsBig)),
      // the ANN rebuild's compute core: Lloyd retrain over the whole
      // index + the one-pass argmin re-encode (only the bucketed write
      // is not probed) — cost ∝ index size by design
      ("ann_rebuild",
        () => operators.Clustering.cellAssignments(embBase,
          operators.Clustering.lloydCentroids(embBase, 8, 5)),
        () => operators.Clustering.cellAssignments(embBig,
          operators.Clustering.lloydCentroids(embBig, 8, 5))),
      // frozen-quantizer append (the batch appendDelta / streaming
      // ingest core): centroids stay base-trained while arrivals 10x —
      // delta-proportional, no retrain
      ("ann_append",
        () => operators.Clustering.cellAssignments(embBase, centsFixed),
        () => operators.Clustering.cellAssignments(embBig, centsFixed)),
      ("html_extract",
        () => operators.TextAnalysis.htmlExtract(docsBase),
        () => operators.TextAnalysis.htmlExtract(docsBig)))

    // optional args beyond the factor: probe-name filter (iteration
    // aid). A typo'd name must warn, not silently probe nothing.
    val only = (if (factorGiven) args.drop(1) else args).toSet
    val unknown = only -- probes.map(_._1).toSet
    if (unknown.nonEmpty)
      System.err.println(
        s"[scaleprobe] WARNING: no probe named ${unknown.mkString(", ")} " +
          s"(known: ${probes.map(_._1).mkString(", ")})")
    val results = probes
      .filter { case (name, _, _) => only.isEmpty || only(name) }
      .map { case (name, base, big) =>
        val tb = time(base()); val tg = time(big())
        (name, tb, tg)
      }
    val json = results.map { case (n, tb, tg) =>
      f"""\"$n\":{\"base_sec\":$tb%.2f,\"x$factor%d_sec\":$tg%.2f,\"ratio\":${tg / tb}%.2f}"""
    }.mkString("{", ",", s""","factor":$factor,"sf":"$sfDir"}""")
    println(json)
    spark.stop()
  }
}
