package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

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

  /** State-partition count for the streaming gates when the caller
    * does not pin one (round 15, VERDICT r14 #3). Every micro-batch of
    * a stateful query pays per-STATE-PARTITION fixed costs — state
    * store load + commit (a delta/snapshot file each, per store, per
    * batch; ×4 stores for a stream-stream join) plus one task — so the
    * partition count should track STATE VOLUME, not the session's CPU
    * count: inheriting `spark.sql.shuffle.partitions` (= cores locally,
    * 3× executor cores on the cluster posture) made a ≤150-key
    * mapGroupsWithState gate commit 32 near-empty stores per batch,
    * pure fixed overhead — the dominant term of the tiny-jobs
    * streaming family the r14 verdict flagged. Parameterized
    * (`spark.graft.stream.statePartitions` /
    * `$SPARK_GRAFT_STREAM_STATE_PARTITIONS`) with a local default of 8:
    * production sizes it to peak keys × bytes/key ÷ target store size
    * (DEPLOY.md), the same rule the two explicit gate pins (8 and 4)
    * already applied. Results are partitioning-independent — this
    * changes WHERE keys live, never what is computed.
    */
  private def defaultStatePartitions(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.stream.statePartitions")
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS"))
      .map(_.toInt).getOrElse(8)

  /** Drive a streaming DataFrame to completion: AvailableNow trigger +
    * memory sink — processes everything present, then terminates,
    * returning the result table ordered by `orderCols`. The
    * batch-equivalence harness for every streaming query the driver
    * checks. `mode` follows the query shape: "complete" for streaming
    * aggregations, "append" for dedup, "update" for
    * mapGroupsWithState.
    *
    * The memory sink is the GATE HARNESS ONLY — it materializes the
    * result in driver memory so the oracle can hash it. A production
    * pipeline writes `.format("parquet")`/Kafka with a checkpoint
    * location and keeps nothing on the driver; don't copy this shape
    * into a deployment.
    */
  def runAvailableNow(stream: DataFrame, orderCols: Seq[String],
                      mode: String = "complete",
                      statePartitions: Option[Int] = None): DataFrame = {
    val spark = stream.sparkSession
    val name = "graft_stream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // stateful operators pay per-partition state-store commit overhead
    // every micro-batch; heavily-stateful queries (stream-stream joins
    // keep 4 stores per partition) want fewer, larger state partitions
    // (see [[defaultStatePartitions]] for the sizing rule).
    // The conf is read at query START and baked into the checkpoint, so
    // scoping it around start() is safe; restore afterwards.
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    spark.conf.set(key,
      statePartitions.getOrElse(defaultStatePartitions(spark)).toString)
    try {
      val q = stream
        .writeStream.format("memory").queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // SPARK_GRAFT_STREAM_DEBUG=1: dump per-batch progress (batch id,
      // input rows, watermark) — the tool for diagnosing flush races
      if (sys.env.get("SPARK_GRAFT_STREAM_DEBUG").contains("1"))
        q.recentProgress.foreach(pr => println(
          s"STREAMDEBUG $name batch=${pr.batchId} rows=${pr.numInputRows} " +
            s"wm=${pr.eventTime.get("watermark")}"))
    } finally spark.conf.set(key, saved)
    val out = spark.table(name).orderBy(orderCols.map(col): _*)
    // resolve the sink relation into the plan NOW, then drop the
    // catalog name: repeated runs in one session (bench sweeps, test
    // suites) would otherwise accumulate a full result copy per UUID
    // view forever; after the caller releases `out`, the sink data is
    // garbage-collectable
    out.queryExecution.analyzed
    spark.catalog.dropTempView(name)
    out
  }

  /** [[wordCountStream]] driven to completion — the batch-equivalence
    * form (must equal [[WordCount.wordCount]] over the same lines,
    * which is what the driver's wordcount oracle checks).
    */
  def wordCountAvailableNow(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(wordCountStream(spark, dir), Seq("word"))

  /** The Space-Saving heavy-hitters sketch as a STREAMING aggregate:
    * the same `TypedImperativeAggregate` the batch gate uses runs
    * inside a complete-mode streaming aggregation — its serialized
    * ≤ m-entry buffer IS the state-store row, so the running top-k
    * over an unbounded stream is fixed-memory by construction (the
    * exact word-count alternative keeps one state row per distinct
    * word — vocabulary-sized state forever). Below capacity the
    * totals are exact, which is the oracle's validity window, same
    * contract as the batch sketch gates.
    */
  def topkWordsSketchAvailableNow(spark: SparkSession, dir: String,
                                  m: Int = 1024, k: Int = 20): DataFrame = {
    val sk = spark.readStream.text(dir)
      .select(explode(WordCount.cleanWords(col("value"))).as("word"))
      .agg(graft.functions.TopKFreqSketch.topk_sketch(col("word"), m).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.word").as("word"), col("e.cnt").as("cnt"))
    runAvailableNow(sk, Seq("word"))
      .orderBy(col("cnt").desc, col("word")).limit(k)
  }

  /** [[windowedEventCounts]] over the events parquet read as a file
    * stream (schema pinned from a batch read), driven to completion:
    * the watermark+window machinery under the driver's oracle — in
    * complete mode every window is emitted, so the result equals the
    * batch tumbling aggregation.
    */
  private val streamDirCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-path corpus-max event time (epoch anything-the-caller-scans) —
    * a fixture constant, memoized so repeated stream constructions skip
    * the 1-row max scan job (same lifetime/keying as [[streamDirCache]]).
    */
  private val cutoffCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** The file stream source requires a DIRECTORY basePath: stage a
    * single parquet file behind a symlink in a temp dir (cached per
    * source path, exactly one file — so AvailableNow runs one batch).
    */
  private def stagedFileDir(path: String): String =
    streamDirCache.computeIfAbsent(path, _ => {
      val d = graft.TempDirs.scratch("graft_stream_src_")
      java.nio.file.Files.createSymbolicLink(
        d.resolve(java.nio.file.Paths.get(path).getFileName.toString),
        java.nio.file.Paths.get(path))
      d.toString
    })

  /** The testdata events parquet as a file stream with `ts` normalized
    * to epoch-ms, mirroring [[graft.Tables.events]].
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema).parquet(stagedFileDir(path))
    raw.withColumn("ts_ms", graft.Tables.tsMsExpr(raw.schema("ts").dataType))
      .drop("ts")
  }

  /** [[windowedEventCounts]] over the events file stream, driven to
    * completion: the watermark+window machinery under the driver's
    * oracle — in complete mode every window is emitted, so the result
    * equals the batch tumbling aggregation.
    */
  def eventsWindowsAvailableNow(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(windowedEventCounts(eventsStream(spark, dir)),
      Seq("window_start_ms", "event_type"))

  /** [[streamingDedup]] over the documents file stream (synthetic
    * event time = doc_id ms), driven to completion in append mode; the
    * surviving fingerprint set equals batch `SELECT DISTINCT md5(text)`
    * regardless of which duplicate row won the race.
    */
  /** Streaming MODEL SERVING (24th streaming gate): score the
    * documents file stream with the trained classifier
    * ([[graft.operators.TextAnalysis.classifierTrain]] weights from
    * the per-session registry). Deployment shape: the 256-slot weight
    * vector is embedded as a MAP LITERAL inside a per-row fold over
    * the hashed bigrams — no join, no shuffle, no state; scoring is a
    * stateless codegen projection, which is exactly how a quality
    * model rides an ingest stream at 100 TB/day. Driven to completion
    * in append mode the per-doc rows equal the batch
    * `doc_classifier_trained_score` (the alias oracle): per-row
    * folding over bigram OCCURRENCES computes the same Σ cnt·w the
    * batch feature-table join aggregates, and a <2-token doc scores
    * exactly 0 on both paths.
    */
  def classifierServeAvailableNow(spark: SparkSession, dir: String,
                                  slots: Int = 256,
                                  rounds: Int = 3): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema).parquet(stagedFileDir(path))
    val wm = graft.operators.TextAnalysis
      .classifierTrainCached(spark, dir, slots, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scored = raw
      .withColumn("wm", typedLit(wm))
      .withColumn("ws", graft.operators.WordCount.cleanWords(col("text")))
      .select(col("doc_id"),
        when(size(col("ws")) < 2, lit(0L)).otherwise(expr(
          s"""aggregate(
             |  transform(sequence(0, size(ws) - 2),
             |    i -> concat_ws(' ', slice(ws, i + 1, 2))),
             |  0L,
             |  (acc, g) -> acc + coalesce(element_at(wm,
             |    cast(conv(substr(md5(g), 1, 15), 16, 10) AS bigint) % $slots),
             |    0L))""".stripMargin)).as("logit"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_en"))
      .select(col("doc_id"), col("logit"), (col("logit") > 0).as("accept"),
        col("is_en"))
      .withColumn("correct", col("accept") === (col("is_en") === 1L))
    runAvailableNow(scored, Seq("doc_id"), mode = "append")
  }

  def dedupAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    // synthetic event time offset above 0: a row at epoch 0 ties the
    // stream's INITIAL watermark and is dropped as late data
    val raw = spark.readStream.schema(schema).parquet(stagedFileDir(path))
      .withColumn("ts_ms", col("doc_id") + lit(86400000L))
    runAvailableNow(streamingDedup(raw).select(col("fp")), Seq("fp"),
      mode = "append")
  }

  /** Per-source running table checksum as a streaming aggregation:
    * XOR is commutative and self-inverse, so the complete-mode state
    * is 8 bytes + count per source REGARDLESS of arrival order or
    * batch boundaries — the streaming ingest-integrity monitor. Driven
    * to completion it must equal the batch
    * [[graft.operators.DataQuality.tableChecksum]] (the driver's
    * oracle, via the alias map).
    */
  def tableChecksumAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema).parquet(stagedFileDir(path))
    runAvailableNow(
      raw.select(col("source"), col("doc_id"),
          when(col("doc_id").isNull || col("text").isNull, 1L).otherwise(0L)
            .as("isnull"),
          // chr(1) NULL sentinel + null_rows count — mirrors the batch
          // tableChecksum exactly (a NULL row must move the checksum,
          // not vanish from it)
          expr("cast(conv(substr(md5(concat(coalesce(cast(doc_id AS string), chr(1)), ':', coalesce(text, chr(1)))), 1, 15), 16, 10) AS bigint)")
            .as("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"), sum("isnull").as("null_rows"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"),
          expr("bit_xor(h)").as("checksum")),
      Seq("source"))
  }

  /** Streaming HyperLogLog — the register table of
    * [[graft.operators.TextAnalysis.hllRegisters]] maintained as a
    * streaming `groupBy(bucket).max(rho)`: max is the canonical
    * mergeable streaming aggregate (monotone, no retraction ever
    * needed), so the state store holds exactly m longs REGARDLESS of
    * input volume — the always-on distinct-shingle monitor (dedup
    * index capacity metering on the live stream) whose memory
    * cannot grow, where a streaming COUNT(DISTINCT) would keep every
    * key. Driven to completion the registers equal the batch ones
    * bit-for-bit (max is arrival-order independent), so the summary
    * row equals `distinct_shingles_hll` (the driver's oracle, via the
    * alias map). The exact-count eval column comes from the batch
    * table — eval plumbing, not stream state.
    */
  def hllDistinctAvailableNow(spark: SparkSession, dir: String,
                              m: Int = 64): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema).parquet(stagedFileDir(path))
    val regs = runAvailableNow(
      graft.operators.TextAnalysis.hllRegisters(
        graft.operators.TextAnalysis.hllGramStream(raw, 3), "gram", m),
      Seq("bucket"))
    val exact = graft.operators.TextAnalysis
      .hllGramStream(spark.read.parquet(path), 3)
      .agg(count_distinct(col("gram")).as("n_exact"))
    graft.operators.TextAnalysis.hllSummarize(regs, exact, m)
  }

  /** Stream-static near-duplicate probe — the REALTIME form of the
    * nightly [[graft.operators.Dedup.winnowIncrement]] batch: arriving
    * documents (doc_id > baseMaxId on the file stream) compute their
    * winnow fingerprints with the same stateless codegen expression
    * the batch path uses, explode, and equi-join the STATIC base
    * fingerprint index — a stream-static join keeps zero join state,
    * so the only streaming state is the (new_id, base_id) shared-count
    * aggregate, bounded by true collisions. Driven to completion it
    * must equal the batch increment probe (the driver's oracle, via
    * the alias map). At 100 TB the static side is the persisted
    * bucketed winnow index ([[graft.sources.DedupIndex]]); each
    * micro-batch pays |batch fingerprints| × collision rate, never
    * base².
    */
  def winnowIncrementAvailableNow(spark: SparkSession, dir: String,
                                  baseMaxId: Long = 250L,
                                  minShared: Int = 3): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val base = graft.operators.Dedup.winnowSelected(
        spark.read.parquet(path).where(col("doc_id") <= baseMaxId), 4, 4)
      .select(col("doc_id").as("base_id"),
        explode(array_distinct(col("fps"))).as("fp"))
    val raw = spark.readStream.schema(schema).parquet(stagedFileDir(path))
      .where(col("doc_id") > baseMaxId)
    val arrivals = graft.operators.Dedup.winnowSelected(raw, 4, 4)
      .select(col("doc_id").as("new_id"),
        explode(array_distinct(col("fps"))).as("fp"))
    runAvailableNow(
      arrivals.join(base, "fp")
        .groupBy("new_id", "base_id").agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared),
      Seq("new_id", "base_id"))
  }

  // dir -> staged incremental-ANN tag: the base build + the streamed
  // delta ingest run ONCE per (session, sf dir) under computeIfAbsent;
  // every probe afterwards reads the appended index (the DedupIndex
  // staging discipline)
  private val annStreamed =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Streaming ANN ingest — the realtime twin of
    * [[graft.sources.AnnIndex.appendDelta]]: arriving vectors (vec_id
    * ≥ the 80% cut on the embeddings file stream) are argmin-assigned
    * against the PERSISTED frozen centroids and appended to the
    * bucketed postings inside foreachBatch — the production shape for
    * an embedding firehose feeding a serving index (the target is a
    * bucketed lake table, which has no native streaming writer). The
    * assignment is stateless (a 1-row broadcast of k centroid structs
    * inside each micro-batch), so the stream keeps ZERO state; append
    * order cannot matter because postings are a set. Driven to
    * completion the probed index equals the batch increment — the
    * driver's oracle via the alias map (`ann_ivf_increment`).
    */
  def annIncrementAvailableNow(spark: SparkSession, dir: String,
                               nQueries: Int = 10, k: Int = 5,
                               nClusters: Int = 8,
                               iters: Int = 5): DataFrame = {
    import graft.sources.AnnIndex
    val path = s"$dir/embeddings.parquet"
    // the staging key carries the index parameters (the ensureInc
    // discipline): a non-default caller must get its own build
    val tag = annStreamed.computeIfAbsent(s"$dir#$nClusters#$iters", { _ =>
      val t = graft.sources.StagedTags.tagOf(s"$dir#$nClusters#$iters#stream")
      val emb = spark.read.parquet(path)
      val cut = AnnIndex.incCut(spark, dir)
      // nightly base: frozen quantizer + base postings only — the
      // stream owns the delta
      AnnIndex.writeIncBase(emb.where(col("vec_id") < cut),
        emb.where(col("vec_id") < cut), t, nClusters, iters)
      val schema = emb.schema
      val ckpt = graft.TempDirs.scratch("graft_anns_ckpt_")
      val q = spark.readStream.schema(schema).parquet(stagedFileDir(path))
        .where(col("vec_id") >= cut)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          AnnIndex.appendDelta(batch.sparkSession, t, batch)
        }
        .start()
      q.awaitTermination()
      deleteRecursively(ckpt)
      t
    })
    AnnIndex.queryTables(spark, s"graft_anni_cent_$tag",
      s"graft_anni_cells_$tag",
      spark.read.parquet(path).where(col("vec_id") < nQueries), k)
  }

  /** [[sessionCounts]] (mapGroupsWithState) over the events file
    * stream, driven to completion in update mode: one staged file =
    * one batch, so each user's final session count is emitted exactly
    * once and equals the batch sessionization count.
    */
  def sessionCountsAvailableNow(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(sessionCounts(spark, eventsStream(spark, dir)),
      Seq("user_id"), mode = "update")

  /** Spark 4 `transformWithState` (the arbitrary-stateful-processing
    * API superseding mapGroupsWithState): a [[UserSpendProcessor]]
    * with a typed ValueState accumulating each user's event count and
    * integer-cents spend. Runs on the RocksDB state-store provider —
    * the API requires it; the conf is read at query start, so scoping
    * it around the run is safe (same pattern as the shuffle-partition
    * scoping in [[runAvailableNow]]). One staged file = one batch, so
    * update mode emits each user exactly once with the final totals,
    * equal to the batch per-user aggregate.
    */
  def twsUserSpendAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, dir)
      .select(col("user_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .as[(Long, Long)]
    val out = ev.groupByKey(_._1)
      .transformWithState(new UserSpendProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "cents")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try runAvailableNow(out, Seq("user_id"), mode = "update")
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case scala.None => spark.conf.unset(key)
    }
  }

  /** Stream-stream interval join: purchases ⋈ views by user within the
    * preceding `windowMs`, both sides watermarked (the time-range
    * condition is what lets Spark bound each side's join state — an
    * unconstrained stream-stream join would buffer forever). Inner
    * join + append mode emits each matched (purchase, view) pair once;
    * equals the batch interval join's pair set.
    */
  def intervalJoinAvailableNow(spark: SparkSession, dir: String,
                               windowMs: Long = 600000L): DataFrame = {
    val ev = eventsStream(spark, dir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        timestamp_millis(col("ts_ms")).as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), timestamp_millis(col("ts_ms")).as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val joined = p.join(v,
      col("p_user") === col("v_user") &&
        // millisecond-granularity interval: `INTERVAL n SECONDS` would
        // silently truncate a windowMs that isn't a whole second and
        // diverge from the batch/oracle bound (exact milliseconds)
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowMs MILLISECONDS") &&
        col("v_ts") < col("p_ts"))
      .select(col("purchase_id"), unix_millis(col("v_ts")).as("view_ms"))
    runAvailableNow(joined, Seq("purchase_id", "view_ms"), mode = "append",
      statePartitions = Some(8))
  }

  /** Staged events source for the OUTER join: the corpus file plus
    * FOUR watermark-heartbeat sentinel files 2/4/6/8 h past the corpus
    * max event time. Outer-join null rows only emit once the watermark
    * PASSES their join window, and the commit of a batch's event-time
    * max into the global watermark LAGS: eviction in micro-batch N
    * runs against a watermark from batch N−1 — and, raced against
    * back-to-back AvailableNow batches, sometimes N−2. Heartbeat 1
    * advances the watermark past every real event; the extra
    * heartbeats guarantee enough trailing batches that the final
    * eviction runs with it even at the worst observed lag (measured:
    * with only one trailing batch the run nondeterministically left
    * the last unmatched purchase unflushed).
    *
    * Each sentinel file carries one `purchase` and one `view` row with
    * `event_id = user_id = −1`: Catalyst pushes the event-type filters
    * BELOW the `EventTimeWatermark` operator, so a row must pass its
    * branch's filter to advance that branch's watermark (the global
    * watermark is the min across branches) — a row of a type matching
    * neither branch is invisible to both. The −1 key matches no real
    * user, and the consumer drops heartbeat rows with a predicate ON
    * THE WATERMARK COLUMN (a time cutoff between the corpus max and
    * the first heartbeat), the one predicate shape Catalyst will not
    * push below the watermark node.
    * This is the standard idle-source heartbeat pattern, staged as
    * data because the file source has no per-partition idle-timeout
    * hook; file modification times are forced ascending so
    * `maxFilesPerTrigger=1` batches corpus → hb1 → hb2 in order.
    *
    * Round 11 trims the heartbeat count 4 → 2 (the fixture was the
    * sweep's slowest query and drifting up ~1 s/round): at the worst
    * observed commit lag (eviction in batch N against the watermark of
    * batch N−2), the AvailableNow no-data FINAL batch still evicts
    * with heartbeat-1's watermark = corpus max + 2 h − 1 h delay,
    * strictly past every real purchase — one full heartbeat of margin
    * beyond the measured failure mode (one heartbeat, where the final
    * eviction's lag-2 watermark is corpus max − 1 h and the last
    * unmatched purchase never flushes). An 8×-rerun stress spec pins
    * the flush determinism at this count.
    */
  private def stagedEventsWithSentinel(spark: SparkSession, dir: String,
                                       nSentinels: Int = 2): String =
    streamDirCache.computeIfAbsent(s"$dir#sentinel$nSentinels", _ => {
      val out = graft.TempDirs.scratch("graft_loj_src_")
      val path = s"$dir/events.parquet"
      java.nio.file.Files.createSymbolicLink(
        out.resolve("0_events.parquet"), java.nio.file.Paths.get(path))
      val ev = spark.read.parquet(path)
      // ts is TIMESTAMP(NANOS)-as-long under the session's legacy flag;
      // handle a genuine timestamp too (same branch as eventsStream)
      def bump(hours: Long) = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          col("ts") + lit(hours * 3600L * 1000 * 1000 * 1000)
        case _ => col("ts") + expr(s"INTERVAL $hours HOURS")
      }
      for (i <- 1 to nSentinels) {
        val tmp = graft.TempDirs.scratch("graft_loj_tmp_")
        val base = ev.orderBy(col("ts").desc).limit(1)
          .withColumn("ts", bump(2L * i))
          .withColumn("event_id", lit(-1L))
          .withColumn("user_id", lit(-1L))
        base.withColumn("event_type", lit("purchase"))
          .unionByName(base.withColumn("event_type", lit("view")))
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).iterator()
        var moved = false
        while (part.hasNext && !moved) {
          val f = part.next()
          if (f.getFileName.toString.endsWith(".parquet")) {
            java.nio.file.Files.move(f, out.resolve(s"${i}_sentinel.parquet"))
            moved = true
          }
        }
        require(moved, s"sentinel $i parquet part file not produced")
      }
      // ascending mod times: corpus first, then heartbeats in order
      val now = System.currentTimeMillis()
      ("0_events.parquet" +: (1 to nSentinels).map(i => s"${i}_sentinel.parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.setLastModifiedTime(out.resolve(f),
            java.nio.file.attribute.FileTime.fromMillis(now + i * 2000L))
        }
      out.toString
    })

  /** Stream-stream LEFT OUTER interval join: every purchase joined to
    * the views of the same user in the preceding `windowMs`, emitting
    * `(purchase_id, -1)` for purchases with NO prior view once the
    * watermark passes their window (the -1 sentinel keeps the column
    * BIGINT on both engines). The watermark is assigned BEFORE the
    * event-type filters so the staged heartbeat row advances it past
    * every real purchase; the AvailableNow no-data final batch then
    * flushes the remaining outer state, making the result equal the
    * batch left join. State on both sides is watermark-bounded exactly
    * as in [[intervalJoinAvailableNow]].
    */
  def leftOuterIntervalJoinAvailableNow(spark: SparkSession, dir: String,
                                        windowMs: Long = 600000L): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val staged = stagedEventsWithSentinel(spark, dir)
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
    val tsMs = graft.Tables.tsMsExpr(raw.schema("ts").dataType)
    val ev = raw.withColumn("ts_ms", tsMs)
    // Heartbeat cutoff: real events end at the corpus max; heartbeats
    // start 2 h past it. The heartbeat-dropping predicate MUST
    // reference the watermark column — Catalyst pushes any predicate
    // NOT referencing it below the EventTimeWatermark node
    // (PushPredicateThroughNonJoin), and a heartbeat filtered below
    // the watermark node never advances the watermark (measured: a
    // `purchase_id != -1` guard left the watermark frozen at
    // real-max − delay and the last unmatched purchase never flushed).
    // the corpus max is a fixture constant per dir — memoized like the
    // sentinel staging above it (r16: the 1-row max scan was a full
    // batch job per invocation, paid 3× per bench measurement)
    val cutoff = timestamp_millis(lit(cutoffCache.computeIfAbsent(path,
      _ => spark.read.parquet(path)
        .agg(max(tsMs.cast("long"))).head().getLong(0)) + 3600000L))
    val p = ev.withColumn("p_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("p_ts", "1 hour")
      .where(col("event_type") === "purchase" && col("p_ts") < cutoff)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("p_ts"))
    val v = ev.withColumn("v_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("v_ts", "1 hour")
      .where(col("event_type") === "view" && col("v_ts") < cutoff)
      .select(col("user_id").as("v_user"), col("v_ts"))
    val joined = p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowMs MILLISECONDS") &&
          col("v_ts") < col("p_ts"),
        "left_outer")
      .select(col("purchase_id"),
        coalesce(unix_millis(col("v_ts")), lit(-1L)).as("view_ms"))
    // 4 state partitions: the join state is user-keyed and tiny at any
    // SF the fixture runs; fewer stores = less per-batch provider
    // overhead on a 3-batch harness (measured, same result)
    runAvailableNow(joined, Seq("purchase_id", "view_ms"), mode = "append",
      statePartitions = Some(4))
  }

  /** Sliding windows (width 10 min, slide 5 min) over the events file
    * stream — each event in two windows; complete mode equals the
    * batch [[graft.operators.Relational.slidingWindows]].
    */
  def slidingWindowsAvailableNow(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(
      eventsStream(spark, dir)
        .groupBy(window(timestamp_millis(col("ts_ms")), "10 minutes", "5 minutes")
          .as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_millis(col("w.start")).as("window_start_ms"),
          col("event_type"), col("n_events")),
      Seq("window_start_ms", "event_type"))

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

  /** Full session ROWS via `flatMapGroupsWithState` — the multi-row
    * custom-state API (mapGroupsWithState emits exactly one row per
    * group; this emits one per session). Events arrive in one staged
    * batch, so each user's history is sessionized in one invocation and
    * the emitted rows equal batch
    * [[graft.operators.Relational.sessions]]. Per-user buffering is
    * bounded by events/user (the sessionization sort), same contract as
    * the batch window.
    */
  /** Corpus ∪ one sentinel row PER EVENT TYPE one day past the global
    * max event time — the flush companion for keyed day-fold state
    * ([[ewmaAvailableNow]]): a day's aggregate is only known complete
    * when a LATER day arrives on the same key, so the last real day
    * would otherwise sit in state forever. One sentinel per type
    * reaches every group (flatMapGroupsWithState state is per-key;
    * a single sentinel of one type would flush one group only — the
    * per-branch cousin of the watermark-heartbeat rule in
    * [[stagedEventsWithSentinel]]). The sentinel is the corpus' latest
    * row re-stamped, so its schema tracks the fixture verbatim; its
    * own pending day never folds, so it is invisible in the output.
    */
  private def stagedEventsWithTypeSentinels(spark: SparkSession,
                                            dir: String): String =
    streamDirCache.computeIfAbsent(s"$dir#typesentinel", _ => {
      val out = graft.TempDirs.scratch("graft_ewma_src_")
      val path = s"$dir/events.parquet"
      java.nio.file.Files.createSymbolicLink(
        out.resolve("0_events.parquet"), java.nio.file.Paths.get(path))
      val ev = spark.read.parquet(path)
      def bump = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          col("ts") + lit(86400L * 1000 * 1000 * 1000)
        case _ => col("ts") + expr("INTERVAL 1 DAY")
      }
      val types = ev.select("event_type").distinct()
        .collect().map(_.getString(0)).sorted
      val base = ev.orderBy(col("ts").desc).limit(1)
        .withColumn("ts", bump)
        .withColumn("event_id", lit(-1L))
        .withColumn("user_id", lit(-1L))
      val tmp = graft.TempDirs.scratch("graft_ewma_tmp_")
      types.map(t => base.withColumn("event_type", lit(t)))
        .reduce(_ unionByName _)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val f = part.next()
        if (f.getFileName.toString.endsWith(".parquet")) {
          java.nio.file.Files.move(f, out.resolve("1_sentinel.parquet"))
          moved = true
        }
      }
      require(moved, "type-sentinel parquet part file not produced")
      val now = System.currentTimeMillis()
      Seq("0_events.parquet", "1_sentinel.parquet").zipWithIndex.foreach {
        case (f, i) => java.nio.file.Files.setLastModifiedTime(out.resolve(f),
          java.nio.file.attribute.FileTime.fromMillis(now + i * 2000L))
      }
      out.toString
    })

  /** Streaming integer EWMA of daily counts per event type (the 15th
    * streaming gate): ordered per-key replay folds each COMPLETED day
    * into the α=1/2 halving recurrence — a day completes when the
    * first later-day row of the same type arrives, so the staged
    * per-type sentinel (see [[stagedEventsWithTypeSentinels]]) flushes
    * the final real day and itself never emits. State per type is
    * (pending day, pending count, ewma) — O(1), no watermark needed.
    * Equality with the batch [[graft.operators.Relational.eventsEwma]]
    * recurrence is the driver-gated contract.
    */
  def ewmaAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val staged = stagedEventsWithTypeSentinels(spark, dir)
    val raw = spark.readStream.schema(schema).parquet(staged)
    val ev = raw.withColumn("ts_ms",
      graft.Tables.tsMsExpr(raw.schema("ts").dataType))
    val out = ev.select(col("event_type").as[String],
        expr("ts_ms div 86400000").as[Long], col("event_id").as[Long])
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long, Long, Boolean)]) =>
          // state: (pendingDay, pendingCount, prevEwma, hasPrev)
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var (pd, pc, ew, has) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L, false))
          val outRows = scala.collection.mutable.ArrayBuffer
            .empty[(String, Long, Long, Long)]
          def fold(): Unit = if (pd != Long.MinValue) {
            val s = if (has) (pc + ew) / 2 else pc
            outRows += ((typ, pd, pc, s)); ew = s; has = true
          }
          sorted.foreach { case (_, d, _) =>
            if (d != pd) { fold(); pd = d; pc = 0L }
            pc += 1
          }
          state.update((pd, pc, ew, has))
          outRows.iterator
      }.toDF("event_type", "epoch_day", "n", "ewma")
    runAvailableNow(out, Seq("event_type", "epoch_day"), mode = "update")
  }

  /** Streaming Holt level+trend smoothing — [[ewmaAvailableNow]]'s
    * day-fold with the two-state recurrence of
    * [[graft.operators.Relational.eventsHolt]] (lₜ = (nₜ+l+b) div 2,
    * bₜ = (lₜ−l+b) div 2). Same per-type sentinel flush, same O(1)
    * state per key — the pattern scales to any fixed-arity recurrence.
    */
  def holtAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val staged = stagedEventsWithTypeSentinels(spark, dir)
    val raw = spark.readStream.schema(schema).parquet(staged)
    val ev = raw.withColumn("ts_ms",
      graft.Tables.tsMsExpr(raw.schema("ts").dataType))
    val out = ev.select(col("event_type").as[String],
        expr("ts_ms div 86400000").as[Long], col("event_id").as[Long])
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long, Long, Long, Boolean)]) =>
          // state: (pendingDay, pendingCount, level, trend, hasPrev)
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var (pd, pc, l, b, has) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L, 0L, false))
          val outRows = scala.collection.mutable.ArrayBuffer
            .empty[(String, Long, Long, Long, Long)]
          def fold(): Unit = if (pd != Long.MinValue) {
            val nl = if (has) (pc + l + b) / 2 else pc
            val nb = if (has) (nl - l + b) / 2 else 0L
            outRows += ((typ, pd, pc, nl, nb)); l = nl; b = nb; has = true
          }
          sorted.foreach { case (_, d, _) =>
            if (d != pd) { fold(); pd = d; pc = 0L }
            pc += 1
          }
          state.update((pd, pc, l, b, has))
          outRows.iterator
      }.toDF("event_type", "epoch_day", "n", "level", "trend")
    runAvailableNow(out, Seq("event_type", "epoch_day"), mode = "update")
  }

  /** Per-purchase last-touch attribution as an ordered per-key state
    * replay (flatMapGroupsWithState, the 14th streaming gate): each
    * user's batch rows sort by (ts_ms, event_id), the carried state is
    * the latest click/view touch — so the replay continues correctly
    * across micro-batch boundaries for time-ordered sources — and
    * every purchase emits its credited channel at per-purchase grain:
    * the streaming form of
    * [[graft.operators.Relational.lastTouchAttribution]]. Equality
    * with the batch window formulation is the driver-gated contract.
    */
  def attributionAvailableNow(spark: SparkSession, dir: String,
                              windowMs: Long = 604800000L): DataFrame = {
    import spark.implicits._
    val out = eventsStream(spark, dir)
      .select(col("user_id").as[Long], col("event_id").as[Long],
        col("event_type").as[String], col("ts_ms").as[Long],
        col("value").as[Double])
      .as[(Long, Long, String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, String, Long, Double)],
         state: GroupState[(Long, String)]) =>
          val sorted = rows.toSeq.sortBy(r => (r._4, r._2))
          var (ltMs, ltType) = state.getOption.getOrElse((Long.MinValue, ""))
          val hits = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long)]
          sorted.foreach { case (_, eid, et, ts, v) =>
            et match {
              case "click" | "view" =>
                ltMs = ts; ltType = et
              case "purchase" =>
                val ch = if (ltMs != Long.MinValue && ltMs >= ts - windowMs)
                  ltType else "direct"
                hits += ((eid, ch, math.round(v * 100)))
              case _ => ()
            }
          }
          state.update((ltMs, ltType))
          hits.iterator
      }.toDF("purchase_id", "channel", "value_cents")
    runAvailableNow(out, Seq("purchase_id"), mode = "update")
  }

  /** [[graft.operators.Relational.sinceLastError]] as keyed streaming
    * state — the CDC-tombstone accumulator running forever: per user
    * the state is `(version, reset_ms, n, cents)`; an 'error' row
    * wipes the accumulators and advances the reset watermark, any
    * later-stamped row accumulates. Each micro-batch emits the user's
    * current totals tagged with a monotone `ver`, and the gate
    * materializes the LATEST emission per user (`max_by` on ver) —
    * exactly how a downstream consumer compacts an update stream.
    *
    * Batch equivalence holds under per-key ordered delivery (the file
    * stream's staged batches are time-ordered — the same replay
    * contract as [[attributionAvailableNow]]); a late error older
    * than the current reset cannot retro-subtract already-counted
    * rows, so the reset only ever advances (`ts >= reset` guard).
    */
  def sinceLastErrorAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = eventsStream(spark, dir)
      .select(col("user_id").as[Long], col("event_id").as[Long],
        col("event_type").as[String], col("ts_ms").as[Long],
        col("value").as[Double])
      .as[(Long, Long, String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, String, Long, Double)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(r => (r._4, r._2))
          var (ver, reset, n, cents) =
            state.getOption.getOrElse((0L, Long.MinValue, 0L, 0L))
          sorted.foreach { case (_, _, et, ts, v) =>
            if (et == "error") {
              if (reset == Long.MinValue || ts >= reset) {
                reset = ts; n = 0L; cents = 0L
              }
            } else if (reset == Long.MinValue || ts > reset) {
              n += 1L; cents += math.round(v * 100)
            }
          }
          ver += 1L
          state.update((ver, reset, n, cents))
          Iterator((user, ver, n, cents))
      }.toDF("user_id", "ver", "n_since", "cents_since")
    runAvailableNow(out, Seq("user_id", "ver"), mode = "update")
      .groupBy("user_id")
      .agg(expr("max_by(struct(n_since, cents_since), ver)").as("s"))
      .select(col("user_id"), col("s.n_since").as("n_since"),
        col("s.cents_since").as("cents_since"))
      .orderBy("user_id")
  }

  def sessionRows(spark: SparkSession, events: DataFrame,
                  gapMs: Long = 1800000L): DataFrame = {
    import spark.implicits._
    events.select(col("user_id").as[Long], col("ts_ms").as[Long],
        col("event_id").as[Long])
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long, Long)]
          var sessionId = state.getOption.getOrElse(0L)
          var lastMs = Long.MinValue
          var n = 0L
          var startMs = 0L
          def close(endMs: Long): Unit =
            if (n > 0) out += ((user, sessionId, n, startMs, endMs))
          sorted.foreach { case (_, ts, _) =>
            if (lastMs == Long.MinValue || ts - lastMs > gapMs) {
              close(lastMs)
              sessionId += 1
              n = 0L
              startMs = ts
            }
            n += 1
            lastMs = ts
          }
          close(lastMs)
          state.update(sessionId)
          out.iterator
      }
      .toDF("user_id", "session_id", "n_events", "start_ms", "end_ms")
  }

  /** [[sessionRows]] driven to completion, update mode; equals the
    * batch sessionize oracle row-for-row.
    */
  def sessionRowsAvailableNow(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(sessionRows(spark, eventsStream(spark, dir)),
      Seq("user_id", "session_id"), mode = "update")

  /** The PRODUCTION sink shape: a stateless token stream appended to a
    * parquet directory with a checkpoint (exactly-once via the sink's
    * file-manifest log), then aggregated by a separate batch read —
    * the write side keeps zero driver state and restarts resume from
    * the checkpoint, unlike the memory-sink gate harness above. The
    * count-after-read equals the batch word count.
    */
  def fileSinkWordCount(spark: SparkSession, textDir: String): DataFrame = {
    val out = graft.TempDirs.scratchString("graft_fsink_out_")
    val ckpt = graft.TempDirs.scratchString("graft_fsink_ckpt_")
    val q = spark.readStream.text(textDir)
      .select(explode(WordCount.cleanWords(col("value"))).as("word"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")
  }

  /** Latest row per user over a frame with the full event columns —
    * the per-batch MERGE step of [[foreachBatchUpsertAvailableNow]].
    * (ts_ms, event_id) is a total order, so the winner is independent
    * of how rows were split across micro-batches.
    */
  private def latestPerUser(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** Staged copy of the events table split into TWO parquet files (by
    * event_id parity) so `maxFilesPerTrigger=1` replays it as two
    * micro-batches. Cached per sf dir; checkpoints are NOT cached (a
    * fresh run must reprocess).
    */
  private def stagedEventsSplit(spark: SparkSession, dir: String): String =
    streamDirCache.computeIfAbsent(s"$dir#split", _ => {
      val out = graft.TempDirs.scratchString("graft_fbu_src_")
      val ev = graft.Tables.events(spark, dir)
      ev.where(col("event_id") % 2 === 0)
        .coalesce(1).write.mode("append").parquet(out)
      stampFresh(out, 1000000L) // even half: fixed old mtime → batch 0
      ev.where(col("event_id") % 2 === 1)
        .coalesce(1).write.mode("append").parquet(out)
      stampFresh(out, 2000000L) // odd half: strictly newer → batch 1
      out
    })

  /** Pin the mtimes of NOT-yet-stamped parquet files under `dir` to
    * the fixed epoch `t` (< any wall clock this code will ever see).
    * `FileStreamSource` orders files by modification time, so two
    * write phases stamped 1000000/2000000 replay as two micro-batches
    * in a deterministic order — wall-clock write mtimes can tie on a
    * coarse-granularity FS and deliver the halves in either order.
    * Freshly written files carry a real (≫ 2000000) mtime, so the
    * `> 2000000` guard stamps exactly the files of the current write
    * phase and never re-bumps an earlier phase's stamp; the distinct-
    * stamps invariant is asserted after the second phase.
    */
  private def stampFresh(dir: String, t: Long): Unit = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    files.foreach { f =>
      if (f.lastModified() > 2000000L)
        require(f.setLastModified(t), s"setLastModified failed: $f")
    }
    if (t == 2000000L) {
      val stamps = files.map(_.lastModified()).toSet
      require(stamps == Set(1000000L, 2000000L),
        s"staged two-batch source must carry both stamps, got $stamps")
    }
  }

  /** Staged copy of the events table split into TWO parquet files BY
    * TIME (below/above the median ts) with explicit modification
    * times, so `maxFilesPerTrigger=1` replays it as two micro-batches
    * in event-time order — the delivery contract the ordered state
    * replays ([[attributionAvailableNow]] and the funnel) assume. The
    * parity split deliberately violates that order (it exists to prove
    * order-INDEPENDENT folds); this one exists to prove chain state
    * survives a batch boundary mid-stream.
    */
  private def stagedEventsTimeSplit(spark: SparkSession, dir: String): String =
    streamDirCache.computeIfAbsent(s"$dir#timesplit", _ => {
      val out = graft.TempDirs.scratchString("graft_wf_src_")
      val ev = graft.Tables.events(spark, dir)
      val cut = ev.agg(expr("percentile(ts_ms, 0.5D)")).head().getDouble(0)
      ev.where(col("ts_ms") <= cut)
        .coalesce(1).write.mode("append").parquet(out)
      stampFresh(out, 1000000L) // early half: fixed old mtime
      ev.where(col("ts_ms") > cut)
        .coalesce(1).write.mode("append").parquet(out)
      stampFresh(out, 2000000L) // late half: strictly newer → batches second
      out
    })

  /** [[graft.operators.Relational.windowFunnel]] as keyed streaming
    * state (23rd streaming gate) — the continuously-maintained
    * conversion funnel a production team watches live. Per user the
    * state is the greedy chain frontier: the max step level reached,
    * the views still awaiting their FIRST qualifying signup, and the
    * (vt, st) chains awaiting a purchase inside the window anchored at
    * vt. The greedy earliest-next-step exactness argument (see the
    * batch operator) means this state is EXACTLY sufficient: no event
    * history is kept, only frontier pairs, and both lists prune
    * against the advancing event time — state per user is O(active
    * chains inside one window), not O(events). Replayed over the
    * TIME-split two-batch staging, so the chain state provably
    * survives a micro-batch boundary; driven to completion it equals
    * the batch funnel (the driver's oracle via the alias map).
    */
  def windowFunnelAvailableNow(spark: SparkSession, dir: String,
                               windowHours: Int = 6): DataFrame = {
    import spark.implicits._
    val w = windowHours * 3600000L
    val staged = stagedEventsTimeSplit(spark, dir)
    val schema = spark.read.parquet(staged).schema
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
    val ev = raw
      .select(col("user_id").as[Long], col("event_id").as[Long],
        col("event_type").as[String], col("ts_ms").as[Long])
      .as[(Long, Long, String, Long)]
    val out = ev.groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, String, Long)],
         state: GroupState[(Int, List[Long], List[(Long, Long)])]) =>
          val sorted = rows.toSeq.sortBy(r => (r._4, r._2))
          var (level, pending, open) = state.getOption
            .getOrElse((0, List.empty[Long], List.empty[(Long, Long)]))
          sorted.foreach { case (_, _, et, ts) =>
            et match {
              case "view" =>
                if (level < 1) level = 1
                if (level < 3) pending = ts :: pending
              case "signup" if level < 3 =>
                // this signup is the greedy FIRST for every pending
                // view whose window it lands in; views whose window
                // already closed can never match a later signup
                val (matched, rest) =
                  pending.partition(vt => ts > vt && ts <= vt + w)
                if (matched.nonEmpty) {
                  if (level < 2) level = 2
                  open = matched.map(vt => (vt, ts)) ::: open
                }
                pending = rest.filter(vt => vt + w >= ts)
              case "purchase" if level < 3 =>
                if (open.exists { case (vt, st) => ts > st && ts <= vt + w }) {
                  level = 3; pending = Nil; open = Nil
                } else
                  open = open.filter { case (vt, _) => vt + w >= ts }
              case _ => ()
            }
          }
          state.update((level, pending, open))
          Iterator((user, level))
      }.toDF("user_id", "level")
    val lv = runAvailableNow(out, Seq("user_id"), mode = "update")
      .groupBy("user_id").agg(max("level").as("level"))
    lv.agg(
        sum(when(col("level") >= 1, 1L).otherwise(0L)).as("n_view_users"),
        sum(when(col("level") >= 2, 1L).otherwise(0L)).as("n_step2"),
        sum(when(col("level") >= 3, 1L).otherwise(0L)).as("n_step3"))
      .select(col("n_view_users"), col("n_step2"), col("n_step3"),
        expr("n_step2 * 1000000 div n_view_users").as("step2_ppm"),
        expr("n_step3 * 1000000 div n_view_users").as("step3_ppm"))
  }

  /** foreachBatch MERGE-style upsert: each micro-batch folds its rows
    * into a versioned parquet snapshot of the latest state per user —
    * the production sink shape when the target store has no native
    * streaming writer (JDBC, a plain lake table). Each batch writes
    * `v<batchId>` from union(previous version, batch) — never
    * overwriting the file it is reading, the overwrite-while-read trap
    * — and the final version equals the batch latest-per-user query no
    * matter how the stream was micro-batched, because keep-latest over
    * the total order (ts_ms, event_id) is associative.
    *
    * Scale note: the cumulative rewrite is O(users) per batch — the
    * right shape while the dimension fits a partition set; past that,
    * the target becomes a partitioned/bucketed table and each batch
    * rewrites only the touched buckets.
    */
  def foreachBatchUpsertAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val lastPath = runUpsertStream(spark, dir)
    val latest =
      if (lastPath == null) {
        // zero micro-batches staged (empty input): empty state table,
        // NOT an NPE — same schema as the populated path
        import spark.implicits._
        spark.emptyDataset[(Long, Long, String, Double)]
          .toDF("user_id", "ts_ms", "event_type", "value")
      } else spark.read.parquet(lastPath)
    snapshotCols(latest)
  }

  private def snapshotCols(df: DataFrame): DataFrame = df
    .select(col("user_id"), col("ts_ms").as("last_ts_ms"),
      col("event_type").as("last_type"),
      round(col("value") * 100).cast("long").as("last_value_c"))
    .orderBy("user_id")

  /** Run the foreachBatch upsert stream over the parity-split events
    * and return the LATEST version path (null on empty input). The
    * version directories v0..vN stay on disk for the session — they
    * are the versioned lake [[lakeTimeTravel]] reads back.
    */
  private def runUpsertStream(spark: SparkSession, dir: String): String = {
    val staged = stagedEventsSplit(spark, dir)
    val schema = spark.read.parquet(staged).schema
    val ckpt = graft.TempDirs.scratch("graft_fbu_ckpt_")
    val targetRoot = graft.TempDirs.scratch("graft_fbu_tgt_")
    @volatile var lastPath: String = null
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev = lastPath
        val all =
          if (prev == null) batch
          else batch.sparkSession.read.parquet(prev).unionByName(batch)
        val out = s"$targetRoot/v$batchId"
        latestPerUser(all).write.mode("overwrite").parquet(out)
        lastPath = out
      }
      .start()
    q.awaitTermination()
    // the checkpoint is dead once the AvailableNow run terminates; the
    // snapshot dirs must outlive this call (read back lazily, and by
    // the time-travel gate), so they are reaped at JVM exit instead
    // (targetRoot is registered for exit-time deletion by
    // TempDirs.scratch); the dead checkpoint goes now
    deleteRecursively(ckpt)
    lastPath
  }

  // dir -> versioned-lake root, built once per (session, sf dir):
  // the time-travel gate must read a lake SOMEONE wrote, not re-run
  // the stream per probe (the DedupIndex staging discipline)
  private val versionedLakes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Lake time-travel: the as-of-version READ half of the versioned
    * snapshot lake the foreachBatch upsert maintains ([[runUpsertStream]]
    * writes `v<batchId>` per micro-batch and never overwrites an older
    * version — exactly the snapshot chain an Iceberg/Delta table keeps).
    * Version v's read-back must equal the batch recompute over the
    * first v+1 micro-batches; with the parity split, v0 is
    * latest-per-user over the even-event_id half — the driver-gated
    * contract. At 100 TB the versions a real table keeps are manifest
    * deltas, not full copies, but the READ contract (as-of = the state
    * the stream had committed then) is identical.
    */
  def lakeTimeTravel(spark: SparkSession, dir: String,
                     version: Int = 0): DataFrame = {
    snapshotCols(spark.read.parquet(s"${lakeRoot(spark, dir)}/v$version"))
  }

  private def lakeRoot(spark: SparkSession, dir: String): String =
    versionedLakes.computeIfAbsent(dir, _ => {
      val last = runUpsertStream(spark, dir)
      require(last != null, s"no micro-batches staged for $dir")
      new java.io.File(last).getParent
    })

  /** Snapshot-retention accounting — the expiry/VACUUM planning pass
    * every versioned lake runs before deleting anything: per version,
    * its row count and whether the `keepLast` retention window keeps
    * it. The version listing is a metadata directory walk (bounded by
    * micro-batch count, never data-sized) and each version contributes
    * one count aggregate; at 100 TB the counts come from manifest
    * stats instead of scans, but the retention arithmetic — and the
    * invariant that a reclaimed version must be re-derivable from a
    * retained one plus the log — is the same.
    */
  def snapshotExpiry(spark: SparkSession, dir: String,
                     keepLast: Int = 1): DataFrame = {
    val root = lakeRoot(spark, dir)
    val versions = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong).sorted
    val cut = versions.max - keepLast + 1
    versions.map { v =>
      spark.read.parquet(s"$root/v$v")
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(v).as("version"), col("n_rows"),
          lit(v >= cut).as("retained"))
    }.reduce(_.unionByName(_)).orderBy("version")
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.TempDirs.deleteRecursively(p)

  /** Staged copy of the lineitem table split into TWO parquet files
    * (by orderkey parity) so `maxFilesPerTrigger=1` replays it as two
    * micro-batches; cached per sf dir like [[stagedEventsSplit]].
    */
  private def stagedLineitemSplit(spark: SparkSession, dir: String): String =
    streamDirCache.computeIfAbsent(s"$dir#lisplit", _ => {
      val out = graft.TempDirs.scratchString("graft_ivm_src_")
      val li = graft.Tables.lineitem(spark, dir)
      li.where(col("l_orderkey") % 2 === 0)
        .coalesce(1).write.mode("append").parquet(out)
      li.where(col("l_orderkey") % 2 === 1)
        .coalesce(1).write.mode("append").parquet(out)
      out
    })

  /** STREAMING materialized-view maintenance — the realtime form of
    * the batch [[graft.operators.Relational.ivmAggDelta]]: each
    * micro-batch turns its lineitem slice into signed CDC rows
    * ([[graft.operators.Relational.ivmSignedRows]] — the signs are
    * per-row, so a batch's contribution is self-contained no matter
    * how the stream was cut), aggregates ONLY that slice, and
    * full-outer-merges the group-key-sized delta into a versioned
    * parquet snapshot of the view (the foreachBatch MERGE shape of
    * [[foreachBatchUpsertAvailableNow]], applied to an AGGREGATE
    * instead of latest-row state). Signed sums are associative and
    * commutative, so driven to completion the final version equals
    * the batch IVM output — the driver's oracle via the alias map.
    * Scale note: per batch the stored state rewritten is O(group
    * keys), never O(rows seen) — the streaming-materialized-view
    * contract that makes a 100 TB rollup maintainable at all.
    */
  def ivmAggAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedLineitemSplit(spark, dir)
    val schema = spark.read.parquet(staged).schema
    val ckpt = graft.TempDirs.scratch("graft_ivm_ckpt_")
    val targetRoot = graft.TempDirs.scratch("graft_ivm_tgt_")
    @volatile var lastPath: String = null
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = graft.operators.Relational.ivmSignedAgg(
          graft.operators.Relational.ivmSignedRows(batch))
        val prev = lastPath
        val merged =
          if (prev == null) delta
          else {
            val m = batch.sparkSession.read.parquet(prev)
            m.select(col("l_returnflag"), col("cnt").as("m_cnt"),
                col("sum_qty").as("m_qty"), col("sum_price_c").as("m_price"))
              .join(delta, Seq("l_returnflag"), "full_outer")
              .select(col("l_returnflag"),
                (coalesce(col("m_cnt"), lit(0L)) + coalesce(col("cnt"), lit(0L)))
                  .as("cnt"),
                (coalesce(col("m_qty"), lit(0L)) + coalesce(col("sum_qty"), lit(0L)))
                  .as("sum_qty"),
                (coalesce(col("m_price"), lit(0L))
                  + coalesce(col("sum_price_c"), lit(0L))).as("sum_price_c"))
          }
        val out = s"$targetRoot/v$batchId"
        merged.write.mode("overwrite").parquet(out)
        lastPath = out
      }
      .start()
    q.awaitTermination()
    deleteRecursively(ckpt)
    val state =
      if (lastPath == null) {
        import spark.implicits._
        spark.emptyDataset[(String, Long, Long, Long)]
          .toDF("l_returnflag", "cnt", "sum_qty", "sum_price_c")
      } else spark.read.parquet(lastPath)
    state.where(col("cnt") > 0).orderBy("l_returnflag")
  }

  /** Stream-static join: the event stream enriched against a BATCH
    * dimension (customer → nation) then aggregated. The static side is
    * broadcast — each micro-batch probes it with zero shuffle and zero
    * join state (nothing to watermark: the dimension is re-resolvable
    * every batch, the standard streaming-enrichment shape).
    */
  def streamStaticJoinAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val dim = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"))
    val enriched = eventsStream(spark, dir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
    runAvailableNow(enriched, Seq("nationkey"))
  }

  /** Per-type value quantiles through the KLL sketch as STREAMING
    * aggregation state: the TypedImperativeAggregate's serialized
    * sketch lives in the state store and merges across micro-batches,
    * so an always-on pipeline gets percentiles in O(k) memory per
    * group. Driven to completion it must equal the batch
    * [[graft.operators.Relational.valueQuantilesSketch]] (exact below
    * the sketch's k — the same oracle validity window).
    */
  def valueQuantilesSketchAvailableNow(spark: SparkSession, dir: String,
                                       k: Int = 32768): DataFrame = {
    val q = eventsStream(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.KllQuantiles.kll_quantiles(
          col("c"), k, Seq(0.25d, 0.5d, 0.75d)).as("qs"))
      .select(col("event_type"), col("n"),
        col("qs")(0).as("p25"), col("qs")(1).as("p50"), col("qs")(2).as("p75"))
    runAvailableNow(q, Seq("event_type"))
  }
}

/** [[Streams.twsUserSpendAvailableNow]]'s StatefulProcessor: per-user
  * (count, cents) in a single typed ValueState, the new-API
  * counterpart of the mapGroupsWithState session counter. State lives
  * in RocksDB on the executors; no TTL (the gate runs to completion —
  * a production counter would set one).
  */
private class UserSpendProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long), (Long, Long, Long)] {
  @transient private var st:
    org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("agg",
      org.apache.spark.sql.Encoders.product[(Long, Long)],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long)] = {
    var (n, cents) = if (st.exists()) st.get() else (0L, 0L)
    rows.foreach { case (_, c) => n += 1; cents += c }
    st.update((n, cents))
    Iterator.single((key, n, cents))
  }
}
