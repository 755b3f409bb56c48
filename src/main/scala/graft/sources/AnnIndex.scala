package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Clustering, Similarity}

/** Persisted IVF index: the write-once ANN layout a serving pipeline
  * probes per query batch. [[Similarity.annIvfKmeansIndexed]] amortizes
  * the k-means within ONE session; at 100 TB the index outlives any
  * session, so this materializes both halves on disk:
  *
  *  - `cent`  (cluster, cv)                 — k·d rows, plain parquet
  *  - `cells` (vec_id, cell, e, nrm)        — bucketed by cell: the
  *    posting lists, with the cast vector and hoisted norm stored so a
  *    probe never rescans or recomputes over the corpus table
  *
  * A query batch assigns itself against the persisted centroids
  * (broadcast argmin), then reads ONLY its own cells' postings — the
  * `cell IN (...)` filter prunes buckets at the scan, which is the IVF
  * promise: query cost ∝ probed postings, not corpus size. The cell-id
  * list collected to build that filter is query-batch-sized (≤ one id
  * per query), never data-sized.
  */
object AnnIndex {

  private def tables(tag: String): (String, String) =
    (s"graft_ann_cent_$tag", s"graft_ann_cells_$tag")

  /** Materialize centroids + cell-bucketed postings for `emb`. */
  def writeIndex(emb: DataFrame, tag: String, nClusters: Int, iters: Int,
                 buckets: Int = 8): Unit = {
    val (centT, cellsT) = tables(tag)
    val cents = Clustering.lloydCentroids(emb, nClusters, iters)
    cents.write.mode("overwrite").format("parquet").saveAsTable(centT)
    val pre = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(Similarity.dot(col("e"), col("e"))))
      .join(Clustering.cellAssignments(emb, cents), "vec_id")
    pre.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "cell").saveAsTable(cellsT)
  }

  /** Top-k cosine neighbors for `queries` against the persisted index.
    * Same output contract (and, for the same parameters, the same
    * result) as [[Similarity.annIvfKmeansIndexed]] — the gate shares
    * its oracle.
    */
  def query(spark: SparkSession, tag: String, queries: DataFrame,
            k: Int): DataFrame = {
    val (centT, cellsT) = tables(tag)
    queryTables(spark, centT, cellsT, queries, k)
  }

  private[graft] def queryTables(spark: SparkSession, centT: String,
                                 cellsT: String, queries: DataFrame,
                                 k: Int): DataFrame = {
    val cents = spark.table(centT)
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qe"))
      .withColumn("qn", sqrt(Similarity.dot(col("qe"), col("qe"))))
      .join(Clustering.cellAssignments(queries, cents)
        .select(col("vec_id").as("query_id"), col("cell")), "query_id")
    // query-batch-sized driver list (≤ one cell id per query): the IN
    // filter is what lets the scan prune to the probed buckets
    val qCells = q.select("cell").distinct().collect().map(_.getLong(0))
    val posts = spark.table(cellsT).where(col("cell").isin(qCells: _*))
    val scored = posts.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (Similarity.dot(col("qe"), col("e")) / (col("qn") * col("nrm"))).as("cos"))
    val win = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(win).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  // dir -> tag, populated under computeIfAbsent so the index write
  // completes before any concurrent caller can query it
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Gate query: IVF top-k through the PERSISTED index — built once
    * per (session, sf dir), probed on every rerun; same parameters and
    * oracle as `ann_ivf_kmeans`.
    */
  def annReport(spark: SparkSession, dir: String, nQueries: Int, k: Int,
                nClusters: Int = 8, iters: Int = 5): DataFrame = {
    val emb = graft.Tables.embeddings(spark, dir)
    val tag = staged.computeIfAbsent(dir, { _ =>
      val t = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
      writeIndex(emb, t, nClusters, iters)
      t
    })
    query(spark, tag, emb.where(col("vec_id") < nQueries), k)
  }

  // ------------------------------------------------------------------
  // Incremental maintenance (round 11): new vectors APPEND to their
  // home cell's postings — one broadcast argmin against the persisted
  // centroids plus a bucket-partitioned append. Base posting files are
  // never rewritten (spec-proven); centroids stay frozen until the
  // drift tripwire says a rebuild is due, exactly how a production IVF
  // index absorbs a day's embeddings.
  // ------------------------------------------------------------------

  private def tablesInc(tag: String): (String, String) =
    (s"graft_anni_cent_$tag", s"graft_anni_cells_$tag")

  /** The posting rows for `emb` against a FIXED centroid set: cast
    * vector + hoisted norm + home cell (broadcast argmin — the same
    * shape writeIndex precomputes, factored so base build and delta
    * append share it).
    */
  private def postingsFor(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(Similarity.dot(col("e"), col("e"))))
      .join(Clustering.cellAssignments(emb, cents), "vec_id")

  /** Build the incremental index family: centroids trained on
    * `embTrain` ONLY (the frozen quantizer), postings over `embPost`.
    * The production base build passes the same frame for both; the
    * spec's one-shot reference passes (base, all) to produce the
    * target state an append must reach.
    */
  def writeIncBase(embTrain: DataFrame, embPost: DataFrame, tag: String,
                   nClusters: Int, iters: Int, buckets: Int = 8): Unit = {
    val (centT, cellsT) = tablesInc(tag)
    val cents = Clustering.lloydCentroids(embTrain, nClusters, iters)
    cents.write.mode("overwrite").format("parquet").saveAsTable(centT)
    postingsFor(embPost, cents).write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "cell").saveAsTable(cellsT)
  }

  /** Fold a delta of new vectors into the persisted index: assign each
    * against the FROZEN centroids (broadcast argmin — no training),
    * append to the bucketed postings table. Existing files are
    * untouched; each bucket gains one new file per append, compacted
    * whenever the periodic centroid rebuild rewrites the index.
    */
  def appendDelta(spark: SparkSession, tag: String, embDelta: DataFrame,
                  buckets: Int = 8): Unit = {
    val (centT, cellsT) = tablesInc(tag)
    postingsFor(embDelta, spark.table(centT))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "cell").saveAsTable(cellsT)
  }

  /** The base/delta split point: the last ~20% of vec_ids play the
    * nightly delta (engine- and SF-independent integer math, mirrored
    * by the oracle's scalar subquery).
    */
  def incCut(spark: SparkSession, dir: String): Long =
    (graft.Tables.embeddings(spark, dir).agg(max("vec_id")).head().getLong(0)
      + 1L) * 4L / 5L

  private val stagedInc =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // staging key AND table tag both carry the index parameters: a
  // second caller with different (nClusters, iters) must get its own
  // build, never a silently-mismatched cached one
  private def ensureInc(spark: SparkSession, dir: String,
                        nClusters: Int, iters: Int): String =
    stagedInc.computeIfAbsent(s"$dir#$nClusters#$iters", { key =>
      val t = java.lang.Long.toHexString(key.hashCode.toLong & 0xffffffffL)
      val emb = graft.Tables.embeddings(spark, dir)
      val cut = incCut(spark, dir)
      writeIncBase(emb.where(col("vec_id") < cut),
        emb.where(col("vec_id") < cut), t, nClusters, iters)
      appendDelta(spark, t, emb.where(col("vec_id") >= cut))
      t
    })

  /** Gate query: IVF top-k through the INCREMENTED index — centroids
    * trained on the base 80%, the delta 20% folded in by append-only
    * probes. The oracle recomputes the same frozen-quantizer contract
    * (Lloyd over base ids, assignment over all).
    */
  def annIncrementReport(spark: SparkSession, dir: String, nQueries: Int,
                         k: Int, nClusters: Int = 8,
                         iters: Int = 5): DataFrame = {
    val tag = ensureInc(spark, dir, nClusters, iters)
    val (centT, cellsT) = tablesInc(tag)
    queryTables(spark, centT, cellsT,
      graft.Tables.embeddings(spark, dir).where(col("vec_id") < nQueries), k)
  }

  /** Compact the incremented postings table: each append leaves one
    * more file per touched bucket, and an index that absorbs deltas
    * forever degrades into a small-file scan problem — so periodic
    * compaction rewrites the SAME rows (the frozen centroids and cell
    * assignments are untouched) into one file per bucket. The read
    * snapshot materializes BEFORE the overwrite (the
    * overwrite-while-read trap, same discipline as the foreachBatch
    * upsert); `repartition(buckets, cell)` uses the bucket hash, so
    * each task holds exactly one bucket's rows and writes exactly one
    * file. Query results are byte-identical by construction
    * (spec-proven), which is what makes compaction safe to schedule.
    */
  def compact(spark: SparkSession, tag: String, buckets: Int = 8): Unit = {
    val (_, cellsT) = tablesInc(tag)
    val snap = spark.table(cellsT).localCheckpoint()
    snap.repartition(buckets, col("cell"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "cell").saveAsTable(cellsT)
  }

  private val compacted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Gate query: the increment top-k served AFTER compaction — the
    * full maintenance cycle (base build → append → compact → probe)
    * with the result provably unchanged (same oracle as
    * `ann_ivf_increment`).
    */
  def annCompactReport(spark: SparkSession, dir: String, nQueries: Int,
                       k: Int, nClusters: Int = 8,
                       iters: Int = 5): DataFrame = {
    val tag = ensureInc(spark, dir, nClusters, iters)
    compacted.computeIfAbsent(s"$dir#$nClusters#$iters",
      { _ => compact(spark, tag); tag })
    val (centT, cellsT) = tablesInc(tag)
    queryTables(spark, centT, cellsT,
      graft.Tables.embeddings(spark, dir).where(col("vec_id") < nQueries), k)
  }

  /** Drift tripwire: compare the delta's quantization error against
    * the base's under the FROZEN centroids. A fresh delta assigned to
    * stale centroids shows inflated distance-to-centroid; when
    * drift_ppm (delta avg d² as ppm of base avg d²) exceeds 1.5×10⁶,
    * the increment loop schedules a centroid rebuild instead of
    * appending forever. All-integer (scaled d², truncating div), one
    * broadcast-argmin scan + one global aggregate.
    */
  def annIncrementDrift(spark: SparkSession, dir: String,
                        nClusters: Int = 8, iters: Int = 5): DataFrame = {
    val tag = ensureInc(spark, dir, nClusters, iters)
    val (centT, _) = tablesInc(tag)
    val cut = incCut(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    val scaled = emb.select(col("vec_id"),
      Clustering.scaledVec(col("embedding")).as("ev"))
    Clustering.assignAgainst(scaled, spark.table(centT))
      .select(col("vec_id"), col("d2"))
      .agg(
        sum(when(col("vec_id") < cut, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("vec_id") >= cut, 1L).otherwise(0L)).as("n_delta"),
        sum(when(col("vec_id") < cut, col("d2")).otherwise(0L)).as("s_base"),
        sum(when(col("vec_id") >= cut, col("d2")).otherwise(0L)).as("s_delta"))
      .select(col("n_base"), col("n_delta"),
        expr("s_base div n_base").as("base_avg_d2"),
        expr("s_delta div n_delta").as("delta_avg_d2"),
        expr("(s_delta div n_delta) * 1000000 div greatest(s_base div n_base, 1)")
          .as("drift_ppm"))
      .withColumn("rebuild_due", col("drift_ppm") > 1500000L)
  }
}
