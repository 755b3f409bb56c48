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
}
