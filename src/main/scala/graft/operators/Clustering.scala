package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means building blocks over the `embeddings` table —
  * the clustering step a training-data pipeline runs before IVF
  * indexing / stratified sampling / topic bucketing.
  *
  * Determinism contract (shared with the DuckDB oracle): every vector
  * element is scaled to a `round(x·10⁶)` bigint FIRST, and all distance
  * math is exact integer arithmetic from then on — squared L2 in
  * scaled² units. No float summation order anywhere, so argmin and the
  * centroid sums hash-match bit-for-bit on any engine. (Magnitudes:
  * unit-norm floats scale to ≤ ~10⁶; a squared diff is ≤ ~4·10¹², and a
  * 64-dim sum ≤ ~3·10¹⁴ — far inside int64 even under ANSI mode.)
  *
  * Scale shape: the k centroids ride a ONE-ROW broadcast (an array of
  * (cluster, vec) structs); assignment is a per-row `array_min` over
  * that array — no shuffle at all. The update step's only shuffle is
  * the (cluster, dim) partial-aggregated sum, k·d rows global. A full
  * Lloyd iteration at 100 TB is therefore scan + broadcast + one tiny
  * shuffle.
  */
object Clustering {

  /** `round(x·10⁶)` scaled-bigint view of a float vector. */
  def scaledVec(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000000).cast("long"))

  /** Deterministic seed centroids: the k lowest-id embeddings
    * (cluster label = vec_id), scaled.
    */
  def centroids(embs: DataFrame, k: Int): DataFrame =
    embs.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cluster"), scaledVec(col("embedding")).as("cv"))

  /** All k centroids as ONE row holding a sorted array of structs —
    * the broadcast-scalar shape for per-row argmin.
    */
  private def centroidArray(embs: DataFrame, k: Int): DataFrame =
    centroids(embs, k)
      .agg(sort_array(collect_list(struct(col("cluster"), col("cv")))).as("cents"))

  private def assignWithVec(embs: DataFrame, k: Int): DataFrame =
    embs.select(col("vec_id"), scaledVec(col("embedding")).as("ev"))
      // 1-row scalar broadcast (k centroid structs), not a data join
      .join(broadcast(centroidArray(embs, k)))
      // argmin by (d2, cluster) via lexicographic struct array_min —
      // integer math only, ties break to the lowest cluster id
      .withColumn("best", array_min(transform(col("cents"), c =>
        struct(
          aggregate(
            zip_with(col("ev"), c.getField("cv"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d2"),
          c.getField("cluster").as("cluster")))))
      .select(col("vec_id"), col("ev"),
        col("best").getField("cluster").as("cluster"),
        col("best").getField("d2").as("d2"))

  /** Assignment step: each vector's nearest seed centroid (exact
    * scaled-integer squared L2) and that distance.
    */
  def assign(embs: DataFrame, k: Int): DataFrame =
    assignWithVec(embs, k)
      .select("vec_id", "cluster", "d2")
      .orderBy("vec_id")

  /** Update step: per-(cluster, dim) scaled coordinate sums + member
    * counts — the sufficient statistics for the next centroids
    * (mean = sum_scaled / cnt / 10⁶), kept as exact integers so the
    * result is engine-independent. `dim` is 1-based.
    */
  def step(embs: DataFrame, k: Int): DataFrame =
    assignWithVec(embs, k)
      .select(col("cluster"), posexplode(col("ev")))
      .select(col("cluster"), (col("pos") + 1).cast("long").as("dim"),
        col("col").as("v"))
      .groupBy("cluster", "dim")
      .agg(sum("v").as("sum_scaled"), count(lit(1)).as("cnt"))
      .orderBy("cluster", "dim")
}
