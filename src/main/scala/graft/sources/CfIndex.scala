package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Basket

/** Persisted collaborative-filtering index: the nightly-built neighbor
  * tables a production recommender probes per serving run. Before this
  * existed, `customer_cf_neighbors`, `customer_recommendations` and
  * `customer_rec_eval` EACH rebuilt the co-purchase similarity graph
  * from `lineitem` — the single most expensive shared subtree in the
  * whole sweep (~20 s of 374 s at sf0.1). At 100 TB the similarity
  * build is an hours-long batch job; serving and offline eval must be
  * index probes, not graph rebuilds. The [[DedupIndex]]/[[AnnIndex]]
  * build-once/probe-many pattern, applied to recsys:
  *
  *  - `cp`   (c, p)                          bucketed by c — full
  *    df-unpruned incidence (candidate expansion + owned-part removal)
  *  - `nb`   (c_a, c_b, shared, score_ppm, rank) bucketed by c_b —
  *    full-history top-k neighbor graph (the probe key in
  *    candidate expansion is the NEIGHBOR id)
  *  - `cptr` / `nbtr` — the same two tables over the leave-latest-
  *    order-out TRAIN split (the offline-eval contract: the held-out
  *    basket must never reach the similarity graph, so eval probes a
  *    split-trained index, exactly as a production eval harness
  *    scores yesterday's index against today's orders)
  *  - `test` (c, p) bucketed by c — the held-out baskets
  *
  * The graph build (incidence distinct + df-prune + self-join +
  * degree join + top-k) happens ONCE at write time; every probe pays
  * only bucket-local joins, and the bucketed `cp` side of the
  * candidate-expansion join plans without an Exchange. Outputs are
  * byte-identical to the recompute operators ([[Basket.cfNeighbors]] /
  * [[Basket.recommendations]] / [[Basket.recEval]]) — the gates share
  * those oracles.
  */
object CfIndex {

  private def t(name: String, tag: String): String = s"graft_cfx_${name}_$tag"

  /** Materialize the full-history and train-split CF tables, bucketed
    * on their probe keys. One deterministic pipeline per table — the
    * write is the ONLY place the similarity graph is computed.
    */
  def writeIndex(spark: SparkSession, dir: String, tag: String,
                 maxDf: Int = 30, minShared: Int = 2, kNb: Int = 3,
                 buckets: Int = 8): Unit = {
    val lineitem = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)
    // SPARK_GRAFT_TRACE=1: per-phase wall-clock of the index build
    val trace = sys.env.get("SPARK_GRAFT_TRACE").contains("1")
    def timed[A](label: String)(a: => A): A = {
      val t0 = System.nanoTime(); val r = a
      if (trace) println(f"CFX $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def save(df: DataFrame, name: String, cols: Seq[String]): Unit =
      timed(s"save:$name")(df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, cols.head, cols.tail: _*).saveAsTable(t(name, tag)))
    // leave-latest-order-out split (the recEval contract): latest
    // order per customer (orderdate desc, orderkey tiebreak) held out
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val lo = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey").as("last_c"), col("o_orderkey").as("last_ok"))
    // ONE lineitem⋈orders pass + ONE (c, p) aggregation derives all
    // three incidence tables: a pair is in the FULL incidence always,
    // in the TRAIN incidence iff some non-held-out order carries it,
    // and in the held-out TEST baskets iff the customer's latest order
    // carries it (the pair's customer IS that order's customer). Two
    // distinct shuffles + a semi-join collapse into one groupBy.
    val flagged = timed("flagged")(lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"),
        col("o_orderkey").as("ok"))
      .join(lo.select(col("last_ok").as("ok"), lit(1).as("held")),
        Seq("ok"), "left")
      .groupBy("c", "p")
      .agg(max(when(col("held").isNull, 1).otherwise(0)).as("has_train"),
        max(coalesce(col("held"), lit(0))).as("has_held"))
      .localCheckpoint())
    val cpFull = flagged.select("c", "p")
    val cpTrain = flagged.where(col("has_train") === 1).select("c", "p")
    // the five table builds share no lineage past the checkpoint and
    // local[32] has far more slots than any one of these small jobs
    // uses — run them as concurrent Spark jobs (same pattern a real
    // cluster uses to overlap the latency-bound small writes)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val writes = Seq(
      Future(save(cpFull, "cp", Seq("c"))),
      Future(save(Basket.cfNeighborsFrom(cpFull, maxDf, minShared, kNb),
        "nb", Seq("c_b"))),
      Future(save(cpTrain, "cptr", Seq("c"))),
      Future(save(Basket.cfNeighborsFrom(cpTrain, maxDf, minShared, kNb),
        "nbtr", Seq("c_b"))),
      Future(save(flagged.where(col("has_held") === 1)
        .select(col("c").as("custkey"), col("p").as("part_id")),
        "test", Seq("custkey"))))
    writes.foreach(Await.result(_, Duration.Inf))
  }

  // dir -> tag under computeIfAbsent: write-before-visible (see
  // AnnIndex.staged); one index build per (session, sf dir), shared
  // by all three family gates — whichever runs first pays the build
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensure(spark: SparkSession, dir: String): String =
    staged.computeIfAbsent(dir, { _ =>
      val tg = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
      writeIndex(spark, dir, tg)
      tg
    })

  /** Gate query: [[Basket.cfNeighbors]] through the persisted index —
    * a bucketed scan + the output ordering, no similarity compute.
    */
  def cfNeighbors(spark: SparkSession, dir: String): DataFrame = {
    val tag = ensure(spark, dir)
    spark.table(t("nb", tag))
      .select("c_a", "c_b", "shared", "score_ppm", "rank")
      .orderBy("c_a", "rank")
  }

  /** Gate query: [[Basket.recommendations]] probing the persisted
    * full-history neighbor + incidence tables. The candidate-expansion
    * join reads `cp` bucketed on its join key.
    */
  def recommendations(spark: SparkSession, dir: String,
                      topN: Int = 3): DataFrame = {
    val tag = ensure(spark, dir)
    Basket.recommendFrom(
      spark.table(t("nb", tag)).select("c_a", "c_b", "score_ppm"),
      spark.table(t("cp", tag)), topN)
  }

  /** Gate query: [[Basket.recEval]] probing the persisted TRAIN-split
    * tables — the offline-eval loop as production runs it: score the
    * nightly index against the held-out baskets, never rebuild the
    * graph inside the eval. Leakage-free by construction of `nbtr`
    * / `cptr` at write time.
    */
  def recEval(spark: SparkSession, dir: String, topN: Int = 3): DataFrame = {
    val tag = ensure(spark, dir)
    val recs = Basket.recommendFrom(
        spark.table(t("nbtr", tag)).select("c_a", "c_b", "score_ppm"),
        spark.table(t("cptr", tag)), topN)
      .select(col("custkey"), col("part_id"))
    Basket.recHitReport(recs, spark.table(t("test", tag)))
  }
}
