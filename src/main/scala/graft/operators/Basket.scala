package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket mining and sequence mining over the order/event
  * fact tables — the co-occurrence analytics a recommendation or
  * curriculum pipeline runs over 100 TB of interaction logs.
  *
  * Scale posture: the pair generator is a within-basket self-join —
  * one shuffle on the basket key, candidate volume Σ |basket|²
  * (baskets are bounded: TPC-H orders have ≤ 7 lines), never a
  * cross-basket product. Supports/lift stay in exact BIGINT
  * (scaled integer division) so the oracle compare is bit-stable.
  */
object Basket {

  /** Distinct parts per order (a part can repeat across lines). */
  private def orderParts(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()

  /** Co-ordered part pairs with order-level support.
    *
    * One shuffle on l_orderkey co-locates each basket; the a<b join
    * emits each unordered pair once. At 100 TB the candidate count is
    * Σ |basket|·(|basket|−1)/2 — linear in data for bounded baskets.
    */
  def partPairs(lineitem: DataFrame, minSupport: Int = 2): DataFrame =
    orderParts(lineitem).as("a")
      .join(orderParts(lineitem).as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
      .orderBy(col("support").desc, col("part_a"), col("part_b"))

  /** Association rules a→b from the co-occurrence pairs: confidence
    * and lift in exact scaled-integer basis points.
    *
    *   conf_bp = ⌊support(a,b)·10000 / support(a)⌋
    *   lift_bp = ⌊support(a,b)·n_orders·10000 / (support(a)·support(b))⌋
    *
    * Item supports are a second aggregate over the SAME distinct
    * (order, part) projection; both sides of each rule join against
    * the item-support table, which is orders-of-magnitude smaller
    * than the pair table → broadcast. The 1-row basket count is a
    * cross-join broadcast literal.
    */
  def rulesLift(lineitem: DataFrame, minSupport: Int = 2): DataFrame = {
    val op = orderParts(lineitem)
    val itemSupport = op.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("item_support"))
    val nOrders = op.select(countDistinct("l_orderkey").as("n_orders"))
    // each unordered pair yields two directed rules a→b and b→a
    val pairs = partPairs(lineitem, minSupport)
    val directed = pairs.select(col("part_a").as("ante"), col("part_b").as("cons"), col("support"))
      .unionAll(pairs.select(col("part_b").as("ante"), col("part_a").as("cons"), col("support")))
    directed
      .join(broadcast(itemSupport.withColumnRenamed("item_support", "ante_support")),
        col("ante") === col("pk")).drop("pk")
      .join(broadcast(itemSupport.withColumnRenamed("item_support", "cons_support")),
        col("cons") === col("pk")).drop("pk")
      .crossJoin(broadcast(nOrders))
      // `div` keeps the whole computation in exact BIGINT arithmetic
      // (a double-typed `/` would round before the floor)
      .selectExpr("ante", "cons", "support",
        "support * 10000 div ante_support AS conf_bp",
        "support * n_orders * 10000 div (ante_support * cons_support) AS lift_bp")
      .orderBy(col("conf_bp").desc, col("ante"), col("cons"))
  }

  /** Frequent consecutive event-type pairs per user (PrefixSpan depth
    * 1): sequence support = number of DISTINCT users whose event
    * stream (ordered by ts, event_id) contains the adjacent pair.
    *
    * lag() needs one shuffle on user_id; the distinct-user support is
    * a partial-aggregated count over (pair, user). No windows over
    * the global stream, no per-user collect.
    */
  def seqBigrams(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .where(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type"), col("user_id")).distinct()
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("prev_type"), col("event_type"))
  }

  /** k-anonymity audit over the quasi-identifier (nation, segment):
    * the equivalence-class-size histogram with a `risky` flag for
    * classes below k — the release-readiness profile (a bare
    * "classes < k" listing is vacuous once every class is large).
    * Two cheap hash aggregates: QI tuple → class size → histogram;
    * at 100 TB the QI cardinality, not the row count, bounds state.
    */
  def kAnonymityProfile(customer: DataFrame, k: Int = 5): DataFrame =
    customer
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("risky", col("class_size") < k)
      .orderBy("class_size")
}
