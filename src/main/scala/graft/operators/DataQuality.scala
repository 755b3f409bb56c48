package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (Deequ-style constraint checking) —
  * the validation pass a corpus/warehouse ingest runs before anything
  * downstream trusts the data. One result row per declared constraint:
  * `(check_id, n_rows, n_bad)`, where `n_bad` is the number of
  * violating rows (0 = constraint holds).
  *
  * Reference scope: the reference engine validates nothing — this is
  * part of the pipeline-completeness surface around it (cf.
  * `sendFileByFile.cpp:1` reading its inputs unchecked).
  *
  * Scale shape, by check class:
  *  - completeness / domain / bounds: ONE full scan per table,
  *    all checks on that table fused into a single conditional
  *    aggregation (no shuffle — partial aggs combine map-side to one
  *    row). Adding a check to a table adds a column, not a scan.
  *  - key uniqueness: `count(*) − count(DISTINCT key)` — one hash
  *    shuffle on the key, fused into the same scan's aggregate (Spark
  *    plans distinct-aggregate via expand + two-phase hash agg).
  *  - referential integrity: LEFT ANTI join child→parent on the key —
  *    broadcast when the parent fits (nation/region), shuffle-hash
  *    otherwise; orphan count only, no child payload moves.
  *  - cross-table predicates (ship_after_order): an equi-join on the
  *    shared key with the violation predicate evaluated post-join;
  *    co-partitioning/bucketing both fact tables on the key makes
  *    this exchange-free at 100 TB (see `bucketed_join_revenue`).
  *
  * The audit result is O(#checks) rows regardless of input size.
  */
object DataQuality {

  def audit(customer: DataFrame, orders: DataFrame,
            lineitem: DataFrame): DataFrame = {
    // customer: one scan → uniqueness + non-negativity + completeness
    val cust = customer.agg(
        count(lit(1)).as("n"),
        countDistinct(col("c_custkey")).as("nd"),
        sum(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as("neg_bal"),
        sum(when(col("c_name").isNull, 1L).otherwise(0L)).as("null_name"))
      .select(col("n").as("n_rows"), expr(
        """stack(3,
          |  'customer.key_unique',    n - nd,
          |  'customer.acctbal_nonneg', neg_bal,
          |  'customer.name_complete', null_name) AS (check_id, n_bad)
          |""".stripMargin))

    // orders: one scan → uniqueness + accepted-value domain
    val ord = orders.agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("nd"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L)
          .otherwise(0L)).as("bad_status"))
      .select(col("n").as("n_rows"), expr(
        """stack(2,
          |  'orders.key_unique',    n - nd,
          |  'orders.status_domain', bad_status) AS (check_id, n_bad)
          |""".stripMargin))

    // lineitem: one scan → bounds + domain
    val li = lineitem.agg(
        count(lit(1)).as("n"),
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L))
          .as("bad_qty"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
          .otherwise(0L)).as("bad_flag"))
      .select(col("n").as("n_rows"), expr(
        """stack(2,
          |  'lineitem.qty_bounds',        bad_qty,
          |  'lineitem.returnflag_domain', bad_flag) AS (check_id, n_bad)
          |""".stripMargin))

    // referential integrity: orphan children (LEFT ANTI on the key)
    def fk(name: String, child: DataFrame, childKey: String,
           parent: DataFrame, parentKey: String): DataFrame = {
      val orphans = child.select(col(childKey))
        .join(parent.select(col(parentKey)),
          col(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as("n_bad"))
      child.agg(count(lit(1)).as("n_rows")).crossJoin(orphans)
        .select(lit(name).as("check_id"), col("n_rows"), col("n_bad"))
    }
    val fkOrders   = fk("orders.fk_customer", orders, "o_custkey",
      customer, "c_custkey")
    val fkLineitem = fk("lineitem.fk_orders", lineitem, "l_orderkey",
      orders, "o_orderkey")

    // cross-table predicate: a lineitem must not ship before its order
    val shipAfter = lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("l_shipdate") < col("o_orderdate"), 1L)
          .otherwise(0L)).as("n_bad"))
      .select(lit("lineitem.ship_after_order").as("check_id"),
        col("n_rows"), col("n_bad"))

    cust.select("check_id", "n_rows", "n_bad")
      .unionByName(ord.select("check_id", "n_rows", "n_bad"))
      .unionByName(li.select("check_id", "n_rows", "n_bad"))
      .unionByName(fkOrders)
      .unionByName(fkLineitem)
      .unionByName(shipAfter)
      .orderBy("check_id")
  }

  /** Join-key skew profile: per candidate key column, the shape of its
    * per-key row-count distribution — key cardinality, max multiplicity,
    * the heaviest key's row share (ppm, integer), and interpolated
    * p50/p99 multiplicities (`percentile` == DuckDB `quantile_cont`
    * bit-exactly on integer inputs).
    *
    * This is the diagnostic run BEFORE choosing a join strategy at
    * 100 TB: max_cnt ≫ p99_cnt says salting / AQE skew-join, a tiny
    * n_keys says broadcast the other side, top_share_ppm bounds the
    * single-hottest-partition fraction. Cost per column is exactly one
    * hash shuffle on that key — the same exchange the join itself
    * would pay — and each profile aggregates to ONE row, so profiling
    * is strictly cheaper than one bad join. The per-key percentile
    * buffer is O(n_keys) on a single reducer here; at extreme key
    * cardinality swap in the KLL sketch (`valueQuantilesSketch`
    * pattern) — max/share/cardinality stay exact either way.
    */
  def skewProfile(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty,
      "skewProfile needs at least one key column to profile")
    keys.map { kc =>
      df.groupBy(col(kc).as("k")).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"),
          max("cnt").as("max_cnt"),
          expr("percentile(cnt, array(0.5D, 0.99D))").as("qs"))
        .select(lit(kc).as("key_col"), col("n_keys"), col("n_rows"),
          col("max_cnt"),
          expr("max_cnt * 1000000 div n_rows").as("top_share_ppm"),
          col("qs")(0).as("p50_cnt"), col("qs")(1).as("p99_cnt"))
    }.reduce(_ unionByName _).orderBy("key_col")
  }

  /** Functional-dependency / key-candidate profile: for each declared
    * `lhs → rhs` pair, how many distinct lhs values exist, how many map
    * to MORE than one rhs (FD violations; 0 = the dependency holds,
    * i.e. lhs is a key for rhs), and the worst fan-out. The
    * schema-inference pass a profiler runs before trusting a join key
    * or a dimension hierarchy. One distinct-aggregate shuffle per
    * checked pair, constant-size output.
    */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty,
      "fdProfile needs at least one (lhs, rhs) dependency to check")
    pairs.map { case (lhs, rhs) =>
      df.groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("n_rhs"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("n_rhs").as("max_fanout"))
        .select(lit(s"$lhs->$rhs").as("fd"), col("n_lhs"),
          col("n_violating"), col("max_fanout"))
    }.reduce(_ unionByName _).orderBy("fd")
  }

  /** Order-independent per-source table fingerprint: row count, id
    * range, and the XOR of a 60-bit content hash over (doc_id, text) —
    * the cheap "did replication/compaction/migration preserve the
    * table" integrity check. XOR is commutative and associative, so
    * the checksum is identical no matter how rows are partitioned or
    * which executor folds them — one map-side-combining shuffle on
    * source, constant state per partition, valid at any scale.
    *
    * NULL-proof: a NULL doc_id/text hashes through a `chr(1)` sentinel
    * (a plain concat would go NULL and bit_xor would silently SKIP the
    * row — null-corruption invisible to an integrity check), and
    * `null_rows` counts them outright, so even a sentinel collision
    * ('' literally in the text) cannot hide a nulled-out row.
    */
  def tableChecksum(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("doc_id"),
        when(col("doc_id").isNull || col("text").isNull, 1L).otherwise(0L)
          .as("isnull"),
        expr("cast(conv(substr(md5(concat(coalesce(cast(doc_id AS string), chr(1)), ':', coalesce(text, chr(1)))), 1, 15), 16, 10) AS bigint)")
          .as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows"), sum("isnull").as("null_rows"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"),
        expr("bit_xor(h)").as("checksum"))
      .orderBy("source")

  /** Join-size estimation from Count-Min sketch inner products
    * (Cormode–Muthukrishnan) — the optimizer-statistics question
    * "how big would the self-join on this key be?" answered WITHOUT
    * running the join: |R ⋈ R| on a key = Σ_k c(k)², and the CMS
    * estimate is min over d independent hash rows of Σ_b cnt[i][b]²
    * (each row is an upward-biased estimate — colliding keys only ADD
    * cross terms — so est ≥ exact always, and the min tightens it).
    * Hash row i uses the dual-engine md5 of `i:key`, so the oracle
    * replays the sketch bit-for-bit; the exact Σc² sits beside it as
    * the measured-error contract. Scale shape: the sketch side
    * shuffles d·w counters (a few KB) no matter the table size —
    * at 100 TB this is how a planner prices a fact-fact join before
    * committing to it; the exact side is the eval-only cost. Width is
    * sized from the estimator's error term: each row overestimates by
    * ≈ N²/w in expectation, so w must be ≳ N²/Σc² for the answer to
    * be usable — 1024 buckets read 19× over at sf0.1 (measured),
    * 65536 brings the collision term under the true Σc².
    */
  def joinCardEstimate(lineitem: DataFrame, d: Int = 4,
                       w: Int = 65536): DataFrame = {
    // fillCores (r16): the sketch side runs d md5 hashes per row — the
    // heaviest per-row kernel of the dq family — and lineitem fits one
    // scan split, so it serialized on one core (12 tasks total;
    // measured 2.23 → see OPTIMIZATION_r16). Identity at real scale.
    val keys = graft.operators.WordCount.fillCores(
      lineitem.select(col("l_partkey").cast("string").as("k")), "k")
    val buckets = keys.select(posexplode(array((0 until d).map(i =>
        expr(s"cast(conv(substr(md5(concat('$i:', k)), 1, 15), 16, 10) AS bigint) % $w")): _*)))
      .toDF("i", "bucket")
    val est = buckets.groupBy("i", "bucket").agg(count(lit(1)).as("c"))
      .groupBy("i").agg(sum(expr("c * c")).as("est"))
      .agg(min("est").as("est_pairs"))
    val exact = lineitem.groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * c")).as("exact_pairs"))
    exact.crossJoin(est) // two single-row aggregates
      .select(col("exact_pairs"), col("est_pairs"),
        expr("(est_pairs - exact_pairs) * 1000000 div exact_pairs")
          .as("overest_ppm"),
        lit(d.toLong).as("d"), lit(w.toLong).as("w"))
  }
}
