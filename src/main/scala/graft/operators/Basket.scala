package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence mining and release-governance audits over the event and
  * customer tables. (Market-basket pair/rule mining lives in
  * [[Graph.copurchaseEdges]] / [[Graph.associationRules]].)
  */
object Basket {

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

  /** Right-to-be-forgotten cascade accounting — the GDPR/CCPA purge
    * planned as set arithmetic BEFORE any row is touched: a deletion
    * request set (modeled as custkey ≡ 0 mod 53) cascades customer →
    * orders → lineitem along the foreign keys, and the report prices
    * every table's delete volume plus the two POST-PURGE referential
    * integrity proofs (surviving orders with no surviving customer,
    * surviving lineitems with no surviving order — both must be 0 or
    * the cascade order was wrong). Scale shape: the request set
    * broadcasts (purge lists are small against a 100 TB fact table);
    * orders take one semi-join, lineitems one semi-join against the
    * purged-order keys; the orphan proofs are anti-joins on the same
    * keys — no fact-fact shuffle anywhere.
    */
  def purgeCascade(customer: DataFrame, orders: DataFrame,
                   lineitem: DataFrame, mod: Long = 53L): DataFrame = {
    val purgeCust = customer.where(col("c_custkey") % mod === 0)
      .select(col("c_custkey")).localCheckpoint(eager = false)
    val purgeOrders = orders.join(broadcast(purgeCust),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey")).localCheckpoint(eager = false)
    val keptCust = customer.join(broadcast(purgeCust),
      Seq("c_custkey"), "left_anti")
    val keptOrders = orders.join(broadcast(purgeCust),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .localCheckpoint(eager = false)
    val keptLi = lineitem.join(purgeOrders,
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    val counts = Seq(
      purgeCust.agg(count(lit(1)).as("n_cust_purged")),
      purgeOrders.agg(count(lit(1)).as("n_orders_purged")),
      lineitem.join(purgeOrders, col("l_orderkey") === col("o_orderkey"),
        "left_semi").agg(count(lit(1)).as("n_lineitems_purged")),
      keptCust.agg(count(lit(1)).as("n_cust_kept")),
      // integrity proofs over the SURVIVORS
      keptOrders.join(keptCust.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_orders")),
      keptLi.join(keptOrders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems")))
    counts.reduce(_ crossJoin _) // six single-row aggregates
  }

  /** Depth-3 sequential-pattern mining (the PrefixSpan support
    * semantics at fixed length): for every ordered type triple
    * a → b → c, the number of distinct users whose event stream
    * contains it as a SUBSEQUENCE (gaps allowed — the semantics
    * `events_seq_bigrams`' adjacent pairs cannot express; "view …
    * eventually error … eventually purchase" is a different cohort
    * from "view,error,purchase adjacent"). Existence is decided by
    * the greedy earliest-occurrence scan, join-relationally: pa =
    * first a-position, pb = first b-position after pa, then any
    * c-position after pb — three equi-joins ON user_id (one shuffle
    * key reused throughout; each join's fan-out is bounded by
    * |user's events| × |types|, never quadratic in events). Position
    * = row_number over (ts, id) so ties are deterministic in both
    * engines.
    */
  def seqPatterns3(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val pos = events
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
      .withColumn("p", row_number().over(byUser).cast("long"))
      .select(col("user_id"), col("event_type"), col("p"))
    val pa = pos.groupBy(col("user_id"), col("event_type").as("t1"))
      .agg(min("p").as("pa"))
    val pb = pa.join(pos, Seq("user_id"))
      .where(col("p") > col("pa"))
      .groupBy(col("user_id"), col("t1"), col("event_type").as("t2"))
      .agg(min("p").as("pb"))
    val hits = pb.join(pos, Seq("user_id"))
      .where(col("p") > col("pb"))
      .select(col("user_id"), col("t1"), col("t2"),
        col("event_type").as("t3"))
      .distinct()
    hits.groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("t1"), col("t2"), col("t3"))
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

  /** k-anonymity GENERALIZATION (the fix, where [[kAnonymityProfile]]
    * is the audit): widen the balance-cents quasi-identifier bin by
    * powers of two — bin = bal_c div (100·2^l) — and pick the SMALLEST
    * level whose minimum equivalence class reaches `k`. Emits one row:
    * (level, bin_width_cents, n_groups, min_group, n_rows). The ladder
    * is evaluated in ONE pass (rows × levels explode → two hash
    * aggregates); state is bounded by Σ per-level group counts, never
    * the row count, and truncating `div` bins identically in both
    * engines (negative balances included).
    *
    * Contract when NO level ≤ maxLevel reaches k (k > row count, very
    * long-tailed balances): falls back to the maxLevel row rather than
    * silently returning an empty frame — exactly one row always comes
    * back, and "achieved" is `min_group >= k` on it (a privacy fix
    * whose empty output reads as "nothing to generalize" is a trap).
    */
  def kAnonymityGeneralize(customer: DataFrame, k: Int = 10,
                           maxLevel: Int = 12): DataFrame = {
    val lv = customer
      .select(expr("cast(round(c_acctbal * 100) AS bigint)").as("bal_c"))
      .select(explode(expr(s"sequence(0, $maxLevel)")).as("l"), col("bal_c"))
      .select(col("l"), expr("bal_c div (100 * shiftleft(1L, l))").as("bin"))
    val st = lv.groupBy("l", "bin").agg(count(lit(1)).as("n"))
      .groupBy("l")
      .agg(count(lit(1)).as("n_groups"), min("n").as("min_group"))
    val chosen = st
      .agg(coalesce(min(when(col("min_group") >= k, col("l"))),
        lit(maxLevel)).as("level"))
    val nRows = customer.agg(count(lit(1)).as("n_rows"))
    chosen.join(st, chosen("level") === st("l"))
      .crossJoin(broadcast(nRows))
      .select(col("level").cast("long").as("level"),
        expr("100 * shiftleft(1L, level)").as("bin_width_cents"),
        col("n_groups"), col("min_group"), col("n_rows"))
  }

  /** Item-based collaborative-filtering neighbors: for each customer,
    * the top-k most similar customers by squared cosine over the
    * df-pruned customer×part purchase matrix, in exact scaled
    * integers: score = shared²·10⁶ div (deg_a·deg_b).
    *
    * Scale shape — the sparse-similarity playbook composed end to end:
    *  - the bipartite incidence (customer, part) is DISTINCT-projected
    *    once (one shuffle);
    *  - parts with df > maxDf are dropped BEFORE the self-join (the
    *    "everyone buys it" items carry no similarity signal and are
    *    exactly the quadratic blowup — same pruning contract as
    *    sparseDotPairs), bounding candidates by Σ df² over kept parts;
    *  - degrees are computed over the SAME pruned matrix so
    *    shared ≤ min(deg) holds and the score is well-defined;
    *  - ranking is the bounded-heap [[graft.plans.TopK.perKey]] —
    *    ≤ k rows per (customer, partition) ever shuffle, not the
    *    full pair list through a window sort.
    */
  def cfNeighbors(lineitem: DataFrame, orders: DataFrame,
                  maxDf: Int = 30, minShared: Int = 2,
                  k: Int = 3): DataFrame =
    cfNeighborsFrom(lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct(), maxDf, minShared, k)
      .orderBy("c_a", "rank")

  /** [[cfNeighbors]] from an already-materialized incidence `(c, p)`,
    * WITHOUT the presentation sort — the index build
    * ([[graft.sources.CfIndex]]) derives full- and train-split
    * incidences from ONE lineitem⋈orders pass, feeds each to both its
    * table write and its neighbor build (so the big join never runs
    * twice per split), and writes bucketed tables where a global range
    * exchange before the write would be pure waste.
    */
  def cfNeighborsFrom(cp: DataFrame, maxDf: Int = 30, minShared: Int = 2,
                      k: Int = 3): DataFrame = {
    val kept = cfPruned(cp, maxDf)
    cfRankFrom(cfSharedUpper(kept),
      kept.groupBy("c").agg(count(lit(1)).as("deg")), minShared, k)
  }

  /** The df-pruned incidence: drop parts with document frequency >
    * maxDf BEFORE any pairing (the "everyone buys it" quadratic
    * guard). Factored out so the incremental index maintains the SAME
    * pruned universe ([[graft.sources.CfIndex]]).
    */
  def cfPruned(cp: DataFrame, maxDf: Int): DataFrame =
    cp.join(
      cp.groupBy("p").agg(count(lit(1)).as("d")).where(col("d") <= maxDf)
        .select("p"),
      "p")

  /** UPPER-TRIANGLE shared counts over a pruned incidence, WITHOUT the
    * minShared threshold — shared ≥ 1. This is the mergeable state of
    * the CF graph: a pair at shared = 1 can cross the threshold when a
    * delta lands, so the persisted incremental index must keep the
    * pre-threshold counts ([[graft.sources.CfIndex.writeBaseIndex]]);
    * the query-time threshold lives in [[cfRankFrom]].
    */
  def cfSharedUpper(kept: DataFrame): DataFrame = {
    val left = kept.select(col("p"), col("c").as("c_a"))
    val right = kept.select(col("p"), col("c").as("c_b"))
    // shared counts are symmetric — enumerate only the upper triangle
    // (halving the dominant self-join + partial-agg volume) and mirror
    // the far-smaller aggregated pair list afterwards
    left.join(right, "p")
      .where(col("c_a") < col("c_b"))
      .groupBy("c_a", "c_b")
      .agg(count(lit(1)).as("shared"))
  }

  /** Threshold, mirror, score and rank an upper-triangle shared table
    * against a degree table — the presentation half of the CF build,
    * shared verbatim by the full recompute, the persisted-index write,
    * and the incremental re-rank (which feeds it only the TOUCHED
    * customers' pairs).
    */
  def cfRankFrom(sharedUpper: DataFrame, deg: DataFrame,
                 minShared: Int, k: Int): DataFrame =
    cfScoreRank(cfMirrored(sharedUpper, minShared), deg, k)

  /** Threshold an upper-triangle shared table and mirror it to both
    * directions — the symmetric pair list ranking consumes.
    */
  def cfMirrored(sharedUpper: DataFrame, minShared: Int): DataFrame = {
    val upper = sharedUpper.where(col("shared") >= minShared)
    upper.union(upper.select(col("c_b").as("c_a"),
      col("c_a").as("c_b"), col("shared")))
  }

  /** Score a mirrored pair list against a degree table and rank top-k
    * per c_a. The incremental path feeds this ONLY the touched
    * customers' (complete) pair groups; full builds feed every group.
    */
  def cfScoreRank(shared: DataFrame, deg: DataFrame, k: Int): DataFrame = {
    val scored = shared
      .join(deg.select(col("c").as("c_a"), col("deg").as("deg_a")), "c_a")
      .join(deg.select(col("c").as("c_b"), col("deg").as("deg_b")), "c_b")
      .select(col("c_a"), col("c_b"), col("shared"),
        expr("shared * shared * 1000000 div (deg_a * deg_b)").as("score_ppm"))
    graft.plans.TopK.perKey(scored, Seq("c_a"),
        Seq(("score_ppm", true), ("c_b", false)), k, "rank")
      .select(col("c_a"), col("c_b"), col("shared"), col("score_ppm"),
        col("rank"))
  }

  /** Top-N part recommendations from the [[cfNeighbors]] similarity
    * graph — the rec-pipeline capstone: each customer's candidates are
    * the parts their top-k neighbors own, scored by the SUM of the
    * recommending neighbors' similarity (integer ppm, so the fold is
    * order-free), with the customer's OWN parts removed by a hash
    * anti-join; ties break by vote count then part id. Ranking is the
    * bounded-heap [[graft.plans.TopK.perKey]] — ≤ topN rows per
    * (customer, partition) shuffle, never a global sort.
    *
    * Candidate volume is neighbors × their baskets (k-bounded per
    * customer), not customers × parts.
    */
  def recommendations(lineitem: DataFrame, orders: DataFrame,
                      maxDf: Int = 30, minShared: Int = 2,
                      kNb: Int = 3, topN: Int = 3): DataFrame = {
    val cp = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct().localCheckpoint()
    val nb = cfNeighborsFrom(cp, maxDf, minShared, kNb)
      .select("c_a", "c_b", "score_ppm")
    recommendFrom(nb, cp, topN)
  }

  /** The probe half of [[recommendations]], factored out so the
    * persisted-index path ([[graft.sources.CfIndex]]) and the
    * recompute path share ONE implementation: given a neighbor table
    * `(c_a, c_b, score_ppm)` and the incidence `(c, p)`, expand
    * candidates through neighbors' baskets, remove owned parts, rank.
    * This is all a nightly-built recommender pays per serving run.
    */
  def recommendFrom(nb: DataFrame, cp: DataFrame,
                    topN: Int = 3): DataFrame = {
    val cand = nb.join(cp.select(col("c").as("c_b"), col("p")), "c_b")
      .groupBy("c_a", "p")
      .agg(sum("score_ppm").as("rec_score"), count(lit(1)).as("n_votes"))
    val fresh = cand.join(cp.select(col("c").as("c_a"), col("p")),
      Seq("c_a", "p"), "left_anti")
    graft.plans.TopK.perKey(fresh, Seq("c_a"),
        Seq(("rec_score", true), ("n_votes", true), ("p", false)),
        topN, "rank")
      .select(col("c_a").as("custkey"), col("p").as("part_id"),
        col("rec_score"), col("n_votes"), col("rank"))
      .orderBy("custkey", "rank")
  }

  /** Leave-latest-order-out evaluation of the CF recommender — the
    * offline eval loop every production recsys runs before shipping a
    * model change: each customer's LATEST order (by date, orderkey
    * tiebreak) is held out, [[recommendations]] runs on the remaining
    * history only, and a recommendation scores a hit when the held-out
    * basket contains it. One summary row: rec/hit counts, user
    * coverage, and hit-rate / user-hit-rate in exact ppm.
    *
    * Scale shape: the split is one window over orders (customer-keyed)
    * + one anti-join — the expensive part IS the recommender, which
    * keeps its own bounded-candidate contract; the eval adds one
    * (custkey, part) hash join against held-out baskets. Leakage-free
    * by construction: train rows are the anti-join complement of the
    * held-out order keys, so no feature of the test basket can reach
    * the similarity graph.
    */
  def recEval(lineitem: DataFrame, orders: DataFrame, maxDf: Int = 30,
              minShared: Int = 2, kNb: Int = 3, topN: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val lo = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey").as("last_c"), col("o_orderkey").as("last_ok"))
    // the split subtree (window + anti-join) feeds cp builds inside
    // BOTH recommendations() and its cfNeighbors() — checkpoint the
    // orders-sized result once instead of re-running the window per
    // consumer (measured 9.5 -> ~7 s at sf0.1)
    val trainOrders = orders.join(
        lo.select(col("last_ok").as("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .localCheckpoint()
    val recs = recommendations(lineitem, trainOrders, maxDf, minShared,
        kNb, topN)
      .select(col("custkey"), col("part_id"))
    val test = lineitem.join(lo, col("l_orderkey") === col("last_ok"))
      .select(col("last_c").as("custkey"), col("l_partkey").as("part_id"))
      .distinct()
    recHitReport(recs, test)
  }

  /** The scoring half of [[recEval]], shared with the persisted-index
    * path: recommendations `(custkey, part_id)` vs held-out baskets
    * `(custkey, part_id)` → one summary row of hit-rate / coverage
    * ppm. One hash join + one global aggregate.
    */
  def recHitReport(recs: DataFrame, test: DataFrame): DataFrame =
    recs.join(test.withColumn("hit", lit(1L)), Seq("custkey", "part_id"), "left")
      .agg(count(lit(1)).as("n_recs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        countDistinct(col("custkey")).as("n_users"),
        countDistinct(when(col("hit") === 1L, col("custkey"))).as("users_hit"))
      .select(col("n_recs"), col("n_hits"), col("n_users"), col("users_hit"),
        expr("n_hits * 1000000 div greatest(1L, n_recs)").as("hit_ppm"),
        expr("users_hit * 1000000 div greatest(1L, n_users)").as("user_hit_ppm"))

  /** MATCH_RECOGNIZE-lite sequence pattern matching: each user's
    * event stream (ordered by ts, event_id) is rendered as a string of
    * type initials (c/v/p/s/e — distinct across the schema's types)
    * and scanned with a regex; a row per user with ≥ 1 non-overlapping
    * match. The default 'cv*p' is "click, any views, then purchase" —
    * the conversion-path shape SQL engines need MATCH_RECOGNIZE for.
    *
    * Scale: one shuffle on user_id; the per-user sequence is
    * calendar/activity-bounded (the [[Relational.eventsEwma]]
    * contract), and the regex runs once per user inside codegen.
    * Non-overlapping leftmost-match counting agrees between Java
    * regex and RE2 for patterns without alternation-order traps, so
    * the DuckDB oracle is exact.
    */
  def patternMatch(events: DataFrame, pattern: String = "cv*p"): DataFrame =
    events
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        substring(col("event_type"), 1, 1).as("initial"))
      .groupBy("user_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("ts_ms"), col("event_id"),
          col("initial")))),
        x => x.getField("initial"))).as("seq"))
      .select(col("user_id"),
        regexp_count(col("seq"), lit(pattern)).cast("long").as("n_matches"))
      .where(col("n_matches") > 0)
      .orderBy("user_id")

  /** l-diversity audit, the sibling check to [[kAnonymityProfile]]:
    * within each quasi-identifier class, how many DISTINCT values of
    * the sensitive attribute (account balance in exact-cent bands of
    * 1000 currency units) appear — a class can be large (k-anonymous)
    * yet leak because everyone in it shares one sensitive value.
    * Output: the distinct-count histogram with `risky = l < threshold`.
    * Fused distinct-aggregate on (QI, band), then a QI-cardinality-
    * bounded rollup — row count never exceeds QI classes at any scale.
    */
  def lDiversityProfile(customer: DataFrame, l: Int = 3): DataFrame =
    customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(countDistinct(col("band")).as("l_distinct"))
      .groupBy(col("l_distinct"))
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("risky", col("l_distinct") < l)
      .orderBy("l_distinct")

  /** Frequent 3-itemsets over order baskets with the Apriori item-level
    * prune: only items whose own support clears `minSup` enter the
    * candidate joins (a subset of a frequent triple is frequent, so
    * pruning first is LOSSLESS). Two self-joins on the order key with
    * `p1 < p2 < p3` canonical ordering, support filter, top-k.
    *
    * Scale shape: the prune is what tames the blow-up — candidate
    * triples are Σ_basket C(freq_items_in_basket, 3), not C(all, 3);
    * at 100 TB raise `minSup` with the data (support thresholds are
    * relative in any real FIM run) and the frequent-item set SHRINKS as
    * the bar rises. Joins are order-key-hashed (baskets co-locate);
    * nothing driver-sized anywhere.
    */
  def itemsets3(lineitem: DataFrame, minSup: Long = 2L,
                k: Int = 20): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("p"))
      .distinct()
    val freq = items.groupBy("p").agg(count(lit(1)).as("isup"))
      .where(col("isup") >= minSup).select("p")
    val fi = items.join(freq, "p").localCheckpoint()
    fi.select(col("oid"), col("p").as("p1"))
      .join(fi.select(col("oid"), col("p").as("p2")), "oid")
      .where(col("p1") < col("p2"))
      .join(fi.select(col("oid"), col("p").as("p3")), "oid")
      .where(col("p2") < col("p3"))
      .groupBy("p1", "p2", "p3").agg(count(lit(1)).as("support"))
      .where(col("support") >= minSup)
      .orderBy(col("support").desc, col("p1"), col("p2"), col("p3"))
      .limit(k)
  }

  /** t-closeness audit, the third rung after [[kAnonymityProfile]] /
    * [[lDiversityProfile]]: per quasi-identifier class, the Earth
    * Mover's Distance between the class's sensitive-value distribution
    * (account balance in 1000-unit bands, an ORDERED attribute) and
    * the global one — a class can be large and diverse yet still leak
    * because its distribution is skewed. For ordered values,
    * EMD = Σᵢ |cum_pᵢ − cum_qᵢ| / (m−1) over the m bands.
    *
    * Exact integers throughout: the cumulative difference is kept in
    * the common denominator `class_n · total_n`
    * (`Dᵢ = cumᵢ·total_n − gcumᵢ·class_n`) and only the final EMD is
    * truncated to ppm. Validity window: |D| ≤ class_n·total_n, and the
    * ppm rescale multiplies by 10⁶ — exact to ~10⁶ rows per class ×
    * ~10¹¹ total; at larger corpora drop the scale to per-mille.
    *
    * Scale shape: one (QI, band) aggregate, one band-sized global
    * aggregate, then everything is (QI classes × m) — grid-sized, not
    * row-sized; the cumulative windows run over that grid.
    */
  def tClosenessProfile(customer: DataFrame, tPpm: Long = 250000L)
      : DataFrame = {
    val banded = customer.select(col("c_nationkey"), col("c_mktsegment"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("band"))
    val classBand = banded.groupBy("c_nationkey", "c_mktsegment", "band")
      .agg(count(lit(1)).as("cnt"))
    val globalBand = classBand.groupBy("band").agg(sum("cnt").as("gcnt"))
    val classes = classBand.groupBy("c_nationkey", "c_mktsegment")
      .agg(sum("cnt").as("class_n"))
    // dense (class × band) grid so missing bands still accumulate
    val grid = classes.crossJoin(broadcast(globalBand))
      .join(classBand, Seq("c_nationkey", "c_mktsegment", "band"), "left")
      .na.fill(0L, Seq("cnt"))
    val wCum = Window.partitionBy("c_nationkey", "c_mktsegment")
      .orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    grid
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("gcum", sum("gcnt").over(wCum))
      .crossJoin(broadcast(globalBand.agg(
        sum("gcnt").as("total_n"), count(lit(1)).as("m"))))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("class_n"))
      .agg(expr(
        """sum(abs(cum * total_n - gcum * class_n)) * 1000000L
          |  div (max(class_n) * max(total_n) * (max(m) - 1))"""
          .stripMargin).as("emd_ppm"))
      .withColumn("risky", col("emd_ppm") > tPpm)
      .orderBy("c_nationkey", "c_mktsegment")
  }
}
