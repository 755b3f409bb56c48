package graft

import graft.operators.Basket

class BasketSpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: (Long, Long)*) =
    rows.toDF("l_orderkey", "l_partkey")

  test("partPairs: order-level support, unordered, line-repeat-proof") {
    // order 1: parts {10, 20, 30}; order 2: {10, 20} with part 10 on
    // TWO lines (must count once); order 3: {20} alone (no pair)
    val l = li((1L, 10L), (1L, 20L), (1L, 30L),
               (2L, 10L), (2L, 10L), (2L, 20L),
               (3L, 20L))
    val got = Basket.partPairs(l, minSupport = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (10L, 20L, 2L),           // in orders 1 and 2
      (10L, 30L, 1L), (20L, 30L, 1L)))
    // minSupport prunes the singletons
    assert(Basket.partPairs(l, minSupport = 2).count() == 1)
  }

  test("rulesLift: exact basis-point confidence and lift") {
    // 4 orders; {10,20} together in 2; item supports: 10 → 3, 20 → 2
    val l = li((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
               (3L, 10L), (4L, 40L), (1L, 40L))
    val got = Basket.rulesLift(l, minSupport = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .map { case (a, c, s, conf, lift) => ((a, c), (s, conf, lift)) }.toMap
    // conf(10→20) = 2/3 = 6666 bp; lift = 2·4/(3·2) = 13333 bp
    assert(got((10L, 20L)) == ((2L, 6666L, 13333L)))
    // conf(20→10) = 2/2 = 10000 bp; same lift (symmetric)
    assert(got((20L, 10L)) == ((2L, 10000L, 13333L)))
  }

  test("seqBigrams: distinct-user support over adjacent pairs") {
    val e = Seq(
      // user 1: a→b→a  (pairs ab, ba)
      (1L, 1L, 0L, "a"), (2L, 1L, 1L, "b"), (3L, 1L, 2L, "a"),
      // user 2: a→b→a→b (pair ab TWICE — still one user)
      (4L, 2L, 0L, "a"), (5L, 2L, 1L, "b"), (6L, 2L, 2L, "a"), (7L, 2L, 3L, "b"),
      // user 3: single event, no pair
      (8L, 3L, 0L, "a"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
    val got = Basket.seqBigrams(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 2L), ("b", "a", 2L)))
  }

  test("seqBigrams orders by ts then event_id within ties") {
    val e = Seq(
      (2L, 1L, 0L, "b"), (1L, 1L, 0L, "a"))   // same ts: event_id breaks tie
      .toDF("event_id", "user_id", "ts_ms", "event_type")
    val got = Basket.seqBigrams(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 1L)))
  }

  test("kAnonymityProfile: histogram with risky flag") {
    val c = Seq(
      (1L, "n1", "A"), (2L, "n2", "A"),            // class (1?,A)... see below
      (3L, "n3", "B"), (4L, "n4", "B"), (5L, "n5", "B"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
      .selectExpr("c_custkey", "CAST(c_custkey % 2 AS BIGINT) AS c_nationkey",
        "c_mktsegment")
    // classes: (1,A)=1, (0,A)=1, (1,B)=2, (0,B)=1 → sizes {1:3, 2:1}
    val got = Basket.kAnonymityProfile(c, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, 3L, true), (2L, 1L, false)))
  }
}
