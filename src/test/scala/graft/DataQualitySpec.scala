package graft

import graft.operators.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("audit counts each planted violation under its own check") {
    val customer = Seq(
      (1L, "alice", 100.0), (2L, "bob", -5.0),      // neg acctbal
      (2L, null.asInstanceOf[String], 0.0))          // dup key + null name
      .toDF("c_custkey", "c_name", "c_acctbal")
    val orders = Seq(
      (10L, 1L, "O", "1998-01-10"),
      (11L, 2L, "X", "1998-01-11"),                  // bad status
      (12L, 99L, "F", "1998-01-12"))                 // orphan custkey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
    val lineitem = Seq(
      (10L, 5.0, "A", "1998-01-15"),
      (10L, 99.0, "N", "1998-01-05"),                // qty bound + early ship
      (77L, 1.0, "Z", "1998-01-20"))                 // orphan order + bad flag
      .toDF("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")

    val got = DataQuality.audit(customer, orders, lineitem).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got("customer.key_unique") == ((3L, 1L)))
    assert(got("customer.acctbal_nonneg") == ((3L, 1L)))
    assert(got("customer.name_complete") == ((3L, 1L)))
    assert(got("orders.key_unique") == ((3L, 0L)))
    assert(got("orders.status_domain") == ((3L, 1L)))
    assert(got("orders.fk_customer") == ((3L, 1L)))
    assert(got("lineitem.qty_bounds") == ((3L, 1L)))
    assert(got("lineitem.returnflag_domain") == ((3L, 1L)))
    assert(got("lineitem.fk_orders") == ((3L, 1L)))
    // ship_after_order is over the JOIN (the orphan lineitem drops out)
    assert(got("lineitem.ship_after_order") == ((2L, 1L)))
    assert(got.size == 10)
  }

  test("skewProfile: cardinality, max multiplicity, share, quantiles") {
    // key a: 4 rows, b: 1, c: 1 -> counts [1, 1, 4]
    val df = Seq("a", "a", "a", "a", "b", "c").toDF("k1")
    val got = DataQuality.skewProfile(df, Seq("k1")).collect().head
    assert(got.getString(0) == "k1")
    assert(got.getLong(1) == 3L)         // n_keys
    assert(got.getLong(2) == 6L)         // n_rows
    assert(got.getLong(3) == 4L)         // max_cnt
    assert(got.getLong(4) == 666666L)    // 4e6 div 6
    assert(got.getDouble(5) == 1.0)      // p50 of [1,1,4]
    // p99: pos = 0.99·(3−1) = 1.98 -> 1 + 0.98·(4−1)
    assert(math.abs(got.getDouble(6) - (1.0 + 0.98 * 3.0)) < 1e-12)
  }

  test("audit is all-zero-violations on a consistent mini-warehouse") {
    val customer = Seq((1L, "a", 1.0)).toDF("c_custkey", "c_name", "c_acctbal")
    val orders = Seq((10L, 1L, "O", "1998-01-10"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
    val lineitem = Seq((10L, 5.0, "A", "1998-01-15"))
      .toDF("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    val got = DataQuality.audit(customer, orders, lineitem).collect()
    assert(got.length == 10 && got.forall(_.getLong(2) == 0L))
  }
}
