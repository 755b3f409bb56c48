package graft

import graft.operators.Basket

class BasketSpec extends SparkSpec {
  import spark.implicits._

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

  test("lDiversityProfile: distinct sensitive bands per class") {
    // class (0,A): balances 500 and 1500 -> 2 bands; class (1,B):
    // three members all in band 0 -> l = 1 (large but NOT diverse)
    val c = Seq(
      (1L, 0L, "A", 500.0), (2L, 0L, "A", 1500.0),
      (3L, 1L, "B", 10.0), (4L, 1L, "B", 20.0), (5L, 1L, "B", 999.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.operators.Basket.lDiversityProfile(c, l = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, 1L, true), (2L, 1L, false)))
  }

  test("binaryFile round-trip preserves bytes and ids") {
    val dir = graft.TempDirs.scratchString("graft_bin_spec_")
    val docs = Seq((3L, "hello world"), (12L, ""), (7L, "abc"))
    docs.foreach { case (id, t) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"doc_$id%09d.bin"),
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val got = spark.read.format("binaryFile").load(dir)
      .selectExpr("CAST(regexp_extract(path, 'doc_(\\\\d+)\\\\.bin', 1) AS LONG) AS doc_id",
        "length AS n_bytes", "md5(content) AS fp")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md5.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    // NB: the binaryFile source SKIPS zero-byte files — doc 12's empty
    // blob never appears (the sf fixtures have no empty docs, so the
    // driver gate is unaffected; a real lake must not encode "present
    // but empty" as an empty object)
    assert(got.toSeq == docs.filter(_._2.nonEmpty).sortBy(_._1)
      .map { case (id, t) =>
        (id, t.getBytes("UTF-8").length.toLong, hex(t)) })
  }

  test("patternMatch: non-overlapping cv*p matches in ts order") {
    val e = Seq(
      // user 1: c v v p  -> 1 match
      (1L, 1L, 0L, "click"), (2L, 1L, 1L, "view"), (3L, 1L, 2L, "view"),
      (4L, 1L, 3L, "purchase"),
      // user 2: c p c v p -> 2 non-overlapping matches
      (5L, 2L, 0L, "click"), (6L, 2L, 1L, "purchase"),
      (7L, 2L, 2L, "click"), (8L, 2L, 3L, "view"), (9L, 2L, 4L, "purchase"),
      // user 3: c v e p -> the error breaks the pattern, no match
      (10L, 3L, 0L, "click"), (11L, 3L, 1L, "view"), (12L, 3L, 2L, "error"),
      (13L, 3L, 3L, "purchase"),
      // user 4: p c -> wrong order, no match (also ts tie broken by id)
      (14L, 4L, 0L, "purchase"), (15L, 4L, 0L, "click"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
    val got = graft.operators.Basket.patternMatch(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("PERMISSIVE csv quarantines malformed rows without dropping fields") {
    val dir = graft.TempDirs.scratchString("graft_badcsv_spec_")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "feed.csv"),
      "1,10\nx2,20\n3,30\n".getBytes("UTF-8"))
    val df = spark.read
      .schema("doc_id LONG, n_chars LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
    val r = df.agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.col("_corrupt_record")),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("doc_id"))).collect().head
    // 3 rows in, 1 quarantined; the bad row's doc_id is null so the
    // good-row id sum needs no explicit filter
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 1L, 4L)))
  }

  test("cfNeighbors: integer cosine2 over the df-pruned purchase matrix") {
    // customers 1,2 share parts {10,20}; customer 3 shares only {10}
    // with them (below minShared); part 99 is bought by all four and
    // must be df-pruned out (maxDf = 3), or 3 would reach 2 shares
    val li = Seq(
      (100L, 10L), (100L, 20L), (100L, 99L),      // order of cust 1
      (200L, 10L), (200L, 20L), (200L, 99L),      // order of cust 2
      (300L, 10L), (300L, 99L),                   // order of cust 3
      (400L, 99L))                                // order of cust 4
      .toDF("l_orderkey", "l_partkey")
    val orders = Seq((100L, 1L), (200L, 2L), (300L, 3L), (400L, 4L))
      .toDF("o_orderkey", "o_custkey")
    val got = graft.operators.Basket
      .cfNeighbors(li, orders, maxDf = 3, minShared = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // pruned degrees: cust1 = {10,20} -> 2, cust2 -> 2, cust3 -> {10} -> 1
    // shared(1,2) = 2 -> score = 4*1e6 div 4 = 1000000
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 1000000L, 1L),
      (2L, 1L, 2L, 1000000L, 1L)))
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
