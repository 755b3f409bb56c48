package graft

import graft.operators.Dedup

/** Prefix-filtered (PPJoin-style) Jaccard self-join: lossless vs the
  * brute inverted-index join, with provably fewer candidates.
  */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("prefixFilterPairs equals brute jaccardPairs") {
    val d = docs(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j k"),   // near-dup of 1
      (3L, "a b c q r s t u v w"),     // shares a prefix region only
      (4L, "m n o p q r s t u v"),
      (5L, "a b c d e f g h i j"))     // exact dup of 1
    val brute = Dedup.jaccardPairs(d, n = 3, num = 4, den = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pref = Dedup.prefixFilterPairs(d, n = 3, num = 4, den = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(brute.nonEmpty)
    assert(pref.toSeq == brute.toSeq)
  }

  test("prefix filter skips pairs that only share COMMON shingles") {
    // docs 1-8 all share the common "x y z" shingle (the full inverted
    // join pairs all 28 combinations); only 9 and 10 are duplicates.
    // Rarest-first prefixes exclude the common shingle at t = 0.8, so
    // the candidate set — and the answer — collapses to (9, 10).
    // NB: token cleaning keeps only the leading LETTER run (reference
    // semantics), so per-doc suffixes must be letters, not digits
    val common = "x y z"
    val d = docs((1L to 8L).map { i =>
      val c = ('a' + i - 1).toChar
      (i, s"$common t$c u$c v$c w$c q$c r$c s$c")
    } ++
      Seq((9L, "a b c d e f g h i j"), (10L, "a b c d e f g h i j")): _*)
    val sh = Dedup.shingles(d, 3)
    val fullPairs = sh.as("a").join(sh.as("b"), "shingle")
      .where($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    assert(fullPairs >= 29, "common shingle must pair everything in the full join")
    val got = Dedup.prefixFilterPairs(d, n = 3, num = 4, den = 5).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((9L, 10L)))
  }
}
