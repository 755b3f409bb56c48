package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 regressions that don't need a Spark session. */
class Round13Spec extends AnyFunSuite {

  // The customer_rec_eval residual digest flake (full-sweep bimodal,
  // isolated-stable): RewriteDistinctAggregates permutes the key lists
  // of the intermediate HashAggregate/Exchange lines, and the old flat
  // ", " segment sort attached structural prefixes (`keys=[`,
  // `hashpartitioning(`) to whichever attribute came first — permuted
  // lists produced different fragment MULTISETS, which no sort can
  // undo. canonDeep sorts each comma list at its own nesting depth.

  test("canonDeep: prefix-attached key-list permutations collapse") {
    val a = "HashAggregate(keys=[custkey#x, CASE WHEN (hit = 1L) THEN " +
      "custkey END#x, gid#x], functions=[sum(coalesce(hit, 0L))], " +
      "output=[custkey#x, sum#x])"
    val b = "HashAggregate(keys=[CASE WHEN (hit = 1L) THEN custkey " +
      "END#x, custkey#x, gid#x], functions=[sum(coalesce(hit, 0L))], " +
      "output=[custkey#x, sum#x])"
    assert(PlanSnapshot.canonGid(a) == PlanSnapshot.canonGid(b))
    val c = "Exchange hashpartitioning(custkey#x, CASE WHEN (hit = 1L) " +
      "THEN custkey END#x, gid#x, 8), ENSURE_REQUIREMENTS"
    val d = "Exchange hashpartitioning(CASE WHEN (hit = 1L) THEN " +
      "custkey END#x, custkey#x, gid#x, 8), ENSURE_REQUIREMENTS"
    assert(PlanSnapshot.canonGid(c) == PlanSnapshot.canonGid(d))
  }

  test("canonDeep: a changed element multiset still flips") {
    val a = "HashAggregate(keys=[a#x, b#x, gid#x], functions=[count(x#x)])"
    val b = "HashAggregate(keys=[a#x, c#x, gid#x], functions=[count(x#x)])"
    assert(PlanSnapshot.canonGid(a) != PlanSnapshot.canonGid(b))
    // and a changed literal inside a nested call flips too
    val c = "HashAggregate(keys=[a#x, gid#x], functions=[sum(coalesce(h, 0L))])"
    val d = "HashAggregate(keys=[a#x, gid#x], functions=[sum(coalesce(h, 1L))])"
    assert(PlanSnapshot.canonGid(c) != PlanSnapshot.canonGid(d))
  }

  test("canonDeep: unbalanced (truncated) input stays deterministic") {
    val t = "HashAggregate(keys=[a#x, gid#x], functions=[sum(coal..."
    assert(PlanSnapshot.canonGid(t) == PlanSnapshot.canonGid(t))
  }

  // Expand-output tie-break (ADVICE r12): duplicate #x-erased output
  // names must not fall back to original relative order — the sorted
  // multiset of each column's per-group content breaks the tie in a
  // labeling-independent way.
  test("canonGid: duplicate output names tie-break by group content") {
    val a = "Expand [[a#x, null, 1], [null, b#x, 2]], [n#x, n#x, gid#x]"
    val b = "Expand [[null, a#x, 1], [b#x, null, 2]], [n#x, n#x, gid#x]"
    assert(PlanSnapshot.canonGid(a) == PlanSnapshot.canonGid(b))
  }
}
