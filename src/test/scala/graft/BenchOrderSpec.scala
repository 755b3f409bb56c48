package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-13 bench-budget ordering contract (BENCH_r12 was rc 124
  * with the alphabetical tail — `wordcount` included — unmeasured).
  */
class BenchOrderSpec extends AnyFunSuite {

  test("heaviest-first: descending prior time, ties alphabetical") {
    val prior = Map("a" -> 1.0, "b" -> 5.0, "c" -> 1.0, "d" -> 3.0)
    assert(Bench.orderNames(Seq("a", "b", "c", "d"), prior) ==
      Seq("b", "d", "a", "c"))
  }

  test("queries with no prior (new this round) run first") {
    val prior = Map("a" -> 1.0, "b" -> 5.0)
    assert(Bench.orderNames(Seq("a", "b", "new2", "new1"), prior) ==
      Seq("new1", "new2", "b", "a"))
  }

  test("no prior at all degrades to alphabetical") {
    assert(Bench.orderNames(Seq("c", "a", "b"), Map.empty) ==
      Seq("a", "b", "c"))
  }

  // Round-15 excursion retry (VERDICT r14 #4): a stall 13-20x the
  // committed prior (word_hits 66.9 s vs 3.3 s steady state in
  // BENCH_r14) earns one end-of-sweep re-run; noise-floor jitter,
  // new queries and failures do not.
  test("excursion: >3x the committed prior and >1s") {
    assert(Bench.isExcursion(66.9, 3.3))
    assert(Bench.isExcursion(3.1, 1.0))
  }

  test("not an excursion: within 3x, sub-second, no prior, or failed") {
    assert(!Bench.isExcursion(2.9, 1.0)) // within 3x
    assert(!Bench.isExcursion(0.9, 0.1)) // >3x but under the 1s floor
    assert(!Bench.isExcursion(5.0, 0.0)) // no committed prior
    assert(!Bench.isExcursion(-1.0, 2.0)) // failed stays loud, no retry
  }
}
