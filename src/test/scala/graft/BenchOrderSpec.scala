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
}
