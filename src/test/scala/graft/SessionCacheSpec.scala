package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import graft.sources.SessionCache

/** Concurrency spec for the staging layer's [[SessionCache]] — now
  * load-bearing for the dedup/CF/ANN families. Its documented races
  * (double derive on contention, LRU eviction mid-cycle, re-entrant
  * derive) are argued harmless in the class doc; this spec exercises
  * each under real threads.
  */
class SessionCacheSpec extends SparkSpec {

  private def await(latch: CountDownLatch): Unit =
    assert(latch.await(30, TimeUnit.SECONDS), "timed out")

  test("two sessions deriving the same key concurrently stay isolated: " +
    "each is served its own session's derivation") {
    val cache = new SessionCache[String, String]()
    val (s1, s2) = (spark.newSession(), spark.newSession())
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(() => { start.await(); cache.getOrDerive(s1, "k")("v-s1") })
      val f2 = pool.submit(() => { start.await(); cache.getOrDerive(s2, "k")("v-s2") })
      start.countDown()
      assert(f1.get(30, TimeUnit.SECONDS) == "v-s1")
      assert(f2.get(30, TimeUnit.SECONDS) == "v-s2")
      // and the cached values stay per-session afterwards
      assert(cache.getOrDerive(s1, "k")(fail("must be cached")) == "v-s1")
      assert(cache.getOrDerive(s2, "k")(fail("must be cached")) == "v-s2")
    } finally pool.shutdownNow()
  }

  test("same (session, key) under contention: both racers may derive, " +
    "but every caller returns the ONE winning value") {
    val cache = new SessionCache[String, Int]()
    val s = spark.newSession()
    val derives = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val inDerive = new CountDownLatch(2)
    val pool = Executors.newFixedThreadPool(2)
    try {
      def racer() = pool.submit(() => {
        start.await()
        cache.getOrDerive(s, "k") {
          inDerive.countDown()
          // hold until BOTH racers are inside derive, proving the
          // derive runs outside any lock (a map-lock derive deadlocks
          // here; the documented double-derive is the accepted cost)
          assert(inDerive.await(30, TimeUnit.SECONDS))
          derives.incrementAndGet()
        }
      })
      val (f1, f2) = (racer(), racer())
      start.countDown()
      val (v1, v2) = (f1.get(30, TimeUnit.SECONDS), f2.get(30, TimeUnit.SECONDS))
      assert(derives.get == 2, "both racers derived (documented, harmless)")
      assert(v1 == v2, "putIfAbsent: one winner, both callers see it")
      assert(cache.getOrDerive(s, "k")(fail("must be cached")) == v1)
    } finally pool.shutdownNow()
  }

  test("5 sessions through a 4-slot LRU: the eldest is evicted and " +
    "re-derives correctly; survivors stay cached") {
    val cache = new SessionCache[String, String](maxSessions = 4)
    val sessions = (0 until 5).map(_ => spark.newSession())
    val derives = new AtomicInteger(0)
    def derive(i: Int): String = { derives.incrementAndGet(); s"v$i" }
    sessions.zipWithIndex.foreach { case (s, i) =>
      assert(cache.getOrDerive(s, "k")(derive(i)) == s"v$i")
    }
    assert(derives.get == 5)
    // session 0 (eldest by access) was evicted by session 4's insert:
    // it re-derives — deterministic and answer-identical by contract
    assert(cache.getOrDerive(sessions(0), "k")(derive(0)) == "v0")
    assert(derives.get == 6, "evicted session re-derives exactly once")
    // the most-recent 3 of the original survivors are still cached
    // (session 0's re-insert evicted the then-eldest session 1)
    (2 until 5).foreach { i =>
      assert(cache.getOrDerive(sessions(i), "k")(
        fail(s"session $i must still be cached")) == s"v$i")
    }
    assert(derives.get == 6)
  }

  test("re-entrant derive (the ccLabels stage-the-pairs-first pattern) " +
    "does not deadlock or corrupt, including under contention") {
    val cache = new SessionCache[String, String]()
    val s = spark.newSession()
    // single-threaded re-entrancy: deriving A derives B inside
    val a = cache.getOrDerive(s, "A") {
      val b = cache.getOrDerive(s, "B")("vB")
      s"vA($b)"
    }
    assert(a == "vA(vB)")
    assert(cache.getOrDerive(s, "B")(fail("B must be cached")) == "vB")
    // contended re-entrancy: N threads, each deriving its own outer
    // key, all re-entering for the same shared inner key
    val cache2 = new SessionCache[String, String]()
    val n = 8
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    try {
      val fs = (0 until n).map { i =>
        pool.submit(() => {
          start.await()
          cache2.getOrDerive(s, s"outer$i") {
            val inner = cache2.getOrDerive(s, "inner")("vI")
            s"v$i($inner)"
          }
        })
      }
      start.countDown()
      fs.zipWithIndex.foreach { case (f, i) =>
        assert(f.get(30, TimeUnit.SECONDS) == s"v$i(vI)")
      }
      assert(cache2.getOrDerive(s, "inner")(fail("cached")) == "vI")
    } finally pool.shutdownNow()
  }
}
