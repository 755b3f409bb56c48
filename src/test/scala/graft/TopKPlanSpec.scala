package graft

import org.apache.spark.sql.functions._

import graft.plans.TopK

/** The custom TopKPerKey operator (LogicalPlan + Strategy + bounded
  * heaps) must agree with the window row_number formulation everywhere.
  */
class TopKPlanSpec extends SparkSpec {
  import spark.implicits._

  test("crafted: ranks, ties, and k > group size") {
    val df = Seq(
      ("a", "x", 5L), ("a", "y", 5L), ("a", "z", 1L),  // tie on 5 -> x before y
      ("b", "q", 9L))                                  // group smaller than k
      .toDF("g", "w", "cnt")
    val got = TopK.perKey(df, Seq("g"), Seq(("cnt", true), ("w", false)), 2)
      .orderBy("g", "rn")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "q", 1L)))
  }

  test("matches window row_number on testdata word counts") {
    val counts = operators.WordCount
      .explodeWords(Tables.documents(spark, sf0001), "text", Seq("source"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
    val win = operators.WordCount
      .topKPerGroup(Tables.documents(spark, sf0001), "text", "source", 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val plan = TopK.perKey(counts, Seq("source"), Seq(("cnt", true), ("word", false)), 3)
      .orderBy("source", "rn")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(plan.toSeq == win.toSeq)
  }

  test("maxRetained fallback: over-budget partitions degrade, answer stays exact") {
    // budget 5 = one k=5 heap: ANY partition holding a second key must
    // take the degraded path (partial: stop combining; final:
    // spill-sort + stream-rank) — and the result must still equal the
    // unconstrained operator's
    val many = (1 to 1000).map(i => (s"k${i % 100}", s"w$i", i.toLong))
      .toDF("g", "w", "v")
    val order = Seq(("v", true), ("w", false))  // total within key
    // collect the TopK frames THEMSELVES (not an orderBy wrapper, which
    // re-plans and would leave these instances' metrics untouched) and
    // canonicalize driver-side
    def run(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toSeq).toSeq
        .sortBy(r => (r(0).toString, r(3).asInstanceOf[Long]))
    val tiny = TopK.perKey(many, Seq("g"), order, 5, maxRetained = 5L)
    val reference = TopK.perKey(many, Seq("g"), order, 5)
    assert(run(tiny) == run(reference))
    // the fallback fired for real (SQL metric on the physical operator;
    // unwrap AQE to reach the final plan)
    def finalFallbacks(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allNodes(p: SparkPlan): Seq[SparkPlan] = {
        val inner = p match {
          case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
          case q: QueryStageExec => allNodes(q.plan)
          case _ => Seq.empty
        }
        (p +: p.children.flatMap(allNodes)) ++ inner
      }
      allNodes(df.queryExecution.executedPlan).collect {
        case f: graft.plans.FinalTopKPerKeyExec => f.metrics("numFallbacks").value
      }
    }
    assert(finalFallbacks(tiny).exists(_ > 0),
      s"expected fallback metric > 0, got ${finalFallbacks(tiny)}")
    // inside budget the heap path still runs (no fallback counted)
    assert(finalFallbacks(reference).forall(_ == 0L))
  }

  test("global top-k (no keys) survives a budget trip") {
    val df = (1 to 100).map(i => (s"w$i", i.toLong)).toDF("w", "v")
    val got = TopK.perKey(df, Seq.empty, Seq(("v", true), ("w", false)), 3,
      maxRetained = 1L)
      .orderBy("rn").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("w100", 1L), ("w99", 2L), ("w98", 3L)))
  }

  test("plan contains partial and final operators around one exchange") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
    val topk = TopK.perKey(df, Seq("g"), Seq(("v", true)), 1)
    val physical = topk.queryExecution.executedPlan.toString
    assert(physical.contains("PartialTopKPerKeyExec") || physical.contains("PartialTopKPerKey"))
    assert(physical.contains("FinalTopKPerKeyExec") || physical.contains("FinalTopKPerKey"))
  }

  test("TopKLimitPushdown shrinks k to the filter's rank bound") {
    val df = Seq(("a", "x", 5L), ("a", "y", 4L), ("a", "z", 3L),
      ("a", "w", 2L), ("b", "q", 9L)).toDF("g", "w", "cnt")
    val filtered = TopK.perKey(df, Seq("g"), Seq(("cnt", true), ("w", false)), 10)
      .where(col("rn") <= 2)
    val ks = filtered.queryExecution.optimizedPlan.collect {
      case t: graft.plans.TopKPerKey => t.k
    }
    assert(ks == Seq(2), s"expected k folded to 2, got $ks")
    // and the result equals the k=2 call
    val got = filtered.orderBy("g", "rn")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "q", 1L)))
  }

  test("property: filtered TopK(k) equals direct TopK(n) on random data") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val rows = Seq.fill(200)((s"g${rnd.nextInt(8)}", s"w${rnd.nextInt(1000)}",
        rnd.nextInt(50).toLong))
      val df = rows.toDF("g", "w", "cnt")
      val order = Seq(("cnt", true), ("w", false))  // total within key
      val fused = TopK.perKey(df, Seq("g"), order, 10).where(col("rn") <= 3)
        .orderBy("g", "rn").collect().map(_.toSeq)
      val direct = TopK.perKey(df, Seq("g"), order, 3)
        .orderBy("g", "rn").collect().map(_.toSeq)
      assert(fused.toSeq == direct.toSeq, s"trial $trial diverged")
    }
  }

  test("TopKLimitPushdown leaves non-rank and loosening filters alone") {
    val df = Seq(("a", "x", 5L), ("a", "y", 4L)).toDF("g", "w", "cnt")
    val loose = TopK.perKey(df, Seq("g"), Seq(("cnt", true), ("w", false)), 2)
      .where(col("rn") <= 7)  // bound above k: no change
    assert(loose.queryExecution.optimizedPlan.collect {
      case t: graft.plans.TopKPerKey => t.k }.forall(_ == 2))
    val other = TopK.perKey(df, Seq("g"), Seq(("cnt", true), ("w", false)), 2)
      .where(col("cnt") > 0L) // not a rank predicate
    assert(other.queryExecution.optimizedPlan.collect {
      case t: graft.plans.TopKPerKey => t.k }.forall(_ == 2))
    assert(other.count() == 2)
  }
}
