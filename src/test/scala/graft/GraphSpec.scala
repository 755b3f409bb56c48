package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bigramEdges are distinct consecutive pairs") {
    val d = docs(1L -> "a b a b", 2L -> "b c")
    val got = Graph.triangleCount(d)  // no triangle in a path graph
    assert(got.collect().head.getLong(0) == 0L)
    val edges = Graph.bigramEdges(d).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges == Set(("a", "b"), ("b", "a"), ("b", "c")))
  }

  test("triangleCount finds each triangle exactly once") {
    // K4 on {a,b,c,d} = 4 triangles; build via a doc walking all edges
    val d = docs(1L -> "a b c a d b d c d a c b")
    // edges: ab bc ca ad db bd dc cd da ac cb -> all 6 undirected pairs
    val n = Graph.triangleCount(d).collect().head.getLong(0)
    assert(n == 4L)
  }

  test("bfsDistances: first-reach depths on a chain with a shortcut") {
    // chain a-b-c-d plus shortcut a-d: d is 1 hop via the shortcut
    val d = docs(1L -> "a b", 2L -> "b c", 3L -> "c d", 4L -> "a d")
    val got = Graph.bfsDistances(d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 1L))
  }

  test("bfsDistances: maxHops bounds the horizon; unreached words absent") {
    val d = docs(1L -> "a b", 2L -> "b c", 3L -> "c d", 4L -> "x y")
    val got = Graph.bfsDistances(d, maxHops = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // d is 3 hops away -> outside the horizon; x/y disconnected
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }
}
