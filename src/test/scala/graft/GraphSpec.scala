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
}
