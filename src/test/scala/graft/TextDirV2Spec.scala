package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

class TextDirV2Spec extends SparkSpec {

  private lazy val dir: String = {
    val d = TempDirs.scratchString("graft_v2dir_")
    Files.writeString(Paths.get(d, "a.txt"), "alpha beta\ngamma")
    Files.writeString(Paths.get(d, "b.txt"), "beta beta")
    Files.writeString(Paths.get(d, "c.txt"), "delta")
    Files.writeString(Paths.get(d, "_SUCCESS"), "")
    d
  }

  private def read() =
    spark.read.format("graft.sources.v2.TextDirSource").load(dir)

  test("v2 source: full read with provenance columns, marker files skipped") {
    val rows = read().collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1), r.getString(2)))
      .toSet
    assert(rows == Set(
      ("a.txt", 1L, "alpha beta"), ("a.txt", 2L, "gamma"),
      ("b.txt", 1L, "beta beta"), ("c.txt", 1L, "delta")))
  }

  test("v2 source: file equality prunes to ONE input partition") {
    val full = read()
    assert(full.rdd.getNumPartitions == 3)
    val one = read().where(col("file") === s"$dir/b.txt")
    assert(one.rdd.getNumPartitions == 1,
      "EqualTo(file) must prune partitions at planning time")
    assert(one.collect().map(_.getString(2)).toSeq == Seq("beta beta"))
  }

  test("v2 source: prefix pushdown prunes, non-pushable filters still apply") {
    val pre = read().where(col("file").startsWith(s"$dir/a"))
    assert(pre.rdd.getNumPartitions == 1)
    // line predicate is NOT pushable: rejected in pushFilters, applied
    // post-scan — result must still be exact
    val mixed = read()
      .where(col("file").startsWith(s"$dir/a") && col("line").contains("gam"))
    assert(mixed.collect().map(_.getString(2)).toSeq == Seq("gamma"))
  }

  test("v2 source: column pruning narrows the scan output") {
    val q = read().select("line")
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) == Seq("line"),
      s"scan must emit only the required column:\n${q.queryExecution.executedPlan}")
  }
}
