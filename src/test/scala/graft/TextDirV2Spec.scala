package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

class TextDirV2Spec extends SparkSpec {
  import spark.implicits._

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

  test("v2 source: reported statistics shrink with pushed file pruning") {
    // full scan: sizeInBytes = sum of the three data files' lengths
    val total = Seq("a.txt", "b.txt", "c.txt")
      .map(f => Files.size(Paths.get(dir, f))).sum
    val full = read()
    assert(full.queryExecution.optimizedPlan.stats.sizeInBytes
      == BigInt(total))
    // pruned scan: only b.txt's bytes survive into the estimate, so
    // join planning sees the post-pruning size (broadcastable side)
    val pruned = read().where(col("file") === s"$dir/b.txt")
    assert(pruned.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats.sizeInBytes
    }.contains(BigInt(Files.size(Paths.get(dir, "b.txt")))))
  }

  test("v2 sink: Rank_*_Thread_0 layout round-trips through the v2 reader") {
    val out = TempDirs.scratchString("graft_v2sink_")
    val counts = Seq(("alpha", 3L), ("beta", 2L), ("gamma", 7L))
      .toDF("word", "cnt")
    counts.repartition(2, col("word"))
      .write.format("graft.sources.v2.TextDirSource")
      .mode("overwrite").save(out)
    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.forall(_.matches("Rank_\\d+_Thread_0\\.txt")), files.mkString(","))
    assert(files.length == 2)
    // read the sink back through the v2 READER and reparse
    val back = spark.read.format("graft.sources.v2.TextDirSource").load(out)
      .select(split(col("line"), " ").as("kv"))
      .select(col("kv")(0).as("word"), col("kv")(1).cast("long").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(back == Set(("alpha", 3L), ("beta", 2L), ("gamma", 7L)))
    // overwrite truncates: a second write leaves no stale shards
    counts.limit(1).repartition(1)
      .write.format("graft.sources.v2.TextDirSource")
      .mode("overwrite").save(out)
    assert(new java.io.File(out).listFiles().length == 1)
  }

  test("v2 source: column pruning narrows the scan output") {
    val q = read().select("line")
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) == Seq("line"),
      s"scan must emit only the required column:\n${q.queryExecution.executedPlan}")
  }
}
