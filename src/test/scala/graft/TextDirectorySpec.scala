package graft

import java.nio.file.Files

import graft.sources.TextDirectory

/** End-to-end test of the reference-fidelity source/sink: a directory
  * of plain-text files in, `word count` text shards out — the complete
  * reference program (`README.md:4`) as one library call.
  */
class TextDirectorySpec extends SparkSpec {

  private def withCorpus[T](f: String => T): T = {
    val dir = Files.createTempDirectory("graft_corpus").toFile
    Files.writeString(new java.io.File(dir, "f1.txt").toPath, "The cat sat\non the Mat!")
    Files.writeString(new java.io.File(dir, "f2.txt").toPath, "the dog")
    try f(dir.getAbsolutePath)
    finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("wordCountDir counts words across all files in a folder") {
    withCorpus { dir =>
      val got = TextDirectory.wordCountDir(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("the" -> 3L, "cat" -> 1L, "sat" -> 1L, "on" -> 1L,
        "mat" -> 1L, "dog" -> 1L))
    }
  }

  test("wordCountPerFile keys by originating file") {
    withCorpus { dir =>
      val got = TextDirectory.wordCountPerFile(spark, dir).collect()
        .map(r => (r.getString(0).split('/').last, r.getString(1), r.getLong(2)))
      assert(got.count(_._1 == "f2.txt") == 2) // the, dog
      assert(got.filter(t => t._1 == "f1.txt" && t._2 == "the").head._3 == 2L)
    }
  }

  test("sharded sink writes sorted `word count` lines; merged realizes TODO 3") {
    withCorpus { dir =>
      val counts = TextDirectory.wordCountDir(spark, dir)
      val out = Files.createTempDirectory("graft_out").toFile.getAbsolutePath
      TextDirectory.writeSharded(counts, s"$out/sharded", 2)
      TextDirectory.writeMerged(counts, s"$out/merged")
      val sharded = spark.read.textFile(s"$out/sharded").collect()
      assert(sharded.toSet == Set("the 3", "cat 1", "sat 1", "on 1", "mat 1", "dog 1"))
      val merged = spark.read.textFile(s"$out/merged").collect()
      assert(merged.toSeq == merged.sorted.toSeq && merged.length == 6)
    }
  }
}
