package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue/zExtract round-trip over the full 8-bit grid") {
    val d = (0L until 256L).map(z => (z >> 4, z & 15L)).toDF("x", "y")
    val got = d.select(col("x"), col("y"),
        Layout.zValue(col("x"), col("y"), 8).as("z"))
      .select(col("x"), col("y"),
        Layout.zExtract(col("z"), 1, 8).as("rx"),
        Layout.zExtract(col("z"), 0, 8).as("ry"))
      .where(col("x") =!= col("rx") || col("y") =!= col("ry"))
    assert(got.count() == 0)
  }

  test("zValue locality: points in an aligned 4x4 box share zval >> 4") {
    val d = (0L until 64L).map(z => (z >> 3, z & 7L)).toDF("x", "y")
    val buckets = d.select((col("x") / 4).cast("long").as("bx"),
        (col("y") / 4).cast("long").as("by"),
        shiftright(Layout.zValue(col("x"), col("y"), 8), 4).as("zb"))
      .groupBy("bx", "by").agg(count_distinct(col("zb")).as("nzb"))
      .collect().map(_.getLong(2))
    assert(buckets.forall(_ == 1L))
  }

  test("zorderWrite: per-file bounding boxes are tight on BOTH dims") {
    // 32x32 grid, one row per cell; 8 output files
    val d = (0L until 1024L).map(z => (z >> 5, z & 31L)).toDF("ux", "dy")
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.zorderWrite(d, "ux", "dy", bits = 8, partitions = 8, s"$out/z")
    val spans = spark.read.parquet(s"$out/z")
      .groupBy(input_file_name().as("f"))
      .agg((max("ux") - min("ux")).as("sx"), (max("dy") - min("dy")).as("sy"))
      .collect()
    assert(spans.length == 8)
    // global span is 31 on each dim; a z-layout file must cover far less
    // on average (a linear sort on ux alone would give sy = 31 per file)
    val avgSy = spans.map(_.getLong(2)).sum.toDouble / spans.length
    val avgSx = spans.map(_.getLong(1)).sum.toDouble / spans.length
    assert(avgSx < 16.0 && avgSy < 16.0)
  }

  test("compactionBins packs key-ordered files by exclusive running total") {
    import spark.implicits._
    val files = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 1L)).toDF("k", "sz")
    val got = operators.Layout.compactionBins(files, "k", "sz", target = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // cum_before = 0, 7, 14, 21 -> bins 0, 0, 1, 2: a file crossing the
    // boundary stays with its bin (bins overflow by < one file)
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)))
  }
}
