package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{FakeCodec, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: MediaRow*) = spark.createDataset(rows.toSeq)

  private val header = Array[Byte](1, 64, 0, 200.toByte, 10) // w=320, h=200, 10 frames

  test("decodeMeta parses the stub header per partition") {
    val m = Multimodal.decodeMeta(media(
      MediaRow(1L, "image", header ++ Array[Byte](9, 9)),
      MediaRow(2L, "audio", Array[Byte]())))
      .collect().map(x => x.media_id -> x).toMap
    assert(m(1L).width == 320 && m(1L).height == 200 && m(1L).n_frames == 10
      && m(1L).n_bytes == 7L)
    assert(m(2L).width == 0 && m(2L).n_frames == 1)
  }

  test("resizeImages restamps only image payloads") {
    val out = Multimodal.resizeImages(media(
      MediaRow(1L, "image", header.clone()),
      MediaRow(2L, "video", header.clone())), 64, 32)
      .collect().map(m => m.media_id -> FakeCodec.decode(m.payload)).toMap
    assert(out(1L) == ((64, 32, 10)))
    assert(out(2L) == ((320, 200, 10)))
  }

  test("frameSample emits every Nth frame of the declared count") {
    val got = Multimodal.frameSample(media(MediaRow(1L, "video", header)), 3)
      .collect().map(_.getInt(2)).toSeq
    assert(got == Seq(0, 3, 6, 9))
  }

  test("feature extraction is deterministic with fixed dim") {
    val p = "some payload bytes".getBytes("UTF-8")
    val a = FakeCodec.features(p, 16)
    val b = FakeCodec.features(p, 16)
    assert(a.toSeq == b.toSeq && a.length == 16 && a.exists(_ != 0f))
  }

  test("aHash60: block-mean bits, integer threshold, empty payload") {
    // 120 bytes: first 60 zero, last 60 = 0xFF -> blocks 0..29 below
    // the global mean (bits 0), blocks 30..59 above (bits 1)
    val p = Array.fill[Byte](60)(0) ++ Array.fill[Byte](60)(0xFF.toByte)
    assert(Multimodal.aHash60(p) == (1L << 30) - 1)
    // uniform payload: no block exceeds the mean -> hash 0
    assert(Multimodal.aHash60(Array.fill[Byte](100)(7)) == 0L)
    assert(Multimodal.aHash60(Array.empty[Byte]) == 0L)
  }

  test("phashNearDup finds the planted clone and perturbed pairs") {
    val docs = Tables.documents(spark, sf0001)
    val got = Multimodal.phashNearDup(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every %97 doc pairs with its +10M exact clone at hamming 0
    val clonePairs = got.filter { case (a, b, _) => b == a + 10000000L }
    assert(clonePairs.nonEmpty && clonePairs.forall(_._3 == 0L))
    // perturbed copies (+20M) are found too, within the threshold
    val pert = got.filter { case (a, b, _) => b == a + 20000000L }
    assert(pert.nonEmpty && pert.forall(_._3 <= 3L))
  }

  test("syntheticMedia/mediaMeta plumbing over documents") {
    val docs = Tables.documents(spark, sf0001)
    val meta = Multimodal.mediaMeta(docs)
    assert(meta.count() == docs.count())
    val kinds = meta.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }
}
