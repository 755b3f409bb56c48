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

  // ---------------------------------------------------- real codecs

  import Multimodal.RealCodec

  test("RealCodec PNG: a real ImageIO round trip recovers the exact " +
    "gray samples, and the payload IS a PNG") {
    val samples = Array(0, 17, 255, 128, 200, 64) // 3x2
    val png = RealCodec.encodePngSamples(3, 2, samples)
    // PNG magic: 0x89 'P' 'N' 'G'
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte)
    val (w, h, got) = RealCodec.decodeGray(png)
    assert(w == 3 && h == 2 && got.toSeq == samples.toSeq)
  }

  test("RealCodec planted image: encode(docId) decodes to the formula") {
    val id = 42L // 42 % 3 = 0: an image doc
    val (w, h, s) = RealCodec.decodeGray(RealCodec.encodePng(id))
    assert((w, h) == RealCodec.imageDims(id))
    assert(s.zipWithIndex.forall { case (v, i) =>
      v == RealCodec.grayPixel(id, i.toLong) })
  }

  test("RealCodec WAV: canonical RIFF round trip, strict validation") {
    val id = 43L // 43 % 3 = 1: an audio doc
    val wav = RealCodec.encodeWav(id)
    val (rate, ch, bits, s) = RealCodec.decodeWav(wav)
    assert(rate == 8000 && ch == 1 && bits == 8)
    assert(s.length == RealCodec.audioLen(id))
    assert(s.zipWithIndex.forall { case (v, i) =>
      v == RealCodec.sampleVal(id, i) })
    // corrupt magic fails loudly instead of decoding garbage
    val bad = wav.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](RealCodec.decodeWav(bad))
  }

  test("resizeNearest: truncating source mapping, hand-traced 4x2 -> 2x1") {
    // src (w=4, h=2): row0 = 0,1,2,3; row1 = 4,5,6,7
    // dst (2,1): y=0 -> srcY = 0*2/1 = 0; x=0 -> srcX=0, x=1 -> srcX=2
    val out = RealCodec.resizeNearest(4, 2, Array(0, 1, 2, 3, 4, 5, 6, 7), 2, 1)
    assert(out.toSeq == Seq(0, 2))
  }

  test("realMediaMeta: decoded dims equal the planted formulas at sf0.001") {
    val docs = Tables.documents(spark, sf0001)
    val got = Multimodal.realMediaMeta(spark, docs).collect()
    assert(got.length == docs.count())
    got.foreach { r =>
      val (id, kind) = (r.getLong(0), r.getString(1))
      val (w, h, f) = (r.getLong(2), r.getLong(3), r.getLong(4))
      kind match {
        case "image" =>
          val (ew, eh) = RealCodec.imageDims(id)
          assert((w, h, f) == ((ew.toLong, eh.toLong, 1L)))
        case "audio" =>
          assert((w, h, f) == ((RealCodec.audioLen(id).toLong, 1L, 1L)))
        case _ =>
          assert((w, h, f) ==
            ((16L, 9L, RealCodec.videoFrames(id).toLong)))
      }
    }
  }

  test("realResize: decode -> NN resample -> re-encode -> re-decode " +
    "lands on the arithmetic pixel sum") {
    val id = 42L
    val (w, h, s) = RealCodec.decodeGray(RealCodec.encodePng(id))
    val expected = (for (y <- 0 until 3; x <- 0 until 4)
      yield s((y * h / 3) * w + (x * w / 4)).toLong).sum
    val row = Multimodal.realResize(spark,
        Seq((id, "t")).toDF("doc_id", "text"))
      .collect()(0)
    assert(row.getLong(2) == 4L && row.getLong(3) == 3L)
    assert(row.getLong(4) == expected)
  }

  test("realPhashNearDup: planted pixel clones at hamming 0; decoded-" +
    "pixel hashes, not payload-byte hashes") {
    val docs = Tables.documents(spark, sf0001)
    val got = Multimodal.realPhashNearDup(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // base-vs-clone only (doc 0's clone also pairs with doc 0's
    // perturbed copy at +20M — a genuine near-dup, not a clone pair)
    val clonePairs = got.filter { case (a, b, _) =>
      a < 10000000L && b == a + 10000000L }
    assert(clonePairs.nonEmpty && clonePairs.forall(_._3 == 0L))
    // the one-pixel perturbed plants land within the threshold too
    assert(got.exists { case (a, b, _) =>
      a < 10000000L && b == a + 20000000L })
  }
}
