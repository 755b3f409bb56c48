package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("aHash60: block-mean bits, integer threshold, empty payload") {
    // 120 bytes: first 60 zero, last 60 = 0xFF -> blocks 0..29 below
    // the global mean (bits 0), blocks 30..59 above (bits 1)
    val p = Array.fill[Byte](60)(0) ++ Array.fill[Byte](60)(0xFF.toByte)
    assert(Multimodal.aHash60(p) == (1L << 30) - 1)
    // uniform payload: no block exceeds the mean -> hash 0
    assert(Multimodal.aHash60(Array.fill[Byte](100)(7)) == 0L)
    assert(Multimodal.aHash60(Array.empty[Byte]) == 0L)
  }

  test("silenceStats: frame energies, runs, trailing samples dropped") {
    def frame(v: Int) = Array.fill(16)(v)
    // 4 frames: silent, silent, loud, silent (+7 trailing samples cut)
    val s = frame(128) ++ frame(130) ++ frame(0) ++ frame(128) ++ Array.fill(7)(1)
    val (n, silent, maxRun, tot) = Multimodal.silenceStats(s, 16, 460L)
    assert(n == 4L)
    assert(silent == 3L, "three frames under the threshold")
    assert(maxRun == 2L, "longest silent run is the leading pair")
    assert(tot == 0L + 32L + 16L * 128L + 0L,
      "energy = sum |s-128| over full frames only")
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

  test("RealCodec GIF: a real multi-frame animated-GIF round trip " +
    "recovers every frame's exact gray samples, and the payload IS a GIF") {
    // 3 frames of 2x5, values spanning the palette
    val frames = Array(
      Array(0, 17, 255, 128, 200, 64, 1, 99, 254, 33),
      Array(255, 254, 0, 1, 127, 128, 129, 130, 2, 3),
      Array(7, 7, 7, 7, 7, 7, 7, 7, 7, 7))
    val gif = RealCodec.encodeGifFrames(2, 5, frames)
    assert(new String(gif, 0, 3, "US-ASCII") == "GIF", "GIF magic")
    val (w, h, got) = RealCodec.decodeGifFrames(gif)
    assert(w == 2 && h == 5 && got.length == 3)
    (got zip frames).foreach { case (g, e) => assert(g.toSeq == e.toSeq) }
    // the JDK GIF reader zeroes rows past row 0 at heights 2..4
    // (measured exhaustively) — the encoder refuses the quirk band
    intercept[IllegalArgumentException](
      RealCodec.encodeGifFrames(4, 3, Array(Array.fill(12)(0))))
  }

  test("RealCodec planted video: encode(docId) walks getNumImages and " +
    "decodes every frame to the per-frame formula") {
    val id = 44L // 44 % 3 = 2: a video doc
    val (w, h, frames) = RealCodec.decodeGifFrames(RealCodec.encodeGif(id))
    assert(w == RealCodec.videoW && h == RealCodec.videoH)
    assert(frames.length == RealCodec.videoFrames(id))
    frames.zipWithIndex.foreach { case (f, fi) =>
      assert(f.zipWithIndex.forall { case (v, i) =>
        v == RealCodec.framePixel(id, fi, i.toLong) })
    }
    // fewest-frame video id shape: id % 3 = 2 forces id % 9 ∈ {2,5,8},
    // so every video has ≥ 3 frames — check the 3-frame case too
    val three = 191L // 191 % 3 = 2, 1 + 191 % 9 = 3 frames
    assert(RealCodec.decodeGifFrames(RealCodec.encodeGif(three))._3.length == 3)
    // undecodable payload fails loudly
    intercept[Exception](RealCodec.decodeGifFrames("nope".getBytes("UTF-8")))
  }

  test("resizeNearest: truncating source mapping, hand-traced 4x2 -> 2x1") {
    // src (w=4, h=2): row0 = 0,1,2,3; row1 = 4,5,6,7
    // dst (2,1): y=0 -> srcY = 0*2/1 = 0; x=0 -> srcX=0, x=1 -> srcX=2
    val out = RealCodec.resizeNearest(4, 2, Array(0, 1, 2, 3, 4, 5, 6, 7), 2, 1)
    assert(out.toSeq == Seq(0, 2))
  }

  test("realMediaMeta: decoded dims equal the planted formulas at sf0.001") {
    val docs = Tables.documents(spark, sf0001)
    val got = Multimodal.realMediaMeta(spark, Multimodal.realMedia(docs)).collect()
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
        Multimodal.realMedia(Seq((id, "t")).toDF("doc_id", "text")))
      .collect()(0)
    assert(row.getLong(2) == 4L && row.getLong(3) == 3L)
    assert(row.getLong(4) == expected)
  }

  test("realFrameSample: every 2nd GENUINELY decoded frame, sig = that " +
    "frame's pixel sum of the planted formula") {
    val id = 44L // video doc, 1 + 44 % 9 = 9 frames -> idx 0,2,4,6,8
    val got = Multimodal.realFrameSample(spark,
        Multimodal.realMediaOfKind(Seq((id, "t")).toDF("doc_id", "text"), 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    got.foreach { case (mid, fi, sig) =>
      assert(mid == id)
      val expect = (0 until RealCodec.videoW * RealCodec.videoH)
        .map(i => RealCodec.framePixel(id, fi.toInt, i.toLong).toLong).sum
      assert(sig == expect, s"frame $fi pixel sum")
    }
  }

  test("realPhashNearDup: planted pixel clones at hamming 0; decoded-" +
    "pixel hashes, not payload-byte hashes") {
    val docs = Tables.documents(spark, sf0001)
    val got = Multimodal.realPhashNearDup(spark, Multimodal.realMediaOfKind(docs, 0)).collect()
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

  // ----------------------------------- session staging (round 15)

  test("MediaStage staged table == live realMedia, and the staged " +
    "kind filter == the live kind pushdown, gate-for-gate") {
    import graft.sources.MediaStage
    val docs = Tables.documents(spark, sf0001)
    // payload bytes and kinds are identical row-for-row
    val staged = MediaStage.media(spark, sf0001).collect()
      .map(m => (m.media_id, m.kind, m.payload.toSeq)).sortBy(_._1)
    val live = Multimodal.realMedia(docs).collect()
      .map(m => (m.media_id, m.kind, m.payload.toSeq)).sortBy(_._1)
    assert(staged.toSeq == live.toSeq)
    // a staged all-kind gate equals its live form
    assert(Multimodal.realFeatureStats(spark, MediaStage.media(spark, sf0001))
      .collect().toSeq ==
      Multimodal.realFeatureStats(spark, Multimodal.realMedia(docs))
        .collect().toSeq)
    // a staged single-kind gate equals its live kind-pushdown form
    assert(Multimodal.realSilenceProfile(spark,
        MediaStage.mediaOfKind(spark, sf0001, 1)).collect().toSeq ==
      Multimodal.realSilenceProfile(spark,
        Multimodal.realMediaOfKind(docs, 1)).collect().toSeq)
    // derive-once: the second staged handle is the same checkpointed
    // frame, not a re-encode
    assert(MediaStage.media(spark, sf0001).queryExecution.analyzed
      .sameResult(MediaStage.media(spark, sf0001).queryExecution.analyzed))
  }
}
