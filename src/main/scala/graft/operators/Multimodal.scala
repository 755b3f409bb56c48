package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by per-partition batch
  * operators (the Scala analogue of `mapInPandas` batches: one iterator
  * per partition, vectorizable per-element work, no driver collection).
  *
  * ALL THREE codecs are REAL (round 13 closed image/audio, round 14
  * closed video): PNG through the JDK's `javax.imageio.ImageIO`
  * (encode and decode), WAV/PCM through a hand-rolled RIFF
  * builder/parser, and VIDEO through ImageIO's multi-frame
  * animated-GIF sequence writer/reader — a real container whose frame
  * directory `getNumImages(true)` walks and `read(i)` decodes, with
  * zero dependencies beyond the JDK ([[RealCodec]]). The driver gates
  * run over [[realMedia]], whose payloads are deterministic tiny
  * grayscale PNGs / 8-bit PCM WAVs / 16×9 multi-frame GIFs generated
  * from doc_id arithmetic — so every decoded quantity (dimensions,
  * pixel sums, sample energies, per-frame sums) is an exact pure
  * function of doc_id that the DuckDB oracle computes WITHOUT a codec:
  * if any decode (or the resize → re-encode → re-decode round trip)
  * produced anything but the planted values, the hash compare fails.
  * The former byte-level FakeCodec stub is gone.
  */
object Multimodal {

  /** A media row: opaque payload plus routing metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** 60-bit average hash (aHash) of a payload — the perceptual-hash
    * primitive behind image near-dedup: partition the byte stream into
    * 60 balanced blocks (`block(i) = i·60 div L`), set bit `59-j` when
    * block `j`'s mean exceeds the global mean. The comparison is the
    * integer cross-multiplication `s_j·L > total·c_j` (no float
    * division), and 60 bits keeps the hash inside a positive BIGINT on
    * both engines — the [[graft.operators.Dedup.simhashPairs]]
    * convention. [[realPhashNearDup]] computes it over decoded pixel
    * luma (the gray raster ImageIO returns).
    */
  def aHash60(payload: Array[Byte]): Long = {
    val len = payload.length
    if (len == 0) return 0L
    val sums = new Array[Long](60)
    val cnts = new Array[Long](60)
    var total = 0L
    var i = 0
    while (i < len) {
      val j = (i.toLong * 60 / len).toInt
      val v = (payload(i) & 0xFF).toLong
      sums(j) += v; cnts(j) += 1; total += v
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 60) {
      if (sums(j) * len > total * cnts(j)) h |= 1L << (59 - j)
      j += 1
    }
    h
  }

  /** The per-item silence/energy fold over DECODED samples: frames of
    * `frameSamples`, integer energy Σ|s−128| per frame, frames under
    * `silentThresh` are silent, longest silent RUN tracked in the same
    * pass — one scan, constant memory per item. Returns
    * (n_frames, n_silent, max_silent_run, total_energy); hand-traced
    * in the spec, shared by [[realSilenceProfile]].
    */
  def silenceStats(s: Array[Int], frameSamples: Int,
                   silentThresh: Long): (Long, Long, Long, Long) = {
    val n = s.length / frameSamples
    var i = 0; var silent = 0L; var run = 0L; var maxRun = 0L
    var tot = 0L
    while (i < n) {
      var e = 0L
      var j = i * frameSamples
      val end = j + frameSamples
      while (j < end) { e += math.abs(s(j) - 128); j += 1 }
      tot += e
      if (e < silentThresh) {
        silent += 1; run += 1; if (run > maxRun) maxRun = run
      } else run = 0
      i += 1
    }
    (n.toLong, silent, maxRun, tot)
  }

  // ==================================================================
  // REAL codecs: PNG via the JDK's ImageIO, WAV/PCM via a hand-rolled
  // RIFF builder/parser, video via ImageIO's multi-frame animated-GIF
  // sequence writer/reader. Payload CONTENT is deterministic doc_id
  // arithmetic, so the oracle replays every decoded value without a
  // codec — the decode is proven by round trip.
  // ==================================================================

  /** Deterministic real codecs over planted content. Pixel/sample
    * formulas (mirrored verbatim by the DuckDB oracles):
    *
    *  - image (doc_id % 3 = 0): grayscale `w×h` PNG with
    *    `w = 8 + doc_id % 9`, `h = 6 + doc_id % 7`, row-major sample
    *    `v(i) = (doc_id·7 + i·11) mod 256`;
    *  - audio (doc_id % 3 = 1): 8-bit unsigned mono PCM WAV at
    *    8000 Hz, `n = 40 + doc_id % 37` samples,
    *    `s(i) = (doc_id·13 + i·17) mod 256`;
    *  - video (doc_id % 3 = 2): REAL animated GIF, 16×9,
    *    `1 + doc_id % 9` full-size frames, per-frame row-major gray
    *    pixel `v(f, i) = (doc_id·7 + f·19 + i·11) mod 256` — frame 0
    *    is the image formula, each later frame shifts by 19.
    */
  object RealCodec {
    // ImageIO's default stream cache writes a temp FILE per decode;
    // payloads are in-memory byte arrays, so force memory caching once
    javax.imageio.ImageIO.setUseCache(false)

    def grayPixel(docId: Long, i: Long): Int =
      java.lang.Math.floorMod(docId * 7 + i * 11, 256L).toInt

    def imageDims(docId: Long): (Int, Int) =
      ((8 + docId % 9).toInt, (6 + docId % 7).toInt)

    /** Encode the planted grayscale image for `docId` as a real PNG. */
    def encodePng(docId: Long): Array[Byte] = {
      val (w, h) = imageDims(docId)
      encodePngSamples(w, h,
        Array.tabulate(w * h)(i => grayPixel(docId, i.toLong)))
    }

    /** Encode row-major 8-bit gray samples as a PNG via ImageIO. */
    def encodePngSamples(w: Int, h: Int, samples: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, samples(y * w + x)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      if (!javax.imageio.ImageIO.write(img, "png", bos))
        throw new IllegalStateException("no PNG writer in this JDK")
      bos.toByteArray
    }

    /** Decode a PNG payload to (width, height, row-major gray samples)
      * via ImageIO — the REAL image decode on the executor hot path.
      */
    def decodeGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException("undecodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, out)
    }

    /** Nearest-neighbor resample (explicit truncating-integer source
      * mapping `src = (dst·srcDim) div dstDim`, NOT Graphics2D — the
      * mapping must be exactly the arithmetic the oracle replays).
      */
    def resizeNearest(w: Int, h: Int, samples: Array[Int],
                      tw: Int, th: Int): Array[Int] =
      Array.tabulate(tw * th) { i =>
        val (x, y) = (i % tw, i / tw)
        samples((y * h / th) * w + (x * w / tw))
      }

    def audioLen(docId: Long): Int = (40 + docId % 37).toInt

    def sampleVal(docId: Long, i: Int): Int =
      java.lang.Math.floorMod(docId * 13 + i * 17, 256L).toInt

    /** Canonical 44-byte RIFF/WAVE header + 8-bit unsigned mono PCM. */
    def encodeWav(docId: Long): Array[Byte] = {
      val n = audioLen(docId)
      val out = new Array[Byte](44 + n)
      def ascii(off: Int, s: String): Unit =
        s.getBytes("US-ASCII").copyToArray(out, off)
      def le32(off: Int, v: Int): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
        out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
      }
      def le16(off: Int, v: Int): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      }
      ascii(0, "RIFF"); le32(4, 36 + n); ascii(8, "WAVE")
      ascii(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */)
      le16(22, 1 /* mono */); le32(24, 8000); le32(28, 8000 /* byteRate */)
      le16(32, 1 /* blockAlign */); le16(34, 8 /* bits */)
      ascii(36, "data"); le32(40, n)
      var i = 0
      while (i < n) { out(44 + i) = sampleVal(docId, i).toByte; i += 1 }
      out
    }

    /** Parse a canonical-layout WAV payload back to
      * (sampleRate, channels, bitsPerSample, unsigned samples) —
      * validates the RIFF/WAVE/fmt/data magics so a corrupt payload
      * fails loudly instead of decoding garbage.
      */
    def decodeWav(payload: Array[Byte]): (Int, Int, Int, Array[Int]) = {
      def ascii(off: Int, n: Int) = new String(payload, off, n, "US-ASCII")
      require(payload.length >= 44 && ascii(0, 4) == "RIFF" &&
        ascii(8, 4) == "WAVE" && ascii(12, 4) == "fmt " &&
        ascii(36, 4) == "data", "not a canonical-layout WAV payload")
      def le16(off: Int) =
        (payload(off) & 0xFF) | ((payload(off + 1) & 0xFF) << 8)
      def le32(off: Int) = le16(off) | (le16(off + 2) << 16)
      val (channels, rate, bits) = (le16(22), le32(24), le16(34))
      require(bits == 8 && channels == 1, "only 8-bit mono supported")
      val n = le32(40)
      require(payload.length >= 44 + n, "truncated WAV data chunk")
      (rate, channels, bits, Array.tabulate(n)(i => payload(44 + i) & 0xFF))
    }

    def videoFrames(docId: Long): Int = (1 + docId % 9).toInt

    /** Video frames are 16×9 (the old stub header's dims, kept so the
      * meta gates' planted values are unchanged).
      */
    val videoW = 16
    val videoH = 9

    /** Planted per-frame gray pixel: frame 0 is the image formula,
      * each later frame shifts by 19 — so every decoded pixel of every
      * frame is doc_id arithmetic the oracle replays.
      */
    def framePixel(docId: Long, frame: Int, i: Long): Int =
      java.lang.Math.floorMod(docId * 7 + frame * 19 + i * 11, 256L).toInt

    /** 256-entry gray palette: index v renders as rgb(v, v, v), so a
      * decoded pixel's blue channel IS the planted value regardless of
      * how the reader orders its color model.
      */
    private lazy val grayPalette: java.awt.image.IndexColorModel = {
      val ramp = Array.tabulate[Byte](256)(_.toByte)
      new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    }

    /** Encode the planted multi-frame video for `docId` as a REAL
      * animated GIF (`videoFrames(docId)` full-size 16×9 frames).
      */
    def encodeGif(docId: Long): Array[Byte] =
      encodeGifFrames(videoW, videoH,
        Array.tabulate(videoFrames(docId))(f =>
          Array.tabulate(videoW * videoH)(i => framePixel(docId, f, i.toLong))))

    /** Encode row-major 8-bit gray frames as a multi-frame animated GIF
      * through ImageIO's sequence writer (`prepareWriteSequence` /
      * `writeToSequence`) — a real container format a bare JDK both
      * writes and reads; GIF's LZW over palette indices is lossless, so
      * the round trip is exact.
      *
      * JDK quirk (measured exhaustively over 1..20 × 1..20): the JDK
      * GIF reader silently zeroes every row past row 0 when the image
      * height is 2, 3, or 4 (its progressive-update path flushes in
      * 4-row bands and never delivers a partial band); h = 1 and
      * h ≥ 5 round-trip exactly. Refuse those heights loudly rather
      * than emit payloads the platform reader provably mangles — the
      * planted 16×9 video frames are well clear of the boundary.
      */
    def encodeGifFrames(w: Int, h: Int, frames: Array[Array[Int]]): Array[Byte] = {
      require(h == 1 || h >= 5,
        s"JDK GIF reader corrupts heights 2..4 (got $h); use h = 1 or h >= 5")
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
      if (!it.hasNext) throw new IllegalStateException("no GIF writer in this JDK")
      val writer = it.next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { samples =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, samples(y * w + x)); x += 1 }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.close(); writer.dispose()
      bos.toByteArray
    }

    /** Decode an animated-GIF payload to (width, height, per-frame
      * row-major gray samples) — the REAL multi-frame video decode on
      * the executor hot path: `reader.getNumImages(true)` walks the
      * container's frame directory, `read(i)` decodes each frame.
      * Samples are read via the composed rgb (blue channel), so the
      * values are palette-order-independent.
      */
    def decodeGifFrames(payload: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!it.hasNext) throw new IllegalStateException("no GIF reader in this JDK")
      val reader = it.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        if (n <= 0) throw new IllegalArgumentException("undecodable video payload")
        var w = 0; var h = 0
        val frames = Array.tabulate(n) { i =>
          val img = reader.read(i)
          if (i == 0) { w = img.getWidth; h = img.getHeight }
          else require(img.getWidth == w && img.getHeight == h,
            "non-full-size GIF frame")
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { out(y * w + x) = img.getRGB(x, y) & 0xFF; x += 1 }
            y += 1
          }
          out
        }
        (w, h, frames)
      } finally { reader.dispose(); iis.close() }
    }
  }

  /** The REAL media table: deterministic PNG / WAV / animated-GIF
    * payloads per document (see [[RealCodec]]). Encode runs on the
    * executors in the per-partition batch path — the gates pay a real
    * codec round trip, not a byte copy. Column pruning: only `doc_id`
    * reaches the scan (payload content is id arithmetic).
    */
  def realMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        // floorMod, NOT %: [[realMediaOfKind]] pre-filters with SQL
        // pmod(doc_id, 3), and the two kind derivations must agree for
        // a negative doc_id too (ADVICE r14 — Scala % of a negative id
        // would route a pmod-selected "audio" row to the GIF encoder)
        java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 => MediaRow(id, "image", RealCodec.encodePng(id))
          case 1 => MediaRow(id, "audio", RealCodec.encodeWav(id))
          case _ => MediaRow(id, "video", RealCodec.encodeGif(id))
        }
      })
  }

  /** [[realMedia]] restricted to one kind, with the kind predicate
    * pushed BELOW the codec: kind is a pure function of doc_id
    * (`doc_id % 3`), so a single-kind gate filters the id column
    * before the encode runs — an audio gate never pays a GIF encode.
    * (A `.filter(_.kind == …)` above realMedia runs AFTER every
    * payload is built; at sf0.1 that is thousands of discarded
    * encodes.) The codec-kind mod values: image 0, audio 1, video 2.
    */
  def realMediaOfKind(docs: DataFrame, kindMod: Int): Dataset[MediaRow] =
    realMedia(docs.where(pmod(col("doc_id"), lit(3)) === kindMod))

  /** Per-kind REAL decode → (width, height, n_frames, sig): image =
    * ImageIO dims + pixel sum; audio = WAV (n_samples, channels) +
    * Σ|s−128| energy; video = GIF frame-directory walk + per-frame
    * decode, sig = pixel sum over ALL frames. The shared decode behind
    * the meta/stats gates.
    */
  private def decodeReal(m: MediaRow): (Long, Long, Long, Long) =
    m.kind match {
      case "image" =>
        val (w, h, s) = RealCodec.decodeGray(m.payload)
        (w.toLong, h.toLong, 1L, s.foldLeft(0L)(_ + _))
      case "audio" =>
        val (_, ch, _, s) = RealCodec.decodeWav(m.payload)
        (s.length.toLong, ch.toLong, 1L,
          s.foldLeft(0L)((a, v) => a + math.abs(v - 128)))
      case _ =>
        val (w, h, frames) = RealCodec.decodeGifFrames(m.payload)
        (w.toLong, h.toLong, frames.length.toLong,
          frames.foldLeft(0L)((a, f) => a + f.foldLeft(0L)(_ + _)))
    }

  /** Gate: per-item decoded metadata through the real codecs. Takes
    * the media table as a frame so the caller picks the source: the
    * declared gate stays deliberately LIVE on [[realMedia]] (it keeps
    * measuring the encode→decode round trip), while the rest of the
    * family reads the session-staged table
    * ([[graft.sources.MediaStage]], round 15).
    */
  def realMediaMeta(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, f, _) = decodeReal(m)
      (m.media_id, m.kind, w, h, f)
    }).toDF("media_id", "kind", "width", "height", "n_frames")
      .orderBy("media_id")
  }

  /** Gate: per-kind rollup of decoded metadata + content signature
    * (image pixel sums / audio energies / video all-frame pixel sums —
    * values only a correct decode can produce).
    */
  def realFeatureStats(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, f, sig) = decodeReal(m)
      (m.kind, w, h, f, sig)
    }).toDF("kind", "w", "h", "f", "sig")
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum("w").as("sum_width"),
        sum("h").as("sum_height"), sum("f").as("sum_frames"),
        sum("sig").as("sum_sig"))
      .orderBy("kind")
  }

  /** Gate: the full image maintenance round trip — decode (ImageIO) →
    * nearest-neighbor resample to (tw, th) → RE-ENCODE as PNG →
    * decode AGAIN; emits the second decode's dims + pixel sum, so a
    * lossy or non-deterministic step anywhere in the chain breaks the
    * oracle equality. Non-images pass through the plain decode.
    */
  def realResize(spark: SparkSession, media: Dataset[MediaRow],
                 tw: Int = 4, th: Int = 3): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind == "image") {
        val (w, h, s) = RealCodec.decodeGray(m.payload)
        val reenc = RealCodec.encodePngSamples(tw, th,
          RealCodec.resizeNearest(w, h, s, tw, th))
        val (w2, h2, s2) = RealCodec.decodeGray(reenc)
        (m.media_id, m.kind, w2.toLong, h2.toLong, s2.foldLeft(0L)(_ + _))
      } else {
        val (w, h, _, _) = decodeReal(m)
        (m.media_id, m.kind, w, h, 0L)
      }
    }).toDF("media_id", "kind", "width", "height", "sig")
      .orderBy("media_id")
  }

  /** Gate: perceptual-hash near-dup pairs over DECODED image pixels
    * (aHash60 over the gray raster, not payload bytes), with
    * deterministic plants — exact pixel clones at +10M for
    * doc_id % 29 = 0, one-pixel (+128 mod 256) perturbations at +20M
    * for doc_id % 31 = 0 — then the 4×15-bit pigeonhole banding and
    * integer `bit_count(xor)` verify of [[bandedHamPairs]].
    */
  def realPhashNearDup(spark: SparkSession, images: Dataset[MediaRow],
                       maxHam: Int = 3): DataFrame = {
    import spark.implicits._
    val hashes = images
      .mapPartitions(_.flatMap { m =>
        val (_, _, s) = RealCodec.decodeGray(m.payload)
        val bytes = s.map(v => v.toByte)
        val base = List((m.media_id, aHash60(bytes)))
        val clone =
          if (m.media_id % 29 == 0)
            List((m.media_id + 10000000L, aHash60(bytes))) else Nil
        val pert =
          if (m.media_id % 31 == 0) {
            val p = bytes.clone()
            p(0) = (((p(0) & 0xFF) + 128) % 256).toByte
            List((m.media_id + 20000000L, aHash60(p)))
          } else Nil
        base ++ clone ++ pert
      }).toDF("media_id", "ahash")
      .localCheckpoint()
    bandedHamPairs(hashes, maxHam)
  }

  /** SimHash-style pigeonhole banding + verify over (media_id, ahash):
    * 4 bands of 15 bits (Hamming ≤ 3 pairs must collide on ≥ 1 band),
    * `bit_count(xor)` on candidates only — the banding half of
    * [[realPhashNearDup]].
    */
  private def bandedHamPairs(hashes: DataFrame, maxHam: Int): DataFrame = {
    val bands = hashes.select(col("media_id"), col("ahash"),
        explode(expr("sequence(0, 3)")).as("b"))
      .select(col("media_id"), col("ahash"), col("b"),
        expr("shiftright(ahash, cast(15 * b AS int)) & 32767").as("key"))
    val cand = bands.toDF("id_a", "ha", "b", "key")
      .join(bands.toDF("id_b", "hb", "b", "key"), Seq("b", "key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct()
    cand.select(col("id_a"), col("id_b"),
        expr("cast(bit_count(ha ^ hb) AS bigint)").as("hamming"))
      .where(col("hamming") <= maxHam)
      .orderBy("id_a", "id_b")
  }

  /** Gate: VAD-style silence/energy profile over REAL decoded WAV
    * samples — frames of `frameSamples`, energy Σ|s−128|, silent
    * < `silentThresh`, longest silent run ([[silenceStats]]), run over
    * the decoded sample domain, not payload bytes.
    */
  def realSilenceProfile(spark: SparkSession, audio: Dataset[MediaRow],
                         frameSamples: Int = 16,
                         silentThresh: Long = 1024L): DataFrame = {
    import spark.implicits._
    audio
      .mapPartitions(_.map { m =>
        val (_, _, _, s) = RealCodec.decodeWav(m.payload)
        val (n, silent, maxRun, tot) = silenceStats(s, frameSamples, silentThresh)
        (m.media_id, n, silent, maxRun, tot)
      }).toDF("media_id", "n_frames", "n_silent", "max_silent_run",
        "total_energy")
      .orderBy("media_id")
  }

  /** Gate: every `everyN`-th frame of each video, GENUINELY decoded —
    * the GIF reader walks the container's frame directory
    * (`getNumImages(true)`) and `read(i)` decodes each sampled frame;
    * `frame_sig` is that frame's pixel sum, so a wrong frame count,
    * wrong frame order, or wrong pixel anywhere breaks the oracle
    * hash. One pass, partition-local until the final sort.
    */
  def realFrameSample(spark: SparkSession, videos: Dataset[MediaRow],
                      everyN: Int = 2): DataFrame = {
    import spark.implicits._
    videos
      .mapPartitions(_.flatMap { m =>
        val (_, _, frames) = RealCodec.decodeGifFrames(m.payload)
        (0 until frames.length by everyN).map(i =>
          (m.media_id, i.toLong, frames(i).foldLeft(0L)(_ + _)))
      }).toDF("media_id", "frame_idx", "frame_sig")
      .orderBy("media_id", "frame_idx")
  }

  /** Gate: cross-modal retrieval with the image tower fed by REAL
    * decoded pixels — the first 16 gray samples as the integer feature
    * vector, dot-scored against the quantized embedding queries.
    */
  def realCrossmodalTopk(spark: SparkSession, images: Dataset[MediaRow],
                         emb: DataFrame, nQueries: Int = 20,
                         k: Int = 3): DataFrame = {
    import spark.implicits._
    val feats = images
      .mapPartitions(_.map { m =>
        val (_, _, s) = RealCodec.decodeGray(m.payload)
        (m.media_id, Array.tabulate(16)(i => s(i).toLong))
      }).toDF("media_id", "fv")
    val q = emb.where(col("vec_id") < nQueries && size(col("embedding")) >= 16)
      .select(col("vec_id"), expr(
        "transform(slice(embedding, 1, 16), x -> cast(round(cast(x AS double) * 1000) AS bigint))")
        .as("qv"))
    feats.crossJoin(broadcast(q))
      .select(col("vec_id"), col("media_id"),
        expr("aggregate(zip_with(qv, fv, (a, b) -> a * b), 0L, (s, x) -> s + x)")
          .as("score"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("score").desc, col("media_id"))))
      .where(col("rk") <= k)
      .select(col("vec_id"), col("rk").cast("long").as("rk"),
        col("media_id"), col("score"))
      .orderBy("vec_id", "rk")
  }
}
