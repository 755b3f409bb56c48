package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by per-partition batch
  * operators (the Scala analogue of `mapInPandas` batches: one iterator
  * per partition, vectorizable per-element work, no driver collection).
  *
  * Round 13: the image and audio codecs are REAL — PNG through the
  * JDK's `javax.imageio.ImageIO` (encode and decode), WAV/PCM through
  * a hand-rolled RIFF builder/parser ([[RealCodec]]). The driver gates
  * run over [[realMedia]], whose payloads are deterministic tiny
  * grayscale PNGs / 8-bit PCM WAVs generated from doc_id arithmetic —
  * so every decoded quantity (dimensions, pixel sums, sample energies)
  * is an exact pure function of doc_id that the DuckDB oracle computes
  * WITHOUT a codec: if ImageIO's decode (or the resize → re-encode →
  * re-decode round trip) produced anything but the planted values, the
  * hash compare fails. Only VIDEO remains behind [[FakeCodec]]'s
  * synthetic header — a bare JDK genuinely cannot parse video
  * containers; that seam is one documented function.
  *
  * The original byte-level plumbing ([[syntheticMedia]] + [[FakeCodec]]
  * paths) is retained below as the spec-covered mapPartitions batch
  * skeleton a real model-inference codec would drop into.
  */
object Multimodal {

  /** A media row: opaque payload plus routing metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata (what a real codec would parse from the header). */
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                       width: Int, height: Int, n_frames: Int)

  /** A fixed-size feature vector per media item (stand-in for a CNN /
    * audio embedding).
    */
  case class MediaFeatures(media_id: Long, features: Array[Float])

  /** STUB codec — deterministic fake in place of a real image/audio
    * decoder (none available in this container). Header layout it
    * "parses": byte0*256+byte1 = width, byte2*256+byte3 = height,
    * byte4 = frame count. Replace with a real codec binding at the
    * same call sites for production.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      def b(i: Int): Int = if (payload.length > i) payload(i) & 0xFF else 0
      (b(0) * 256 + b(1), b(2) * 256 + b(3), math.max(1, b(4)))
    }

    /** Deterministic fake "embedding": dim-`d` float vector from a
      * rolling byte hash — stands in for model inference.
      */
    def features(payload: Array[Byte], d: Int): Array[Float] = {
      val out = new Array[Float](d)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + (payload(i) & 0xFF)
        out(i % d) += ((h >>> 40) % 1000).toFloat / 1000f
        i += 1
      }
      out
    }

    /** Fake resize: re-stamps the header with the new dimensions and
      * truncates payload proportionally (a real implementation decodes,
      * resamples, re-encodes).
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = payload.clone()
      if (out.length >= 4) {
        out(0) = (w / 256).toByte; out(1) = (w % 256).toByte
        out(2) = (h / 256).toByte; out(3) = (h % 256).toByte
      }
      out
    }
  }

  /** Synthetic media table derived from `documents` (no binary columns
    * ship in the testdata): payload = utf-8 bytes of the text, kind
    * round-robins image/audio/video. Purely to exercise the plumbing.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      to_binary(col("text"), lit("utf-8")).as("payload"))

  /** Decode payload headers → typed metadata. Per-partition batch
    * iteration (the mapInPandas shape); constant memory per partition.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, f) = FakeCodec.decode(m.payload)
        MediaMeta(m.media_id, m.kind, m.payload.length.toLong, w, h, f)
      }
    }
  }

  /** Feature extraction → fixed-dim vectors, ready for the
    * [[Similarity]] operators (knn / near-dup) downstream.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      MediaFeatures(m.media_id, FakeCodec.features(m.payload, dim))))
  }

  /** Resize all image payloads; non-images pass through untouched. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind == "image") m.copy(payload = FakeCodec.resize(m.payload, w, h)) else m
    })
  }

  /** Frame sampling for videos: one output row per sampled frame index
    * (every `everyN`-th of the header-declared frame count).
    */
  def frameSample(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val (_, _, frames) = FakeCodec.decode(m.payload)
        (0 until frames by everyN).map(i => (m.media_id, m.kind, i))
      }
    }.toDF("media_id", "kind", "frame_idx")
  }

  /** Frame sampling as a driver query: every `everyN`-th frame index of
    * each video (frame count decoded from the header byte), through the
    * real [[frameSample]] mapPartitions path.
    */
  def frameSampleQuery(spark: SparkSession, docs: DataFrame, everyN: Int = 2): DataFrame = {
    import spark.implicits._
    frameSample(syntheticMedia(docs).as[MediaRow], everyN)
      .where(col("kind") === "video")
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))
      .orderBy("media_id", "frame_idx")
  }

  /** The resize pipeline as a driver query: images re-stamped to
    * (w, h) through the real [[resizeImages]] mapPartitions path, then
    * header-decoded — images read back the new dimensions, non-images
    * their original header bytes; byte counts are unchanged (the fake
    * codec clones). Everything is byte math a SQL oracle mirrors.
    */
  def mediaResizeQuery(spark: SparkSession, docs: DataFrame,
                       w: Int = 4, h: Int = 3): DataFrame = {
    import spark.implicits._
    decodeMeta(resizeImages(syntheticMedia(docs).as[MediaRow], w, h))
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("media_id")
  }

  /** 60-bit average hash (aHash) of a payload — the perceptual-hash
    * primitive behind image near-dedup: partition the byte stream into
    * 60 balanced blocks (`block(i) = i·60 div L`), set bit `59-j` when
    * block `j`'s mean exceeds the global mean. The comparison is the
    * integer cross-multiplication `s_j·L > total·c_j` (no float
    * division), and 60 bits keeps the hash inside a positive BIGINT on
    * both engines — the [[graft.operators.Dedup.simhashPairs]]
    * convention. A real deployment computes this over decoded pixel
    * luma; here it runs over the payload bytes the [[FakeCodec]]
    * "decodes" (documented stub, same plumbing).
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

  /** Perceptual-hash near-duplicate pairs over the media corpus —
    * image-level dedup, the multimodal sibling of
    * [[Dedup.simhashPairs]]: aHash per payload (codec-layer batch
    * work, the mapPartitions path), then SimHash-style pigeonhole
    * banding — 4 bands of 15 bits, Hamming ≤ `maxHam` = 3 pairs MUST
    * collide on at least one band — and an integer `bit_count(xor)`
    * verify on band-collision candidates only.
    *
    * The corpus is AUGMENTED with deterministic planted near-dups
    * (exact clones at +10M for doc_id % 97 = 0, last-byte-perturbed
    * copies at +20M for % 101 = 0) so the gate is non-vacuous at
    * every SF — the `emb_neardup_lsh` planted-oracle pattern; a
    * 1-byte change almost never moves a 60-block mean across the
    * threshold, and the oracle computes the identical plant.
    *
    * Scale shape: one hash pass over payloads, one shuffle on
    * (band, key), verify on candidates ∝ true pairs — never all-pairs.
    */
  def phashNearDup(spark: SparkSession, docs: DataFrame,
                   maxHam: Int = 3): DataFrame = {
    import spark.implicits._
    val aug = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.where(pmod(col("doc_id"), lit(97)) === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      .unionByName(docs.where(pmod(col("doc_id"), lit(101)) === 0)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          concat(expr("substring(text, 1, length(text) - 1)"), lit("z"))
            .as("text")))
    val hashes = syntheticMedia(aug).as[MediaRow]
      .mapPartitions(_.map(m => (m.media_id, aHash60(m.payload))))
      .toDF("media_id", "ahash")
      .localCheckpoint()
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

  /** Oracle-checkable metadata query over the synthetic media table:
    * byte length + kind, all derivable in plain SQL on both engines.
    */
  def mediaMeta(docs: DataFrame): DataFrame =
    syntheticMedia(docs)
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"))
      .orderBy("media_id")

  /** End-to-end media pipeline as a query: decode every payload header
    * through the per-partition batch path ([[decodeMeta]]'s shape), then
    * aggregate per kind. The decoded fields are plain header-byte math
    * (width = b0·256+b1, height = b2·256+b3, frames = max(1, b4)), so a
    * SQL oracle can reproduce them from the payload bytes — making the
    * whole decode → aggregate pipeline hash-verifiable, unlike the
    * earlier feature-checksum form whose 64-bit rolling hash no SQL
    * engine could mirror.
    */
  def mediaFeatureStats(spark: SparkSession, docs: DataFrame, dim: Int = 16): DataFrame = {
    import spark.implicits._
    // single pass: kind rides along with the per-item decode, so the
    // documents scan runs once and there is no join back
    syntheticMedia(docs).as[MediaRow]
      .mapPartitions(_.map { m =>
        val (w, h, f) = FakeCodec.decode(m.payload)
        (m.kind, w.toLong, h.toLong, f.toLong, m.payload.length.toLong)
      })
      .toDF("kind", "w", "h", "f", "nb")
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum("w").as("sum_width"),
        sum("h").as("sum_height"), sum("f").as("sum_frames"),
        sum("nb").as("sum_bytes"))
      .orderBy("kind")
  }

  /** Per-audio-item silence/energy profile — the VAD-style screen a
    * speech-data pipeline runs BEFORE paying for transcription: frames
    * of `frameBytes` samples score integer energy Σ|b−128| (the
    * deviation-from-midpoint a real PCM decoder would compute; the
    * byte read stands in for the codec exactly as in [[byteFeatures]]),
    * frames under `silentThresh` are silent, and the longest silent
    * RUN is tracked imperatively in the same per-partition pass — one
    * scan, constant memory per item, no shuffle until the final sort.
    * Emits (media_id, n_frames, n_silent, max_silent_run,
    * total_energy), all exact integers so a SQL oracle replays the
    * whole decode → frame → run-length pipeline from the raw bytes.
    */
  def silenceProfile(media: Dataset[MediaRow], frameBytes: Int = 16,
                     silentThresh: Long = 460L): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.filter(m => m.kind == "audio" && m.payload.length >= frameBytes)
        .map { m =>
          val n = m.payload.length / frameBytes
          var i = 0; var silent = 0L; var run = 0L; var maxRun = 0L
          var tot = 0L
          while (i < n) {
            var e = 0L
            var j = i * frameBytes
            val end = j + frameBytes
            while (j < end) { e += math.abs((m.payload(j) & 0xFF) - 128); j += 1 }
            tot += e
            if (e < silentThresh) {
              silent += 1; run += 1; if (run > maxRun) maxRun = run
            } else run = 0
            i += 1
          }
          (m.media_id, n.toLong, silent, maxRun, tot)
        }
    }.toDF("media_id", "n_frames", "n_silent", "max_silent_run",
        "total_energy")
      .orderBy("media_id")
  }

  /** [[silenceProfile]] as a driver query over the synthetic media
    * table (audio kind only).
    */
  def silenceProfileQuery(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    silenceProfile(syntheticMedia(docs).as[MediaRow])
  }

  /** First-`dim` payload bytes as an integer feature vector (0-padded)
    * through the real per-partition batch path — the stand-in for an
    * image-tower embedding (a real deployment swaps the byte read for
    * model inference at the same call site; schema and batch shape are
    * identical).
    */
  def byteFeatures(media: Dataset[MediaRow], dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val v = Array.tabulate(dim)(i =>
        if (m.payload.length > i) (m.payload(i) & 0xFF).toLong else 0L)
      (m.media_id, m.kind, v)
    }).toDF("media_id", "kind", "fv")
  }

  /** Cross-modal retrieval: for each of the first `nQueries` text-tower
    * embeddings, the top-`k` image-kind media items by integer dot
    * product against the byte-feature "image tower". The brute scan is
    * the oracle baseline (the knn_cosine contract); at scale the image
    * side routes through the ANN index family instead. Queries are a
    * broadcast grid-sized frame; the media side never shuffles — score,
    * rank, filter all happen partition-local until the final top-k
    * window on nQueries keys.
    */
  def crossmodalTopk(spark: SparkSession, docs: DataFrame, emb: DataFrame,
                     nQueries: Int = 20, k: Int = 3): DataFrame = {
    import spark.implicits._
    val feats = byteFeatures(syntheticMedia(docs).as[MediaRow])
      .where(col("kind") === "image")
    // guard: a <16-dim embedding would zip_with-pad with NULLs and fold
    // the whole score to NULL (while a SQL list_sum would skip them —
    // a silent cross-engine divergence); short vectors are not valid
    // queries for a 16-dim tower, so filter them out in BOTH engines
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

  // ==================================================================
  // REAL codecs (round 13): PNG via the JDK's ImageIO, WAV/PCM via a
  // hand-rolled RIFF builder/parser. Payload CONTENT is deterministic
  // doc_id arithmetic, so the oracle replays every decoded value
  // without a codec — the decode is proven by round trip.
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
    *  - video (doc_id % 3 = 2): [[FakeCodec]] header
    *    `[0, 16, 0, 9, 1 + doc_id % 9]` (16×9, that many frames)
    *    followed by the document text bytes — the one kind a bare JDK
    *    cannot really decode, kept behind the documented stub.
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

    def videoHeader(docId: Long, text: String): Array[Byte] =
      Array[Byte](0, 16, 0, 9, videoFrames(docId).toByte) ++
        text.getBytes("UTF-8")
  }

  /** The REAL media table: deterministic PNG / WAV / fake-video
    * payloads per document (see [[RealCodec]]). Encode runs on the
    * executors in the per-partition batch path — the gates pay a real
    * codec round trip, not a byte copy.
    */
  def realMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id % 3) match {
          case 0 => MediaRow(id, "image", RealCodec.encodePng(id))
          case 1 => MediaRow(id, "audio", RealCodec.encodeWav(id))
          case _ => MediaRow(id, "video", RealCodec.videoHeader(id, text))
        }
      })
  }

  /** Per-kind REAL decode → (width, height, n_frames, sig): image =
    * ImageIO dims + pixel sum; audio = WAV (n_samples, channels) +
    * Σ|s−128| energy; video = FakeCodec header, sig 0. The shared
    * decode behind the meta/stats gates.
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
        val (w, h, f) = FakeCodec.decode(m.payload)
        (w.toLong, h.toLong, f.toLong, 0L)
    }

  /** Gate: per-item decoded metadata through the real codecs. */
  def realMediaMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    realMedia(docs).mapPartitions(_.map { m =>
      val (w, h, f, _) = decodeReal(m)
      (m.media_id, m.kind, w, h, f)
    }).toDF("media_id", "kind", "width", "height", "n_frames")
      .orderBy("media_id")
  }

  /** Gate: per-kind rollup of decoded metadata + content signature
    * (image pixel sums / audio energies — values only a correct decode
    * can produce).
    */
  def realFeatureStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    realMedia(docs).mapPartitions(_.map { m =>
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
  def realResize(spark: SparkSession, docs: DataFrame,
                 tw: Int = 4, th: Int = 3): DataFrame = {
    import spark.implicits._
    realMedia(docs).mapPartitions(_.map { m =>
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
    * integer `bit_count(xor)` verify of [[phashNearDup]].
    */
  def realPhashNearDup(spark: SparkSession, docs: DataFrame,
                       maxHam: Int = 3): DataFrame = {
    import spark.implicits._
    val hashes = realMedia(docs).filter(_.kind == "image")
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
    * `bit_count(xor)` on candidates only. Shared by the payload-byte
    * and decoded-pixel phash paths.
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
    * samples (frames of `frameSamples`, energy Σ|s−128|, silent
    * < `silentThresh`, longest silent run) — [[silenceProfile]]'s
    * pipeline moved from payload bytes to the decoded sample domain.
    */
  def realSilenceProfile(spark: SparkSession, docs: DataFrame,
                         frameSamples: Int = 16,
                         silentThresh: Long = 1024L): DataFrame = {
    import spark.implicits._
    realMedia(docs).filter(_.kind == "audio")
      .mapPartitions(_.map { m =>
        val (_, _, _, s) = RealCodec.decodeWav(m.payload)
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
        (m.media_id, n.toLong, silent, maxRun, tot)
      }).toDF("media_id", "n_frames", "n_silent", "max_silent_run",
        "total_energy")
      .orderBy("media_id")
  }

  /** Gate: every `everyN`-th frame index of each video — the one kind
    * still behind [[FakeCodec]]'s header (a bare JDK cannot parse real
    * video containers).
    */
  def realFrameSample(spark: SparkSession, docs: DataFrame,
                      everyN: Int = 2): DataFrame = {
    import spark.implicits._
    frameSample(realMedia(docs).filter(_.kind == "video"), everyN)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))
      .orderBy("media_id", "frame_idx")
  }

  /** Gate: cross-modal retrieval with the image tower fed by REAL
    * decoded pixels (first 16 gray samples as the integer feature
    * vector) — [[crossmodalTopk]] with the byte stand-in replaced by
    * the codec output.
    */
  def realCrossmodalTopk(spark: SparkSession, docs: DataFrame,
                         emb: DataFrame, nQueries: Int = 20,
                         k: Int = 3): DataFrame = {
    import spark.implicits._
    val feats = realMedia(docs).filter(_.kind == "image")
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
