package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by per-partition batch
  * operators (the Scala analogue of `mapInPandas` batches: one iterator
  * per partition, vectorizable per-element work, no driver collection).
  *
  * The actual codecs are STUBBED — this container has no image/audio
  * libraries — behind [[FakeCodec]], a deterministic stand-in that
  * parses a synthetic header. Everything Spark-side is real: schemas,
  * encoders, partitioning, batch iteration, and the decode → transform
  * → feature-extract pipeline shape.
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
}
