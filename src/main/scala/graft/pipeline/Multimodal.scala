package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: opaque binary payloads + typed metadata, with the
  * Spark-side plumbing (schema, partitioning, batched per-partition
  * transforms) real and tested.
  *
  * The actual codecs (image decode, audio resample, video frame extract)
  * are NOT available in this environment — the decode step is a
  * clearly-marked DETERMINISTIC STUB (`stubDecode`) with the same
  * signature/batch shape a real codec (e.g. via JNI or `mapInPandas` on
  * the PySpark side) would have. Swap `stubDecode` for a real codec and
  * nothing else changes.
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  final case class MediaMeta(format: String, width: Int, height: Int,
      durationMs: Long)

  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, format: String,
      payload_len: Long, feature: Array[Float])

  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  val mediaSchema: StructType = Encoders.product[MediaRow].schema

  /** Build a synthetic media table from the documents frame: payload =
    * utf-8 text bytes standing in for an encoded image; metadata derived
    * deterministically. Real pipelines read (path, bytes) from parquet
    * with exactly this shape.
    */
  def syntheticMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      struct(
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        (pmod(col("doc_id"), lit(4)) * 64 + 64).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(3)) * 64 + 64).cast(IntegerType).as("height"),
        (length(col("text")) * 10).cast(LongType).as("durationMs")).as("meta"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** DETERMINISTIC STUB for the decode + feature-extract step.
    *
    * A real implementation decodes `payload` with an image/audio codec
    * and runs a feature extractor; none ship in this container, so this
    * derives `dim` pseudo-features from a rolling byte hash — stable
    * across runs/executors, same output schema and batch shape as the
    * real thing.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic seed
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      i += 1
      if (i % 16 == 0 || i == payload.length) {
        val slot = (i / 16) % dim
        out(slot) = ((h % 1000003L).toFloat / 1000003f)
      }
    }
    out
  }

  /** Batched per-partition feature extraction — the Scala analog of a
    * pandas-UDF `mapInPandas` stage: one iterator in, one iterator out,
    * no per-row task overhead, partitioning preserved.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.meta.format, r.payload.length.toLong,
          stubDecode(r.payload, dim))
      }
    }
  }

  /** Frame sampling: split the payload into fixed-size chunks ("frames")
    * and emit every `stride`-th one. Real video pipelines replace the
    * chunking with codec frame extraction; the explode shape is the same.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
      stride: Int = 2): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 => MediaFrame(r.media_id, idx, chunk)
      }
    }
  }

  /** Summary frame for the correctness gate: one row per media item with
    * deterministic stats over the stub pipeline.
    */
  def summary(docs: DataFrame): DataFrame = {
    val media = syntheticMediaTable(docs)
    val feats = extractFeatures(media, dim = 8)
    val frames = sampleFrames(media)
    val frameCounts = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"))
    feats.join(frameCounts, Seq("media_id"), "left_outer")
      .select(col("media_id"), col("format"), col("payload_len"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        round(element_at(col("feature"), 1).cast(DoubleType), 6).as("f0"))
      .orderBy("media_id")
  }
}
