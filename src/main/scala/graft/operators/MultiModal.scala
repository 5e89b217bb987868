package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video travel as opaque `binary` columns
  * with typed metadata beside them. The Spark-side plumbing — schema,
  * partition-preserving batch iteration, deterministic feature rows — is
  * real; the actual media decode is STUBBED (decode libraries are not in
  * this container) behind `decodeStub`, which derives a deterministic fake
  * feature vector from the bytes so tests are reproducible.
  *
  * Scale notes: `mapPartitions` over a `Dataset[MediaRow]` keeps the decode
  * batch-shaped (one iterator per partition ≈ one Arrow batch per task in a
  * real decode kernel) and never materializes a partition in memory;
  * binary payloads stay off the shuffle path unless explicitly selected.
  */
object MultiModal {

  /** A media row: id + opaque payload + declared modality/mime. */
  final case class MediaRow(media_id: Long, modality: String, mime: String,
      content: Array[Byte])

  /** Extracted features: deterministic stub of a decode+featurize kernel. */
  final case class MediaFeatures(media_id: Long, modality: String,
      byte_len: Long, checksum: Long, width: Int, height: Int,
      n_frames: Int)

  /** STUB decode: a real implementation would decode the media and emit
    * true dimensions / frame counts. This derives them deterministically
    * from the payload so the pipeline shape (schema, batching,
    * partitioning) is testable without codec libraries. The checksum is the
    * PORTABLE 60-bit md5 prefix (first 15 hex chars as an integer, always
    * non-negative) so external engines can replay every derived feature —
    * the q40 DuckDB oracle does exactly that.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.content).map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    MediaFeatures(
      media_id = r.media_id,
      modality = r.modality,
      byte_len = r.content.length.toLong,
      checksum = h,
      width = 16 + (h % 1024).toInt,
      height = 16 + (h / 7 % 1024).toInt,
      n_frames = if (r.modality == "video") 1 + (h / 13 % 300).toInt else 1)
  }

  /** Batch feature extraction: partition-preserving mapPartitions (the
    * Scala analog of a pandas-UDF `mapInPandas` decode), narrow — no
    * shuffle between the binary scan and the feature write.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling plan for video: every `stride`-th frame index up to
    * `maxFrames` — metadata-only expansion; the heavy per-frame decode
    * happens in the downstream kernel, one task per (video, frame-batch).
    */
  def sampleFrameIndexes(features: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    features.filter(col("modality") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), least(col("n_frames") - 1, lit((maxFrames - 1).toLong * stride)), lit(stride))))

  /** Build a synthetic media table from any text table (documents stand in
    * for real blobs in tests: bytes = utf-8 of the text).
    */
  def fromText(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      when(col(idCol) % 3 === 0, lit("image"))
        .when(col(idCol) % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("modality"),
      lit("application/octet-stream").as("mime"),
      encode(col(textCol), "UTF-8").as("content")).as[MediaRow]
  }
}
