package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video travel as opaque `binary` columns
  * with typed metadata beside them. The Spark-side plumbing — schema,
  * partition-preserving batch iteration, deterministic feature rows — is
  * real. IMAGE decode is real too: JDK `javax.imageio` reads PNG/JPEG/GIF/
  * BMP headers with zero external dependencies ([[decodeImage]]). Audio and
  * video decode stays STUBBED (`decodeStub` — no codec libraries in this
  * container) with a deterministic fake derived from the bytes so tests are
  * reproducible; the `format` column says which path produced each row
  * ("png"/"jpeg"/… = real decode, "stub" = fallback).
  *
  * Scale notes: `mapPartitions` over a `Dataset[MediaRow]` keeps the decode
  * batch-shaped (one iterator per partition ≈ one Arrow batch per task in a
  * real decode kernel) and never materializes a partition in memory;
  * binary payloads stay off the shuffle path unless explicitly selected.
  * The image path reads only the HEADER (ImageReader.getWidth/getHeight),
  * not the pixel raster — dimensions of 100 TB of images cost a few hundred
  * bytes of IO each, not a full decode.
  */
object MultiModal {

  /** A media row: id + opaque payload + declared modality/mime. */
  final case class MediaRow(media_id: Long, modality: String, mime: String,
      content: Array[Byte])

  /** Extracted features. `format` = lowercase ImageIO format name for a
    * real image decode, "stub" for the deterministic fallback kernel.
    */
  final case class MediaFeatures(media_id: Long, modality: String,
      byte_len: Long, checksum: Long, width: Int, height: Int,
      n_frames: Int, format: String)

  /** Portable 60-bit md5 prefix (first 15 hex chars, always non-negative):
    * external engines can replay it — the q40 DuckDB oracle does.
    */
  private def md60(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Real image metadata from the bytes. */
  final case class ImageInfo(width: Int, height: Int, nFrames: Int,
      format: String)

  /** REAL image decode via JDK ImageIO: dispatches on the payload's magic
    * bytes to the matching reader (PNG/JPEG/GIF/BMP/WBMP/TIFF in a stock
    * JDK 17) and reads width/height/frame-count from the HEADER only — no
    * pixel raster is materialized. Returns None when no installed reader
    * recognizes the bytes (corrupt payload, or a format like WebP/AVIF the
    * JDK doesn't ship) — callers fall back to the stub, visibly via
    * `format = "stub"`.
    */
  def decodeImage(bytes: Array[Byte]): Option[ImageInfo] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          // seekForwardOnly=false so getNumImages(allowSearch=true) may
          // scan for GIF frame count
          r.setInput(in, false)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val n = try math.max(1, r.getNumImages(true))
            catch { case _: Exception => 1 }
          Some(ImageInfo(w, h, n, r.getFormatName.toLowerCase))
        } catch {
          case _: Exception => None // truncated/corrupt header
        } finally r.dispose()
      }
    } finally in.close()
  }

  /** STUB decode for modalities without an in-JVM codec (audio/video) and
    * for image payloads no reader recognizes: deterministic fake features
    * derived from the payload so the pipeline shape (schema, batching,
    * partitioning) is testable without codec libraries, replayable by
    * external engines via the md5-prefix checksum.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val h = md60(r.content)
    MediaFeatures(
      media_id = r.media_id,
      modality = r.modality,
      byte_len = r.content.length.toLong,
      checksum = h,
      width = 16 + (h % 1024).toInt,
      height = 16 + (h / 7 % 1024).toInt,
      n_frames = if (r.modality == "video") 1 + (h / 13 % 300).toInt else 1,
      format = "stub")
  }

  /** Decode one row: real ImageIO header decode for image payloads,
    * deterministic stub otherwise (and for undecodable image bytes — the
    * fallback is visible in `format`, never silent).
    */
  def decode(r: MediaRow): MediaFeatures =
    if (r.modality == "image")
      decodeImage(r.content) match {
        case Some(info) => MediaFeatures(r.media_id, r.modality,
          r.content.length.toLong, md60(r.content), info.width, info.height,
          info.nFrames, info.format)
        case None => decodeStub(r)
      }
    else decodeStub(r)

  /** Batch feature extraction: partition-preserving mapPartitions (the
    * Scala analog of a pandas-UDF `mapInPandas` decode), narrow — no
    * shuffle between the binary scan and the feature write.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decode))
  }

  /** Real audio metadata from the bytes. */
  final case class AudioInfo(sampleRate: Int, channels: Int, nFrames: Long,
      format: String)

  /** REAL audio header decode via JDK `javax.sound.sampled` (WAV/AIFF/AU
    * in a stock JDK, zero external deps): sample rate, channel count and
    * frame length from the container header — no sample data decoded.
    * None = no installed reader recognizes the bytes (corrupt, or a
    * compressed format like MP3/OGG the JDK doesn't ship).
    */
  def decodeAudio(bytes: Array[Byte]): Option[AudioInfo] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      Some(AudioInfo(fmt.getSampleRate.toInt, fmt.getChannels,
        aff.getFrameLength.toLong, aff.getType.toString.toLowerCase))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Typed audio features (the audio analog of [[MediaFeatures]] — audio
    * metadata doesn't shoehorn into width/height). `duration_ms` is exact
    * integer math (frames·1000/rate), replayable by external engines.
    * Undecodable payloads emit zeros with `format = "stub"` — visible,
    * never silent.
    */
  final case class AudioFeatures(media_id: Long, sample_rate: Int,
      channels: Int, n_frames: Long, duration_ms: Long, format: String)

  /** Batch audio feature extraction: same partition-preserving
    * mapPartitions shape as [[extractFeatures]], header-only reads.
    */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeAudio(r.content) match {
        case Some(a) => AudioFeatures(r.media_id, a.sampleRate, a.channels,
          a.nFrames, a.nFrames * 1000L / a.sampleRate, a.format)
        case None => AudioFeatures(r.media_id, 0, 0, 0L, 0L, "stub")
      }
    })
  }

  /** Deterministic 16-bit PCM WAV bytes — the fixture half of the audio
    * round-trip: a hand-rolled RIFF/WAVE container (44-byte canonical
    * header + a fixed sample pattern) that [[decodeAudio]]'s JDK parser
    * must read back exactly. Writer and parser are independent
    * implementations, so the round-trip cross-checks both.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0)
    val dataLen = nFrames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames * channels) {
      buf.putShort((((i * 31) & 0xffff) - 32768).toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic image bytes through the REAL ImageIO writer — the
    * fixture half of the round-trip: dimensions in, actual PNG/JPEG/GIF/BMP
    * bytes out, which [[decodeImage]] must recover exactly. The pixel fill
    * is a fixed function of (x, y) so the bytes are reproducible.
    */
  def encodeImage(width: Int, height: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, format, out))
      throw new IllegalArgumentException(s"no ImageIO writer for $format")
    out.toByteArray
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
