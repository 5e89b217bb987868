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

  /** STUB decode for payloads no real kernel recognizes: deterministic
    * fake dimensions derived from the payload so the pipeline shape
    * (schema, batching, partitioning) is testable without codec libraries,
    * replayable by external engines via the md5-prefix checksum. The stub
    * NEVER fabricates frame counts — `n_frames` is a constant 1, and the
    * `format = "stub"` column marks every such row as un-decoded.
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
      n_frames = 1,
      format = "stub")
  }

  /** Decode one row: real ImageIO header decode for image payloads, real
    * ISO-BMFF box parse for video payloads ([[decodeVideo]]), deterministic
    * stub otherwise (and for undecodable bytes — the fallback is visible in
    * `format`, never silent).
    */
  def decode(r: MediaRow): MediaFeatures = r.modality match {
    case "image" =>
      decodeImage(r.content) match {
        case Some(info) => MediaFeatures(r.media_id, r.modality,
          r.content.length.toLong, md60(r.content), info.width, info.height,
          info.nFrames, info.format)
        case None => decodeStub(r)
      }
    case "video" =>
      decodeVideo(r.content) match {
        case Some(info) => MediaFeatures(r.media_id, r.modality,
          r.content.length.toLong, md60(r.content), info.width, info.height,
          math.min(info.nFrames, Int.MaxValue).toInt, info.brand)
        case None => decodeStub(r)
      }
    case _ => decodeStub(r)
  }

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

  // --------------------------------------------------------------- video

  /** Real video container metadata from an MP4/ISO-BMFF header (no frame
    * pixels touched): movie duration, track count, the visual track's
    * presentation size, and its sample (frame) count from the `stts` table.
    * `brand` is the `ftyp` major brand ("isom", "mp42", …).
    */
  final case class VideoInfo(durationMs: Long, nTracks: Int, width: Int,
      height: Int, nFrames: Long, brand: String)

  // NoStackTrace: undecodable payloads are the EXPECTED path for stub
  // rows (a third of q40's corpus) — filling in a stack trace per row
  // would be exception-as-control-flow cost in the hot decode loop
  private final class Mp4ParseError(msg: String)
    extends RuntimeException(msg) with scala.util.control.NoStackTrace

  /** One ISO-BMFF box: type + payload range [start, end) in the buffer.
    * Handles 32-bit sizes, the `size == 1` largesize escape, and the
    * `size == 0` to-end-of-enclosing-range form.
    */
  private def mp4Children(buf: java.nio.ByteBuffer, start: Int, end: Int):
      Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var pos = start
    while (pos < end) {
      if (end - pos < 8) throw new Mp4ParseError(s"truncated box header at $pos")
      val size32 = buf.getInt(pos).toLong & 0xffffffffL
      val tpe = new String(Array(buf.get(pos + 4), buf.get(pos + 5),
        buf.get(pos + 6), buf.get(pos + 7)), "US-ASCII")
      val (payloadStart, boxEnd) =
        if (size32 == 1L) {
          if (end - pos < 16) throw new Mp4ParseError("truncated largesize")
          val large = buf.getLong(pos + 8)
          // compare as `large > end - pos` — `pos + large` overflows Long
          // for crafted sizes near Long.MaxValue, letting boxEnd move
          // BACKWARD and the walk loop forever on untrusted bytes
          if (large < 16 || large > end - pos)
            throw new Mp4ParseError(s"bad largesize $large")
          (pos + 16, pos + large.toInt)
        } else if (size32 == 0L) (pos + 8, end) // extends to range end
        else {
          if (size32 < 8 || pos + size32 > end)
            throw new Mp4ParseError(s"bad box size $size32 for $tpe")
          (pos + 8, pos + size32.toInt)
        }
      out += ((tpe, payloadStart, boxEnd))
      pos = boxEnd
    }
    out.result()
  }

  private def findBox(children: Seq[(String, Int, Int)], tpe: String):
      Option[(Int, Int)] =
    children.collectFirst { case (`tpe`, s, e) => (s, e) }

  /** REAL MP4/ISO-BMFF header parse, pure JVM, zero dependencies — the
    * same header-only discipline as the ImageIO and sound-stack kernels:
    * walks the box tree (`ftyp` → brand; `moov/mvhd` → timescale +
    * duration, both version 0 and version 1 layouts; `moov/trak` →
    * track count; the `vide`-handler track's `tkhd` → 16.16-fixed
    * presentation size, v0 and v1; its `stbl/stts` → sample-count sum =
    * frame count). Returns None for bytes that are not a well-formed
    * MP4 header — callers fall back to the stub, visibly via
    * `format = "stub"`. The `mdat` payload is never read: 100 TB of video
    * costs a few KB of moov bytes per file, not a decode.
    */
  def decodeVideo(bytes: Array[Byte]): Option[VideoInfo] =
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      val top = mp4Children(buf, 0, bytes.length)
      val (ftypS, ftypE) = findBox(top, "ftyp")
        .getOrElse(throw new Mp4ParseError("no ftyp box"))
      if (ftypE - ftypS < 8) throw new Mp4ParseError("short ftyp")
      val brand = new String(Array(buf.get(ftypS), buf.get(ftypS + 1),
        buf.get(ftypS + 2), buf.get(ftypS + 3)), "US-ASCII").trim
      val (moovS, moovE) = findBox(top, "moov")
        .getOrElse(throw new Mp4ParseError("no moov box"))
      val moov = mp4Children(buf, moovS, moovE)

      val (mvhdS, mvhdE) = findBox(moov, "mvhd")
        .getOrElse(throw new Mp4ParseError("no mvhd box"))
      val mvhdVer = buf.get(mvhdS) & 0xff
      val (timescale, duration) =
        if (mvhdVer == 1) {
          if (mvhdE - mvhdS < 32) throw new Mp4ParseError("short mvhd v1")
          (buf.getInt(mvhdS + 20).toLong & 0xffffffffL, buf.getLong(mvhdS + 24))
        } else {
          if (mvhdE - mvhdS < 20) throw new Mp4ParseError("short mvhd v0")
          (buf.getInt(mvhdS + 12).toLong & 0xffffffffL,
            buf.getInt(mvhdS + 16).toLong & 0xffffffffL)
        }
      if (timescale == 0) throw new Mp4ParseError("zero mvhd timescale")

      val traks = moov.collect { case ("trak", s, e) => (s, e) }
      if (traks.isEmpty) throw new Mp4ParseError("no trak boxes")

      // the visual track: handler 'vide' in trak/mdia/hdlr, else the first
      // track whose tkhd has a nonzero presentation size
      def trakParts(s: Int, e: Int) = {
        val kids = mp4Children(buf, s, e)
        val tkhd = findBox(kids, "tkhd")
        val mdia = findBox(kids, "mdia").map { case (ms, me) =>
          mp4Children(buf, ms, me) }
        val handler = mdia.flatMap(findBox(_, "hdlr")).map { case (hs, he) =>
          if (he - hs < 12) throw new Mp4ParseError("short hdlr")
          new String(Array(buf.get(hs + 8), buf.get(hs + 9),
            buf.get(hs + 10), buf.get(hs + 11)), "US-ASCII")
        }
        (tkhd, mdia, handler)
      }
      def tkhdSize(tkS: Int, tkE: Int): (Int, Int) = {
        val ver = buf.get(tkS) & 0xff
        val off = if (ver == 1) 88 else 76
        if (tkE - tkS < off + 8) throw new Mp4ParseError("short tkhd")
        (buf.getInt(tkS + off) >>> 16, buf.getInt(tkS + off + 4) >>> 16)
      }
      val parsed = traks.map { case (s, e) => trakParts(s, e) }
      val visual = parsed.find(_._3.contains("vide")).orElse(
        parsed.find(_._1.exists { case (tkS, tkE) =>
          val (w, h) = tkhdSize(tkS, tkE); w > 0 && h > 0 }))
      val (width, height) = visual.flatMap(_._1) match {
        case Some((tkS, tkE)) => tkhdSize(tkS, tkE)
        case None => (0, 0)
      }
      // frame count: Σ sample_count over the visual track's stts entries
      val nFrames = visual.flatMap(_._2).flatMap { mdiaKids =>
        findBox(mdiaKids, "minf").map { case (s, e) => mp4Children(buf, s, e) }
          .flatMap(findBox(_, "stbl"))
          .map { case (s, e) => mp4Children(buf, s, e) }
          .flatMap(findBox(_, "stts"))
          .map { case (s, e) =>
            if (e - s < 8) throw new Mp4ParseError("short stts")
            val entries = buf.getInt(s + 4)
            if (entries < 0 || s + 8 + entries.toLong * 8 > e)
              throw new Mp4ParseError(s"bad stts entry count $entries")
            var sum = 0L
            var i = 0
            while (i < entries) {
              sum += buf.getInt(s + 8 + i * 8).toLong & 0xffffffffL
              i += 1
            }
            sum
          }
      }.getOrElse(0L)

      // Overflow-guarded like the largesize/stts paths: a corrupt v1 mvhd
      // with duration near Long.MaxValue must fall to the stub, not yield a
      // garbage/negative durationMs.
      val durationMs =
        try Math.multiplyExact(duration, 1000L) / timescale
        catch { case _: ArithmeticException =>
          throw new Mp4ParseError(s"mvhd duration overflow: $duration") }
      Some(VideoInfo(durationMs, traks.size, width, height,
        nFrames, brand))
    } catch {
      case _: Mp4ParseError | _: IndexOutOfBoundsException => None
    }

  /** Typed video features (the video analog of [[AudioFeatures]]).
    * Unparseable payloads emit zeros with `format = "stub"` — visible,
    * never fabricated.
    */
  final case class VideoFeatures(media_id: Long, duration_ms: Long,
      n_tracks: Int, width: Int, height: Int, n_frames: Long, format: String)

  /** Batch video feature extraction: same partition-preserving
    * mapPartitions shape as [[extractFeatures]], moov-header-only reads.
    */
  def extractVideoFeatures(media: Dataset[MediaRow]): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeVideo(r.content) match {
        case Some(v) => VideoFeatures(r.media_id, v.durationMs, v.nTracks,
          v.width, v.height, v.nFrames, v.brand)
        case None => VideoFeatures(r.media_id, 0L, 0, 0, 0, 0L, "stub")
      }
    })
  }

  /** Deterministic MP4 bytes — the fixture half of the video round-trip: a
    * hand-rolled ISO-BMFF tree (`ftyp` + `moov[mvhd, trak[tkhd,
    * mdia[mdhd, hdlr, minf[stbl[stts]]]]…]` + a token `mdat`) that
    * [[decodeVideo]] must read back exactly. Writer and parser are
    * independent implementations, so the round-trip cross-checks both.
    * `version1` exercises the 64-bit mvhd/tkhd layouts.
    */
  def encodeMp4(durationMs: Long, width: Int, height: Int, nFrames: Long,
      withAudioTrack: Boolean = false, timescale: Int = 1000,
      version1: Boolean = false): Array[Byte] = {
    require(durationMs >= 0 && width > 0 && height > 0 && nFrames >= 0)
    require(timescale > 0)
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val buf = java.nio.ByteBuffer.allocate(len)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      buf.putInt(len).put(tpe.getBytes("US-ASCII"))
      payload.foreach(buf.put)
      buf.array()
    }
    def be32(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .putInt((v & 0xffffffffL).toInt).array()
    def be64(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(8)
      .putLong(v).array()
    def be16(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(2)
      .putShort(v.toShort).array()
    val unityMatrix = Array(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L)
      .flatMap(be32)
    val duration = durationMs * timescale / 1000L

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))
    val mvhd =
      if (version1) box("mvhd", Array(1.toByte, 0, 0, 0), be64(0), be64(0),
        be32(timescale.toLong), be64(duration), be32(0x10000L), be16(0x100),
        be16(0), be64(0), unityMatrix, Array.fill(24)(0.toByte), be32(2))
      else box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
        be32(timescale.toLong), be32(duration), be32(0x10000L), be16(0x100),
        be16(0), be64(0), unityMatrix, Array.fill(24)(0.toByte), be32(2))
    def tkhd(trackId: Int, w: Int, h: Int) =
      if (version1) box("tkhd", Array(1.toByte, 0, 0, 7), be64(0), be64(0),
        be32(trackId.toLong), be32(0), be64(duration), be64(0), be16(0),
        be16(0), be16(0), be16(0), unityMatrix,
        be32(w.toLong << 16), be32(h.toLong << 16))
      else box("tkhd", Array[Byte](0, 0, 0, 7), be32(0), be32(0),
        be32(trackId.toLong), be32(0), be32(duration), be64(0), be16(0),
        be16(0), be16(0), be16(0), unityMatrix,
        be32(w.toLong << 16), be32(h.toLong << 16))
    def mdhd = box("mdhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(timescale.toLong), be32(duration), be16(0x55c4), be16(0))
    def hdlr(handler: String) = box("hdlr", Array[Byte](0, 0, 0, 0),
      be32(0), handler.getBytes("US-ASCII"), Array.fill(12)(0.toByte),
      Array(0.toByte))
    def stts(frames: Long) = box("stts", Array[Byte](0, 0, 0, 0), be32(1),
      be32(frames), be32(1))
    def trak(trackId: Int, handler: String, w: Int, h: Int, frames: Long) =
      box("trak", tkhd(trackId, w, h),
        box("mdia", mdhd, hdlr(handler),
          box("minf", box("stbl", stts(frames)))))

    val traks = Seq(trak(1, "vide", width, height, nFrames)) ++
      (if (withAudioTrack) Seq(trak(2, "soun", 0, 0, nFrames * 2)) else Nil)
    val moov = box("moov", (mvhd +: traks): _*)
    val mdat = box("mdat", Array.fill(8)(0x42.toByte))
    ftyp ++ moov ++ mdat
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
    // n_frames >= 1 guard: the real decoder can emit 0 frames (fragmented
    // MP4s keep sample counts in moof/trun, leaving moov's stts empty) and
    // sequence(0, -1, stride) is an execution-time error, not an empty
    // array — a zero-frame video simply has nothing to sample
    features.filter(col("modality") === "video" && col("n_frames") >= 1)
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
