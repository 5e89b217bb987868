package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video travel as opaque `binary` columns
  * with typed metadata beside them. Decode is REAL across all three
  * modalities, pure JVM, zero codec dependencies: images via JDK
  * `javax.imageio` header reads ([[decodeImage]]) plus full-raster pixel
  * decode ([[decodeRaster]]); audio via JDK `javax.sound.sampled` headers
  * ([[decodeAudio]]) and sample statistics ([[decodeAudioSampleStats]]);
  * video via a from-scratch ISO-BMFF box parser ([[decodeVideo]]), raw
  * uncompressed frame extraction ([[extractFrameBytes]]) and a QuickTime
  * Animation ("rle ") entropy decoder with stateful inter-frame temporal
  * compositing ([[extractFramePixels]] / `decodeQtRleFrame`). What remains
  * a deployment seam is H.264-class entropy decode — the
  * `extractFrameBytes`/`extractFramePixels` dispatch is where a JNI codec
  * binding would slot in, proven by two shipped codec classes (raw + RLE).
  * [[decodeStub]] survives only as the visible fallback for payloads no
  * kernel recognizes (`format = "stub"`, never silent) and for modalities
  * a caller didn't ask decoded.
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

  // ImageIO's default stream cache is FILE-backed: every encode/decode
  // of an in-memory payload spills through a fresh temp file — pure
  // overhead for the byte-array payloads this module handles, and a
  // disk/lock contention point once the media kernels fan out across
  // cores (r17: the q40 family's parallel decode regressed 30–100% on
  // the file cache before this). Memory-backed caches are strictly
  // right here: payloads are bounded by maxImagePixels below. Set once
  // per JVM at class load — executors load this object before any
  // kernel runs.
  javax.imageio.ImageIO.setUseCache(false)

  // The JDK resolves its AudioFileReader providers on EVERY
  // AudioSystem.getAudioFileFormat / getAudioInputStream call (a
  // synchronized registry lookup in the sound stack), which SERIALIZED
  // the audio kernels under fan-out — the r17 A/B read the 32-way
  // parallel scan 2× slower than a single core through AudioSystem.
  // Resolve the providers ONCE per JVM and dispatch with AudioSystem's
  // own first-reader-wins semantics: the bytes still go through the
  // same independent JDK parsers (the WAV writer/parser round-trip
  // cross-check is unchanged), the per-call path is now lock-free. The
  // provider instances are the same stateless parser objects
  // AudioSystem itself shares across all callers.
  private lazy val audioFileReaders
      : Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    // MIDI probers LAST: SoftMidiAudioFileReader's recognition probe
    // routes through MidiSystem.getSequence → JDK13Services → a
    // class-level SYNCHRONIZED provider lookup PER CALL — thread dumps
    // under a 32-thread decode showed every thread blocked on that
    // monitor (the convoy that made parallel audio slower than one
    // core). Container magics are disjoint (RIFF/FORM/.snd vs MThd), so
    // first-success-wins returns the identical reader for any input;
    // non-MIDI payloads now never enter the locked probe.
    val (midi, rest) = b.result().partition(
      _.getClass.getName.toLowerCase.contains("midi"))
    rest ++ midi
  }

  /** `AudioSystem.getAudioFileFormat` minus the per-call provider
    * lookup: first reader that recognizes the bytes wins; the same
    * UnsupportedAudioFileException if none does. A fresh
    * ByteArrayInputStream per attempt replaces the mark/reset contract
    * AudioSystem demands of providers.
    */
  private def audioFileFormat(bytes: Array[Byte])
      : javax.sound.sampled.AudioFileFormat = {
    audioFileReaders.foreach { r =>
      try return r.getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no installed reader recognizes the bytes")
  }

  /** `AudioSystem.getAudioInputStream`, same cached-provider dispatch. */
  private def audioInputStream(bytes: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    audioFileReaders.foreach { r =>
      try return r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no installed reader recognizes the bytes")
  }

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
    // audio INTENTIONALLY routes to the stub here: this dispatch feeds
    // q40's image/video-shaped feature schema (width/height/frames), which
    // audio doesn't have — the real audio path is [[decodeAudio]] /
    // [[decodeAudioSampleStats]] with its own (rate, channels, frames)
    // schema, oracle-checked by the dedicated audio queries (q40c/q40g).
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
      val aff = audioFileFormat(bytes)
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
      // v0 reads duration unsigned; v1's 64-bit field is signed, and a
      // corrupt negative duration must fall to the stub, not emit a
      // negative durationMs that multiplyExact below would wave through
      if (duration < 0) throw new Mp4ParseError(s"negative mvhd duration $duration")

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

  // ------------------------------------------- pixel / sample level

  /** One ceiling for every untrusted-dimension raster allocation in this
    * module (ImageIO decode AND the QT RLE composite state): 64 MP ≈
    * 256 MB ARGB, far above any real fixture, far below a task-killing
    * allocation. Declared dims past it degrade to the stub row.
    */
  val MaxRasterPixels: Long = 64L * 1024 * 1024

  /** REAL full-raster image decode via JDK ImageIO (PNG/GIF/BMP lossless,
    * JPEG lossy): the pixel-level complement of the header-only
    * [[decodeImage]]. Returns the raster plus the reader's format name;
    * None for bytes no installed reader decodes — callers emit the visible
    * stub row, never fabricated pixels.
    *
    * Untrusted-input guard: the declared dimensions are read header-only
    * (`getWidth(0)`/`getHeight(0)` never touch pixel data) BEFORE `read(0)`
    * allocates ~w·h·4 bytes. A crafted header declaring huge dimensions
    * would otherwise raise OutOfMemoryError — an Error, not an Exception,
    * so it would escape the catch and kill the executor task instead of
    * degrading to the stub row. Payloads past `maxPixels` (default 64 MP ≈
    * 256 MB ARGB, far above any real fixture) return None like any other
    * undecodable input.
    */
  def decodeRaster(bytes: Array[Byte], maxPixels: Long = MaxRasterPixels):
      Option[(java.awt.image.BufferedImage, String)] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in, false)
          val declared = r.getWidth(0).toLong * r.getHeight(0).toLong
          if (declared <= 0 || declared > maxPixels) None
          else Some((r.read(0), r.getFormatName.toLowerCase))
        } catch {
          case _: Exception => None
        } finally r.dispose()
      }
    } finally in.close()
  }

  /** Pixel-level features over one decoded raster. `sum_rgb` is the exact
    * integer sum of all R+G+B channel bytes; `ahash` is a 64-character
    * '0'/'1' block-mean perceptual hash: the image quantizes to an 8×8
    * grid (pixel (x,y) → cell (x·8/w, y·8/h), integer division), and a
    * cell's bit is set iff its mean luminance exceeds the global mean —
    * compared by cross-multiplication (`cellSum·area > total·cellCnt`), so
    * the hash is integer-exact and replayable by any engine, with no
    * division or float rounding. Emitted as a bit-string because bit 63
    * would overflow a signed 64-bit pack.
    */
  final case class PixelFeatures(media_id: Long, width: Int, height: Int,
      sum_rgb: Long, ahash: String, format: String)

  private def pixelFeaturesOf(id: Long, img: java.awt.image.BufferedImage,
      format: String): PixelFeatures =
    pixelFeaturesOfRaster(id, img.getWidth, img.getHeight,
      (x, y) => img.getRGB(x, y), format)

  /** The shared feature accumulation over any pixel source — ImageIO
    * rasters and codec-decoded int rasters run the IDENTICAL arithmetic,
    * so a frame decoded by the RLE path hashes exactly like the same
    * raster decoded from a PNG. `rgbAt` returns packed RGB; only the low
    * 24 bits participate (alpha ignored, matching BufferedImage.getRGB
    * usage).
    */
  private def pixelFeaturesOfRaster(id: Long, w: Int, h: Int,
      rgbAt: (Int, Int) => Int, format: String): PixelFeatures = {
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val iy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = rgbAt(x, y)
        val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val k = iy * 8 + x * 8 / w
        cellSum(k) += lum
        cellCnt(k) += 1
        total += lum
        x += 1
      }
      y += 1
    }
    // cross-multiplication bound: cellSum·area ≤ 765·(wh)² — exact in a
    // long up to wh ≈ 1.1e8 pixels (~10K×10K). Past that the products
    // would wrap SILENTLY and corrupt hash bits, so huge rasters switch
    // to BigInt for the 64 comparisons (negligible next to the pixel
    // loop) instead of breaking the integer-exact contract.
    val area = w.toLong * h
    val exactInLong = area <= 100000000L
    val bits = new java.lang.StringBuilder(64)
    var k = 0
    while (k < 64) {
      val bit =
        if (exactInLong) cellSum(k) * area > total * cellCnt(k)
        else BigInt(cellSum(k)) * area > BigInt(total) * cellCnt(k)
      bits.append(if (bit) '1' else '0')
      k += 1
    }
    PixelFeatures(id, w, h, total, bits.toString, format)
  }

  /** Batch pixel-feature extraction: REAL raster decode per row (the
    * thumbnail/perceptual-hash path a multimodal pipeline runs after the
    * cheap header triage), same partition-preserving mapPartitions shape
    * as [[extractFeatures]]. Undecodable payloads emit zeros with
    * `format = "stub"` and an empty hash — visible, never fabricated.
    */
  def extractPixelFeatures(media: Dataset[MediaRow]): Dataset[PixelFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeRaster(r.content) match {
        case Some((img, fmt)) => pixelFeaturesOf(r.media_id, img, fmt)
        case None => PixelFeatures(r.media_id, 0, 0, 0L, "", "stub")
      }
    })
  }

  /** Sample-level audio features: exact integer sum and peak |amplitude|
    * over the REAL decoded 16-bit PCM samples (JDK sound stack — the
    * sample-access complement of the header-only [[decodeAudio]]).
    */
  final case class AudioSampleFeatures(media_id: Long, n_samples: Long,
      sum_samples: Long, peak: Int, format: String)

  /** Decode every PCM sample of one payload and fold sum/peak/count in a
    * fixed-size streaming pass (no sample array materializes — a 100 TB
    * audio corpus streams through a few KB of buffer per task). None for
    * non-PCM-16 payloads or bytes the JDK doesn't recognize.
    */
  def decodeAudioSampleStats(bytes: Array[Byte]):
      Option[(Long, Long, Int, String)] =
    try {
      val tpe = audioFileFormat(bytes).getType.toString.toLowerCase
      val ais = audioInputStream(bytes)
      try {
        val fmt = ais.getFormat
        val pcm16 = fmt.getSampleSizeInBits == 16 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!pcm16) None
        else {
          val le = !fmt.isBigEndian
          val buf = new Array[Byte](8192)
          var pending = -1 // first byte of a sample split across reads
          var n = 0L; var sum = 0L; var peak = 0
          var read = ais.read(buf)
          while (read > 0) {
            var i = 0
            while (i < read) {
              if (pending < 0) pending = buf(i) & 0xff
              else {
                val b2 = buf(i) & 0xff
                val s = (if (le) (b2 << 8) | pending
                  else (pending << 8) | b2).toShort
                n += 1; sum += s; peak = math.max(peak, math.abs(s.toInt))
                pending = -1
              }
              i += 1
            }
            read = ais.read(buf)
          }
          // Truncated-payload guard: a payload cut mid-sample must flag a
          // parse failure (stub row), never report clean stats. Two
          // detectors because the JDK stream is frame-aligned — it
          // usually WITHHOLDS a trailing odd byte rather than hand it
          // over (then `pending` never trips), so also compare decoded
          // samples against the header's declared frame count when the
          // format specifies one.
          val declared = ais.getFrameLength
          val shortRead = declared != javax.sound.sampled.AudioSystem.NOT_SPECIFIED &&
            declared >= 0 && n != declared * fmt.getChannels
          if (pending >= 0 || shortRead) None else Some((n, sum, peak, tpe))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Batch audio sample extraction (see [[decodeAudioSampleStats]]). */
  def extractAudioSamples(media: Dataset[MediaRow]): Dataset[AudioSampleFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeAudioSampleStats(r.content) match {
        case Some((n, sum, peak, fmt)) =>
          AudioSampleFeatures(r.media_id, n, sum, peak, fmt)
        case None => AudioSampleFeatures(r.media_id, 0L, 0L, 0, "stub")
      }
    })
  }

  /** Byte ranges of the visual track's samples (frames), resolved from the
    * REAL ISO-BMFF sample tables — `stsz` (per-sample sizes, uniform or
    * per-entry), `stsc` (samples-per-chunk runs), `stco`/`co64` (chunk
    * offsets): the exact walk a frame extractor performs before handing
    * each frame's bytes to a codec. Returns (offset, size) per frame in
    * sample order; None when the payload is not a well-formed MP4 with a
    * complete, in-bounds sample table. Only the requested frames' byte
    * ranges are touched downstream — the box walk itself never reads
    * `mdat`.
    */
  def videoFrameRanges(bytes: Array[Byte]): Option[Seq[(Long, Int)]] =
    videoSampleTable(bytes).map(_.ranges)

  /** Everything the per-frame decode fan-out needs from ONE box walk:
    * codec fourcc (None when stsd is absent/short — the ranges are still
    * the ranges), tkhd presentation dims (0×0 when tkhd is absent/short),
    * and the frame byte ranges. [[extractFramePixels]] dispatches per ROW,
    * so re-walking the container per fact (ranges, then codec, then dims
    * for the stateful path) would double or triple the metadata-parse
    * cost of a 100 TB media sweep; [[videoFrameRanges]] and
    * [[videoFrameCodec]] remain the public single-fact views.
    */
  private final case class VideoSampleTable(codec: Option[String],
      width: Int, height: Int, ranges: Seq[(Long, Int)])

  /** The `vide`-handler track's stbl children plus that trak's own
    * children — ONE resolution of the visual sample table shared by
    * [[videoSampleTable]] and [[videoFrameCodec]] (hand-rolled copies of
    * this walk would silently diverge on the next leniency fix). Throws
    * [[Mp4ParseError]] when no vide trak carries an stbl.
    */
  private def videoVideStbl(buf: java.nio.ByteBuffer, bytes: Array[Byte]):
      (Seq[(String, Int, Int)], Seq[(String, Int, Int)]) = {
    val top = mp4Children(buf, 0, bytes.length)
    val (moovS, moovE) = findBox(top, "moov")
      .getOrElse(throw new Mp4ParseError("no moov box"))
    mp4Children(buf, moovS, moovE)
      .collect { case ("trak", s, e) => mp4Children(buf, s, e) }
      .flatMap { kids =>
        val mdia = findBox(kids, "mdia").map { case (ms, me) =>
          mp4Children(buf, ms, me) }
        val handler = mdia.flatMap(findBox(_, "hdlr")).map { case (hs, he) =>
          if (he - hs < 12) throw new Mp4ParseError("short hdlr")
          new String(Array(buf.get(hs + 8), buf.get(hs + 9),
            buf.get(hs + 10), buf.get(hs + 11)), "US-ASCII")
        }
        if (!handler.contains("vide")) None
        else mdia.flatMap(findBox(_, "minf"))
          .map { case (s, e) => mp4Children(buf, s, e) }
          .flatMap(findBox(_, "stbl"))
          .map { case (s, e) => (mp4Children(buf, s, e), kids) }
      }.headOption.getOrElse(throw new Mp4ParseError("no vide stbl"))
  }

  private def videoSampleTable(bytes: Array[Byte]): Option[VideoSampleTable] =
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      val (stbl, vkids) = videoVideStbl(buf, bytes)
      // codec + dims are OPTIONAL side facts of the same walk: their
      // absence (or a short/truncated box) must not fail the ranges —
      // that keeps this parse exactly as permissive as the pre-round-13
      // videoFrameRanges, which never looked at stsd or tkhd
      val codec = findBox(stbl, "stsd").flatMap { case (sdS, sdE) =>
        if (sdE - sdS < 8 || buf.getInt(sdS + 4) < 1) None
        else try mp4Children(buf, sdS + 8, sdE).headOption.map(_._1)
        catch { case _: Mp4ParseError => None }
      }
      val (width, height) = findBox(vkids, "tkhd").map { case (tkS, tkE) =>
        if (tkE - tkS < 1) (0, 0) // empty tkhd: dims unknown, ranges intact
        else {
          val ver = buf.get(tkS) & 0xff
          val off = if (ver == 1) 88 else 76
          if (tkE - tkS < off + 8) (0, 0)
          else (buf.getInt(tkS + off) >>> 16, buf.getInt(tkS + off + 4) >>> 16)
        }
      }.getOrElse((0, 0))

      // stsz: ver/flags, uniform sample_size (0 = per-entry table), count
      val (szS, szE) = findBox(stbl, "stsz")
        .getOrElse(throw new Mp4ParseError("no stsz"))
      if (szE - szS < 12) throw new Mp4ParseError("short stsz")
      val uniform = buf.getInt(szS + 4)
      val nSamples = buf.getInt(szS + 8)
      if (nSamples < 0 || nSamples > 10000000)
        throw new Mp4ParseError(s"bad stsz count $nSamples")
      if (uniform == 0 && szS + 12 + nSamples.toLong * 4 > szE)
        throw new Mp4ParseError("truncated stsz table")
      def sizeOf(i: Int): Int = {
        val s = if (uniform != 0) uniform else buf.getInt(szS + 12 + i * 4)
        if (s < 0) throw new Mp4ParseError(s"negative sample size $s")
        s
      }

      // chunk offsets: stco (32-bit) or co64
      val offsets: IndexedSeq[Long] = findBox(stbl, "stco") match {
        case Some((s, e)) =>
          if (e - s < 8) throw new Mp4ParseError("short stco")
          val n = buf.getInt(s + 4)
          if (n < 0 || s + 8 + n.toLong * 4 > e)
            throw new Mp4ParseError(s"bad stco count $n")
          (0 until n).map(i => buf.getInt(s + 8 + i * 4).toLong & 0xffffffffL)
        case None =>
          val (s, e) = findBox(stbl, "co64")
            .getOrElse(throw new Mp4ParseError("no stco/co64"))
          if (e - s < 8) throw new Mp4ParseError("short co64")
          val n = buf.getInt(s + 4)
          if (n < 0 || s + 8 + n.toLong * 8 > e)
            throw new Mp4ParseError(s"bad co64 count $n")
          (0 until n).map(i => buf.getLong(s + 8 + i * 8))
      }

      // stsc: (first_chunk, samples_per_chunk, desc_idx) runs — each run
      // applies from its first_chunk until the next run's
      val (scS, scE) = findBox(stbl, "stsc")
        .getOrElse(throw new Mp4ParseError("no stsc"))
      if (scE - scS < 8) throw new Mp4ParseError("short stsc")
      val nRuns = buf.getInt(scS + 4)
      if (nRuns <= 0 || scS + 8 + nRuns.toLong * 12 > scE)
        throw new Mp4ParseError(s"bad stsc count $nRuns")
      val runs = (0 until nRuns).map { i =>
        val base = scS + 8 + i * 12
        (buf.getInt(base), buf.getInt(base + 4)) // (first_chunk, spc)
      }
      if (runs.head._1 != 1) throw new Mp4ParseError("stsc must start at chunk 1")

      // walk chunks in order, assigning samples sequentially; every frame
      // range must land inside the file
      val out = Vector.newBuilder[(Long, Int)]
      var sample = 0
      var run = 0
      var chunk = 1
      while (sample < nSamples && chunk <= offsets.length) {
        while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
        val spc = runs(run)._2
        if (spc <= 0) throw new Mp4ParseError(s"bad samples-per-chunk $spc")
        var off = offsets(chunk - 1)
        var k = 0
        while (k < spc && sample < nSamples) {
          val sz = sizeOf(sample)
          if (off < 0 || off + sz > bytes.length)
            throw new Mp4ParseError(s"frame $sample out of bounds")
          out += ((off, sz))
          off += sz
          sample += 1
          k += 1
        }
        chunk += 1
      }
      if (sample < nSamples)
        throw new Mp4ParseError(
          s"sample table ends at $sample of $nSamples (missing chunks)")
      Some(VideoSampleTable(codec, width, height, out.result()))
    } catch {
      case _: Mp4ParseError | _: IndexOutOfBoundsException => None
    }

  /** Per-frame byte stats from the REAL sample-table walk
    * ([[videoFrameRanges]]): one output row per frame with its size and
    * exact byte sum — the distributable fan-out a per-frame decode kernel
    * consumes (each row names a byte range; the codec call is the only
    * missing piece and it sits behind this seam). An UNDECODABLE payload
    * emits ONE visible marker row (`frame_idx = -1`, zeros) — never
    * fabricated frames. A well-formed MP4 whose sample table lists ZERO
    * samples (fragmented-style moov) correctly emits zero rows: "decoded,
    * no frames" is a real answer, distinct from the marker, and callers
    * needing per-media accounting join back through the header path
    * ([[extractVideoFeatures]]), which always emits the media row.
    */
  final case class FrameBytes(media_id: Long, frame_idx: Long, size: Int,
      sum_bytes: Long)

  def extractFrameBytes(media: Dataset[MediaRow]): Dataset[FrameBytes] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      videoFrameRanges(r.content) match {
        case Some(ranges) => ranges.iterator.zipWithIndex.map {
          case ((off, sz), i) =>
            var s = 0L
            var j = 0
            while (j < sz) { s += r.content(off.toInt + j) & 0xff; j += 1 }
            FrameBytes(r.media_id, i.toLong, sz, s)
        }
        case None => Iterator.single(FrameBytes(r.media_id, -1L, 0, 0L))
      }
    })
  }

  /** The visual track's codec fourcc from the `stsd` sample description
    * (first entry) — what tells a frame extractor WHICH decoder each
    * sample needs ("png "/"jpeg" = intra-only image codecs the JDK
    * decodes; "avc1"/"hvc1" = inter-frame codecs that need a real codec
    * dependency). None when the payload has no parsable vide stsd.
    */
  def videoFrameCodec(bytes: Array[Byte]): Option[String] =
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      val (stbl, _) = videoVideStbl(buf, bytes)
      val (sdS, sdE) = findBox(stbl, "stsd")
        .getOrElse(throw new Mp4ParseError("no stsd"))
      // stsd: ver/flags(4) entry_count(4), then sample-entry boxes — the
      // entry's box TYPE is the codec fourcc
      if (sdE - sdS < 8 || buf.getInt(sdS + 4) < 1)
        throw new Mp4ParseError("empty stsd")
      mp4Children(buf, sdS + 8, sdE).headOption.map(_._1)
    } catch {
      case _: Mp4ParseError | _: IndexOutOfBoundsException => None
    }

  /** Per-frame PIXEL features for decodable-codec video: the sample
    * tables resolve each frame's byte range ([[videoFrameRanges]]), the
    * codec named by `stsd` picks the decoder — intra-only image codecs
    * ("png "/"jpeg") through JDK ImageIO per frame, and the QT Animation
    * INTER-FRAME codec ("rle ") through the stateful
    * [[decodeQtRleSample]] composite (delta frames reference the
    * previous raster — true temporal prediction, decoded with zero codec
    * dependencies). Every decoded frame emits the same integer-exact
    * pixel features as the still-image path. Entropy-coded inter-frame
    * codecs (avc1/hvc1) decline per frame (no JVM decoder) and emit
    * visible stub rows; an undecodable CONTAINER emits one
    * `frame_idx = -1` marker row.
    */
  final case class FramePixels(media_id: Long, frame_idx: Long, width: Int,
      height: Int, sum_rgb: Long, ahash: String, format: String)

  def extractFramePixels(media: Dataset[MediaRow]): Dataset[FramePixels] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      // ONE container walk per row: codec, dims and ranges come out of
      // the same videoSampleTable parse (per-row dispatch on a media
      // sweep must not pay a box walk per FACT)
      videoSampleTable(r.content) match {
        case Some(tbl) if tbl.codec.contains("rle ") =>
          // INTER-FRAME path (QT Animation): frames decode STATEFULLY in
          // sample order — each delta composites onto the previous
          // raster, so the iterator is consumed sequentially (flatMap
          // guarantees that) with one w·h int raster of state per video,
          // never per frame. Track dims come from the same walk's tkhd —
          // the frame decode needs dims + the sample table, not ftyp/mvhd
          // duration metadata (deliberately more permissive than round
          // 13's first cut, which also demanded a decodable ftyp/mvhd
          // header). Untrusted-dims guard, same rationale as
          // decodeRaster's: crafted tkhd dims must degrade to the stub
          // marker, never allocate w·h·4 unbounded (Int overflow in
          // w*h would throw NegativeArraySizeException — an uncaught
          // task-killer — and huge-but-valid dims would OOM per row).
          if (tbl.width > 0 && tbl.height > 0 &&
            tbl.width.toLong * tbl.height.toLong <= MaxRasterPixels) {
            val (w, h) = (tbl.width, tbl.height)
            var prev = new Array[Int](w * h)
            tbl.ranges.iterator.zipWithIndex.map { case ((off, sz), i) =>
              val sample = java.util.Arrays.copyOfRange(
                r.content, off.toInt, off.toInt + sz)
              decodeQtRleSample(prev, sample, w, h) match {
                case Some(ras) =>
                  prev = ras
                  val p = pixelFeaturesOfRaster(r.media_id, w, h,
                    (x, y) => ras(y * w + x), "rle")
                  FramePixels(r.media_id, i.toLong, w, h,
                    p.sum_rgb, p.ahash, p.format)
                case None => // malformed sample: visible stub, state kept
                  FramePixels(r.media_id, i.toLong, 0, 0, 0L, "", "stub")
              }
            }
          } else Iterator.single(
            FramePixels(r.media_id, -1L, 0, 0, 0L, "", "stub"))
        case Some(tbl) => tbl.ranges.iterator.zipWithIndex.map {
          case ((off, sz), i) =>
            val frame = java.util.Arrays.copyOfRange(
              r.content, off.toInt, off.toInt + sz)
            decodeRaster(frame) match {
              case Some((img, fmt)) =>
                val p = pixelFeaturesOf(r.media_id, img, fmt)
                FramePixels(r.media_id, i.toLong, p.width, p.height,
                  p.sum_rgb, p.ahash, p.format)
              case None =>
                FramePixels(r.media_id, i.toLong, 0, 0, 0L, "", "stub")
            }
        }
        case None =>
          Iterator.single(FramePixels(r.media_id, -1L, 0, 0, 0L, "", "stub"))
      }
    })
  }

  /** Deterministic MP4 with a REAL sample table and frame payloads — the
    * fixture half of the frame-extraction round-trip: `frames` land in the
    * `mdat` chunked `samplesPerChunk` at a time, with `stsz`/`stsc`/`stco`
    * describing them exactly (multiple stsc runs whenever the last chunk
    * is partial), and an `stsd` naming `codec` as the sample description.
    * Writer and [[videoFrameRanges]]/[[videoFrameCodec]] are independent
    * implementations, so the round-trip cross-checks both.
    */
  def encodeMp4Frames(width: Int, height: Int, frames: Seq[Array[Byte]],
      samplesPerChunk: Int = 3, timescale: Int = 1000,
      codec: String = "png ",
      // layout variants real encoders emit: a UNIFORM stsz (sample_size
      // field set, no per-entry table — requires equal-size frames) and
      // 64-bit co64 chunk offsets (large-file layout)
      uniformStsz: Boolean = false, co64: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && samplesPerChunk > 0)
    require(codec.length == 4, s"codec fourcc must be 4 chars: '$codec'")
    require(!uniformStsz || frames.map(_.length).distinct.size <= 1,
      "uniformStsz needs equal-size frames")
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
    def be16(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(2)
      .putShort(v.toShort).array()
    def be64(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(8)
      .putLong(v).array()
    val unityMatrix = Array(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L)
      .flatMap(be32)
    val n = frames.size
    val chunks = frames.grouped(samplesPerChunk).toSeq
    val duration = n.toLong // one tick per frame

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))

    def moovOf(mdatPayloadStart: Long): Array[Byte] = {
      val chunkOffsets = chunks.scanLeft(mdatPayloadStart) {
        (off, ch) => off + ch.map(_.length).sum
      }.init
      val stts = box("stts", Array[Byte](0, 0, 0, 0), be32(1), be32(n.toLong),
        be32(1))
      val stsz =
        if (uniformStsz) box("stsz", Array[Byte](0, 0, 0, 0),
          be32(frames.headOption.map(_.length.toLong).getOrElse(0L)),
          be32(n.toLong))
        else box("stsz", Array[Byte](0, 0, 0, 0), be32(0), be32(n.toLong),
          frames.map(f => be32(f.length.toLong)).fold(Array.emptyByteArray)(_ ++ _))
      // stsc runs: all full chunks share one run; a partial tail chunk
      // gets its own
      val lastSpc = if (chunks.isEmpty) samplesPerChunk else chunks.last.size
      val runs: Seq[(Int, Int)] =
        if (chunks.isEmpty) Seq((1, samplesPerChunk))
        else if (chunks.size == 1 || lastSpc == samplesPerChunk)
          Seq((1, samplesPerChunk))
        else Seq((1, samplesPerChunk), (chunks.size, lastSpc))
      val stsc = box("stsc", Array[Byte](0, 0, 0, 0), be32(runs.size.toLong),
        runs.map { case (fc, spc) => be32(fc.toLong) ++ be32(spc.toLong) ++
          be32(1L) }.fold(Array.emptyByteArray)(_ ++ _))
      val stco =
        if (co64) box("co64", Array[Byte](0, 0, 0, 0),
          be32(chunkOffsets.size.toLong),
          chunkOffsets.map(be64).fold(Array.emptyByteArray)(_ ++ _))
        else box("stco", Array[Byte](0, 0, 0, 0),
          be32(chunkOffsets.size.toLong),
          chunkOffsets.map(be32).fold(Array.emptyByteArray)(_ ++ _))
      // stsd: one VisualSampleEntry named by the codec fourcc (78-byte
      // payload per ISO 14496-12 §12.1.3: reserved/dref + pre_defined +
      // width/height + 72dpi fixed-point resolutions + frame_count 1 +
      // 32-byte compressorname + depth 24 + pre_defined -1)
      val sampleEntry = box(codec,
        Array.fill(6)(0.toByte), be16(1),      // reserved + data_ref_index
        be16(0), be16(0), Array.fill(12)(0.toByte), // pre_defined/reserved
        be16(width), be16(height),
        be32(0x480000L), be32(0x480000L),      // 72 dpi 16.16
        be32(0), be16(1),                      // reserved + frame_count
        Array.fill(32)(0.toByte),              // compressorname
        be16(24), be16(0xffff))                // depth + pre_defined(-1)
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1), sampleEntry)
      val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
        be32(timescale.toLong), be32(duration), be32(0x10000L), be16(0x100),
        be16(0), be64(0), unityMatrix, Array.fill(24)(0.toByte), be32(2))
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7), be32(0), be32(0),
        be32(1L), be32(0), be32(duration), be64(0), be16(0), be16(0),
        be16(0), be16(0), unityMatrix,
        be32(width.toLong << 16), be32(height.toLong << 16))
      val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
        be32(timescale.toLong), be32(duration), be16(0x55c4), be16(0))
      val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
        "vide".getBytes("US-ASCII"), Array.fill(12)(0.toByte),
        Array(0.toByte))
      box("moov", mvhd,
        box("trak", tkhd,
          box("mdia", mdhd, hdlr,
            box("minf", box("stbl", stsd, stts, stsz, stsc, stco)))))
    }

    // stco carries ABSOLUTE file offsets, which depend on moov's size —
    // but moov's size does NOT depend on the offset values (fixed-width
    // be32), so one placeholder pass sizes it and the second pass fills
    // the real offsets
    val probe = moovOf(0L)
    val mdatPayloadStart = ftyp.length + probe.length + 8L
    val moov = moovOf(mdatPayloadStart)
    require(moov.length == probe.length, "moov size must be offset-invariant")
    val mdat = box("mdat", frames.fold(Array.emptyByteArray)(_ ++ _))
    ftyp ++ moov ++ mdat
  }

  // ------------------------------- inter-frame codec: QuickTime RLE

  /** Decode one QuickTime Animation ("rle ", 24-bit) sample onto the
    * previous frame's raster — a REAL, published INTER-FRAME codec
    * (QuickTime File Format specification, "Animation" video sample
    * data; long decodable by every major player) that needs no codec
    * dependency: plain byte-level RLE plus temporal line copying.
    *
    * Sample layout: `chunkSize(4) header(2)`; header bit 0x0008 marks a
    * PARTIAL update (delta frame) and is followed by
    * `startLine(2) pad(2) nLines(2) pad(2)` — only those lines change,
    * every other line copies from the PREVIOUS frame (genuine temporal
    * prediction, the same class of dependency avc1/hvc1 add entropy
    * coding on top of). Each updated line: a 1-byte skip code (0 ends
    * the sample's RLE data; otherwise start `skip−1` pixels in), then
    * signed RLE codes — 0 = read another skip byte (advance `skip−1`
    * more pixels), −1 = end of line, n>0 = n literal RGB pixels,
    * n<−1 = one RGB pixel repeated −n times.
    *
    * Returns the full composited raster (packed 0xRRGGBB, row-major), or
    * None for malformed samples (bad chunk size, out-of-bounds line or
    * pixel writes, truncated stream) — callers emit the visible stub row
    * and keep the previous state, never fabricated pixels. `prev` is
    * NEVER mutated (the returned raster is a fresh copy), so a failed
    * frame leaves the caller's state consistent.
    */
  def decodeQtRleSample(prev: Array[Int], bytes: Array[Byte],
      w: Int, h: Int): Option[Array[Int]] = {
    require(prev.length == w * h, "prev raster must be w*h")
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      val chunkSize = buf.getInt()
      if (chunkSize < 6 || chunkSize > bytes.length) return None
      val header = buf.getShort() & 0xffff
      var line = 0
      var nLines = h
      if ((header & 0x0008) != 0) {
        line = buf.getShort() & 0xffff; buf.getShort()
        nLines = buf.getShort() & 0xffff; buf.getShort()
      }
      if (line + nLines > h) return None
      val out = prev.clone() // temporal copy-through for untouched lines
      var linesLeft = nLines
      var done = linesLeft == 0
      while (!done) {
        val skip0 = buf.get() & 0xff
        if (skip0 == 0) done = true
        else {
          if (linesLeft == 0) return None // more lines than declared
          var px = skip0 - 1
          var eol = false
          while (!eol) {
            val code = buf.get().toInt // signed
            if (code == 0) px += (buf.get() & 0xff) - 1
            else if (code == -1) eol = true
            else if (code > 0) {
              var i = 0
              while (i < code) {
                if (px < 0 || px >= w) return None
                val r = buf.get() & 0xff
                val g = buf.get() & 0xff
                val b = buf.get() & 0xff
                out(line * w + px) = (r << 16) | (g << 8) | b
                px += 1; i += 1
              }
            } else {
              val r = buf.get() & 0xff
              val g = buf.get() & 0xff
              val b = buf.get() & 0xff
              val pix = (r << 16) | (g << 8) | b
              var i = code // −2..−128: repeat −code times
              while (i < 0) {
                if (px < 0 || px >= w) return None
                out(line * w + px) = pix
                px += 1; i += 1
              }
            }
          }
          line += 1
          linesLeft -= 1
          if (linesLeft == 0) {
            // trailing 0 skip byte is optional in the wild; consume it
            // if present so chunk accounting stays aligned
            if (buf.hasRemaining && bytes(buf.position()) == 0) buf.get()
            done = true
          }
        }
      }
      Some(out)
    } catch {
      case _: java.nio.BufferUnderflowException => None
      case _: IndexOutOfBoundsException => None
    }
  }

  /** Encode one raster as a QT RLE sample: a KEYFRAME (all lines) when
    * `prev` is None, else a DELTA frame carrying only the contiguous band
    * of changed lines (header 0x0008 + start/count — the spec's partial-
    * update form). Within a line, repeat runs ≥ 3 emit the repeat code
    * and literals chunk at ≤ 127 — so the decoder's literal, repeat, and
    * skip paths are all exercised by real fixtures. Encoder and decoder
    * are independent walks of the published layout; the round-trip
    * cross-checks both (same discipline as encodeMp4Frames vs
    * videoFrameRanges).
    */
  def encodeQtRleSample(prev: Option[Array[Int]], cur: Array[Int],
      w: Int, h: Int): Array[Byte] = {
    require(cur.length == w * h, "raster must be w*h")
    prev.foreach(p => require(p.length == w * h, "prev raster must be w*h"))
    val body = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = body.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def rowEq(p: Array[Int], y: Int): Boolean = {
      var x = 0
      while (x < w && p(y * w + x) == cur(y * w + x)) x += 1
      x == w
    }
    val (start, n) = prev match {
      case Some(p) =>
        var lo = 0
        while (lo < h && rowEq(p, lo)) lo += 1
        if (lo == h) (0, 0) // nothing changed: header-only delta
        else {
          var hi = h - 1
          while (hi > lo && rowEq(p, hi)) hi -= 1
          (lo, hi - lo + 1)
        }
      case None => (0, h)
    }
    val partial = prev.isDefined
    u16(if (partial) 0x0008 else 0x0000)
    if (partial) { u16(start); u16(0); u16(n); u16(0) }
    var y = start
    while (y < start + n) {
      u8(1) // start at pixel 0
      var x = 0
      while (x < w) {
        val v = cur(y * w + x)
        var run = 1
        while (x + run < w && cur(y * w + x + run) == v && run < 127)
          run += 1
        if (run >= 3) {
          u8(-run) // repeat code
          u8(v >> 16); u8(v >> 8); u8(v)
          x += run
        } else {
          // literal chunk: scan forward until a ≥3 repeat run starts or
          // the 127-pixel code limit; always carries ≥ 1 pixel
          var scan = x + 1
          var stop = false
          while (!stop && scan < w && scan - x < 127) {
            val lv = cur(y * w + scan)
            var r = 1
            while (scan + r < w && cur(y * w + scan + r) == lv && r < 3)
              r += 1
            if (r >= 3) stop = true else scan += 1
          }
          u8(scan - x)
          var i = x
          while (i < scan) {
            val lv = cur(y * w + i)
            u8(lv >> 16); u8(lv >> 8); u8(lv)
            i += 1
          }
          x = scan
        }
      }
      u8(0xff) // end of line (−1)
      y += 1
    }
    u8(0) // terminating skip byte
    val payload = body.toByteArray
    val outBuf = java.nio.ByteBuffer.allocate(4 + payload.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    outBuf.putInt(4 + payload.length).put(payload)
    outBuf.array()
  }

  /** Deterministic "rle "-coded MP4: rasters → QT RLE samples (first a
    * keyframe, the rest line-band deltas) → [[encodeMp4Frames]] container
    * with stsd fourcc "rle " — the fixture half of the inter-frame
    * round-trip that [[extractFramePixels]] decodes statefully.
    */
  def encodeQtRleVideo(w: Int, h: Int, rasters: Seq[Array[Int]],
      samplesPerChunk: Int = 3): Array[Byte] = {
    val samples = rasters.zipWithIndex.map { case (r, i) =>
      encodeQtRleSample(if (i == 0) None else Some(rasters(i - 1)), r, w, h)
    }
    encodeMp4Frames(w, h, samples, samplesPerChunk, codec = "rle ")
  }

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
