package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode / feature-extraction runs per-partition
  * over the binary batches.
  *
  * Every decode is REAL — no placeholders remain in the family:
  * PNG / JPEG / GIF payloads go through the JDK's `javax.imageio`
  * (headless-safe, no external dependency) — header fields, frame
  * counts (animated GIF) and pixel data all come from the actual
  * codec; WAV audio goes through the JDK's `javax.sound.sampled`
  * ([[AudioFeatures]]), format header and every PCM sample; video is
  * MJPEG-in-AVI ([[VideoFeatures]]) — a real RIFF container walk with
  * every frame chunk decoded by the JDK JPEG codec. An undecodable
  * payload FAILS LOUD with the offending id rather than fabricating
  * data, and a payload routed to the wrong operator is redirected by
  * its container magic (WAV → [[AudioFeatures]], AVI →
  * [[VideoFeatures]]).
  *
  * At 100 TB the decode is the classic embarrassingly-parallel map: no
  * shuffle, bounded memory per partition (one payload at a time via the
  * partition iterator), and `spark.sql.files.maxPartitionBytes` controls
  * batch sizing.
  */
object Multimodal {

  // memory-cached ImageIO streams: the default cache is a temp FILE per
  // stream, which serializes parallel decode behind disk I/O (see
  // MediaGen's matching setting; either object may initialize first)
  ImageIO.setUseCache(false)

  /** Image-format sniff from magic bytes; None → not a (supported) image. */
  private[operators] def sniffFormat(payload: Array[Byte]): Option[String] = {
    if (payload == null || payload.length < 4) None
    else if ((payload(0) & 0xFF) == 0x89 && payload(1) == 'P' &&
      payload(2) == 'N' && payload(3) == 'G') Some("png")
    else if (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8') Some("gif")
    else if ((payload(0) & 0xFF) == 0xFF && (payload(1) & 0xFF) == 0xD8)
      Some("jpeg")
    else None
  }

  /** Decoded frame-0 view of an image payload. `corner` is the raster's
    * band-0 sample at (0,0) — a cheap pixel-level probe proving the codec
    * actually decoded pixel data (and the cross-engine checksum anchor
    * the oracle verifies against the generator's closed form).
    */
  private[operators] final case class DecodedImage(
      fmt: String, width: Int, height: Int, nFrames: Int,
      corner: Int, frame0: BufferedImage)

  /** Real `javax.imageio` decode of frame 0 + container frame count.
    * Throws `IllegalArgumentException` naming `id` on any undecodable
    * payload (unknown magic, truncated stream, reader errors).
    */
  private[operators] def decodeImage(id: Long, payload: Array[Byte]): DecodedImage = {
    val fmt = sniffFormat(payload).getOrElse(throw new IllegalArgumentException(
      s"media $id: payload is not a decodable image (PNG/JPEG/GIF magic " +
        s"not found in ${if (payload == null) 0 else payload.length} bytes)"))
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) throw new IllegalArgumentException(
        s"media $id: no ImageIO reader for sniffed format $fmt")
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        // allowSearch=true: exact frame count needs a container scan —
        // cheap for the in-memory stream, exact for animated GIFs.
        val n = reader.getNumImages(true)
        val img = reader.read(0)
        DecodedImage(fmt, img.getWidth, img.getHeight, math.max(n, 1),
          img.getRaster.getSample(0, 0, 0), img)
      } finally reader.dispose()
    } catch {
      case e: IllegalArgumentException => throw e
      case e: Exception => throw new IllegalArgumentException(
        s"media $id: corrupt $fmt payload (${payload.length} bytes): $e", e)
    } finally iis.close()
  }

  /** Typed output row of [[MediaFeatures]] (field order = output schema). */
  private[operators] final case class MediaFeatureRow(
      doc_id: Long, fmt: String, byte_len: Long, width: Long, height: Long,
      n_frames: Long, frame_stride: Long, corner_px: Long)

  /** Extract media features from a binary payload column. Input columns:
    * `idColumn` (long) + `payloadColumn` (binary). Output: one row per
    * media with the REAL decoded format, dimensions, frame count, the
    * frame-0 corner pixel (band-0 sample — proves pixels were decoded)
    * and the sampling stride for `maxSample` frames.
    *
    * Undecodable payloads fail loud with the id; a payload that is
    * really a WAV or AVI container is redirected by its magic to
    * [[AudioFeatures]] / [[VideoFeatures]] in the error message —
    * every media class now has a REAL decoder, so no placeholder
    * path exists.
    *
    * Implemented as a typed `Dataset.mapPartitions` — the per-partition
    * iterator is where the codec streams payload batches — which stays
    * inside whole-stage codegen (DeserializeToObject/MapPartitions/
    * SerializeFromObject), unlike an `df.rdd` round-trip that would cut
    * the plan at an ExternalRDD scan and fall out of Tungsten.
    */
  final case class MediaFeatures(idColumn: String = "doc_id",
                                 payloadColumn: String = "payload",
                                 maxSample: Int = 4)
      extends Wrangler {
    require(maxSample >= 1, "maxSample must be positive")
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, payloadColumn))
      val spark = df.sparkSession
      import spark.implicits._
      val ms = maxSample
      df.select(col(idColumn).cast("long"), col(payloadColumn).cast("binary"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, payload) =>
            if (sniffWav(payload)) throw new IllegalArgumentException(
              s"media $id: payload is WAV audio — decode it with " +
                "AudioFeatures")
            if (sniffAvi(payload)) throw new IllegalArgumentException(
              s"media $id: payload is an AVI container — decode it with " +
                "VideoFeatures")
            val d = decodeImage(id, payload)
            // ceil division: at most maxSample sampled frames
            val stride = (d.nFrames + ms - 1) / ms
            MediaFeatureRow(id, d.fmt, payload.length.toLong,
              d.width.toLong, d.height.toLong, d.nFrames.toLong,
              stride.toLong, d.corner.toLong)
          }
        }
        .toDF()
    }
  }

  /** Frame sampling: expand each media row into its sampled frame
    * indices (0, stride, 2*stride, ... < n_frames) — pure column
    * expressions over the [[MediaFeatures]] output.
    */
  final case class FrameSample() extends Wrangler {
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df,
        Seq("doc_id", "n_frames", "frame_stride"))
      df.select(col("doc_id"),
          explode(sequence(lit(0L), col("n_frames") - 1,
            col("frame_stride"))).as("frame_idx"))
    }
  }

  /** WAV sniff from RIFF/WAVE magic; None → not a WAV container. */
  private[operators] def sniffWav(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
      payload(10) == 'V' && payload(11) == 'E'

  /** Decoded view of a WAV payload: format header fields plus the
    * sample-level probes ([[AudioFeatureRow]] semantics). */
  private[operators] final case class DecodedAudio(
      sampleRate: Long, channels: Long, nFrames: Long,
      firstSample: Long, sampleSum: Long)

  /** Real `javax.sound.sampled` decode of a WAV payload: the JDK's own
    * WAV codec parses the container, and every PCM sample is read and
    * folded into `firstSample`/`sampleSum` — pixel-level-equivalent
    * probes proving the codec actually decoded sample data. Throws
    * `IllegalArgumentException` naming `id` on any undecodable payload.
    * Only 16-bit PCM is accepted (the WAV profile the generator and
    * real speech corpora use); other bit depths fail loud rather than
    * approximating.
    */
  private[operators] def decodeAudio(id: Long, payload: Array[Byte]): DecodedAudio = {
    if (!sniffWav(payload)) throw new IllegalArgumentException(
      s"media $id: payload is not a WAV container (RIFF/WAVE magic not " +
        s"found in ${if (payload == null) 0 else payload.length} bytes)")
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"media $id: corrupt WAV payload (${payload.length} bytes): $e", e)
      }
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"media $id: only 16-bit PCM WAV is supported, got " +
          s"${fmt.getSampleSizeInBits}-bit")
      // header-supplied divisors: a crafted fmt chunk can declare
      // zero — fail with the id, never a bare ArithmeticException
      // (channels divides the frame fallback below, sample_rate the
      // caller's duration_ms)
      require(fmt.getChannels > 0 && fmt.getSampleRate > 0,
        s"media $id: corrupt WAV header (channels=${fmt.getChannels}, " +
          s"sampleRate=${fmt.getSampleRate})")
      val channels = fmt.getChannels
      val frames = ais.getFrameLength
      val data =
        try ais.readAllBytes()
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"media $id: truncated WAV sample data: $e", e)
        }
      val n = data.length / 2
      if (frames >= 0 && n != frames * channels)
        throw new IllegalArgumentException(
          s"media $id: WAV sample data holds $n samples but the header " +
            s"declares ${frames * channels}")
      val big = fmt.isBigEndian
      var j = 0
      var sum = 0L
      var first = 0L
      while (j < n) {
        val lo = data(2 * j) & 0xFF
        val hi = data(2 * j + 1) & 0xFF
        val s = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toLong
        if (j == 0) first = s
        sum += s
        j += 1
      }
      DecodedAudio(fmt.getSampleRate.toLong, channels.toLong,
        if (frames >= 0) frames else n.toLong / channels, first, sum)
    } finally ais.close()
  }

  /** Typed output row of [[AudioFeatures]] (field order = schema). */
  private[operators] final case class AudioFeatureRow(
      doc_id: Long, fmt: String, byte_len: Long, sample_rate: Long,
      channels: Long, n_frames: Long, duration_ms: Long,
      first_sample: Long, sample_sum: Long)

  /** Extract audio features from a binary WAV payload column — the
    * audio sibling of [[MediaFeatures]]. Real `javax.sound.sampled`
    * decode: format header fields plus two sample-level probes
    * (`first_sample`, and `sample_sum` folded over EVERY decoded PCM
    * sample) that a header-only parse could not produce.
    * `duration_ms = n_frames * 1000 / sample_rate` (exact integer
    * division, cross-engine stable). Undecodable payloads fail loud
    * with the id.
    *
    * Same 100 TB shape as the image path: embarrassingly parallel typed
    * `mapPartitions`, one payload decoded at a time, no shuffle.
    */
  final case class AudioFeatures(idColumn: String = "doc_id",
                                 payloadColumn: String = "payload")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, payloadColumn))
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idColumn).cast("long"), col(payloadColumn).cast("binary"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, payload) =>
            val d = decodeAudio(id, payload)
            AudioFeatureRow(id, "wav", payload.length.toLong, d.sampleRate,
              d.channels, d.nFrames, d.nFrames * 1000L / d.sampleRate,
              d.firstSample, d.sampleSum)
          }
        }
        .toDF()
    }
  }

  /** AVI sniff from RIFF/AVI magic; false → not an AVI container. */
  private[operators] def sniffAvi(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'A' && payload(9) == 'V' &&
      payload(10) == 'I' && payload(11) == ' '

  /** Decoded view of an MJPEG-AVI payload: container header fields plus
    * frame-level probes — every `00dc` frame chunk goes through the
    * REAL `javax.imageio` JPEG decode, and `corner`/`cornerSum` are
    * pixel-level evidence of it (the [[DecodedImage]] convention). */
  private[operators] final case class DecodedVideo(
      width: Long, height: Long, nFrames: Long, rate: Long, scale: Long,
      corner: Long, cornerSum: Long)

  /** Real RIFF/AVI container walk + per-frame JPEG decode. The AVI
    * layout is public knowledge (Microsoft's RIFF/AVI spec): a RIFF
    * file is fourcc-keyed chunks, `LIST hdrl` holds `avih` (main
    * header) and `LIST strl` → `strh`/`strf` (stream headers),
    * `LIST movi` holds the `##dc` frame chunks; chunk sizes are
    * little-endian and chunks pad to even offsets. Every structural
    * violation — bad magic, a chunk overrunning the container, missing
    * headers, a non-video or non-MJPG stream, frame dims disagreeing
    * with the header, fewer decodable frames than the header declares —
    * fails loud naming `id`, never fabricates fields.
    */
  private[operators] def decodeVideo(id: Long, payload: Array[Byte]): DecodedVideo = {
    if (!sniffAvi(payload)) throw new IllegalArgumentException(
      s"media $id: payload is not an AVI container (RIFF/AVI magic not " +
        s"found in ${if (payload == null) 0 else payload.length} bytes)")
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"media $id: corrupt AVI: $msg")
    def u32(off: Int): Long = {
      if (off + 4 > payload.length) fail(s"size field at $off runs past payload end")
      (payload(off) & 0xFFL) | ((payload(off + 1) & 0xFFL) << 8) |
        ((payload(off + 2) & 0xFFL) << 16) | ((payload(off + 3) & 0xFFL) << 24)
    }
    def fourcc(off: Int): String = {
      if (off + 4 > payload.length) fail(s"fourcc at $off runs past payload end")
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    }
    val riffSize = u32(4)
    if (8L + riffSize > payload.length)
      fail(s"RIFF declares ${riffSize} bytes but payload holds ${payload.length - 8}")
    val end0 = (8L + riffSize).toInt

    var totalFrames = -1L
    var w = -1L
    var h = -1L
    var rate = -1L
    var scale = -1L
    var strLength = -1L
    var sawVids = false
    var sawMjpgStrf = false
    var framesDecoded = 0L
    var corner = -1L
    var cornerSum = 0L
    // streams are numbered by strh order (the AVI spec's stream-index
    // rule); the frame walk decodes ONLY the vids stream's `NNdc`
    // chunks — a multi-stream file (00wb audio + 01dc video) or a
    // stray `..dc` chunk of another stream must not land in the pixel
    // probes
    var strhSeen = 0
    var vidsStream = -1
    var lastStrhWasVids = false

    def walk(start: Int, end: Int, depth: Int, inMovi: Boolean): Unit = {
      var off = start
      while (off < end) {
        if (off + 8 > end) fail(s"truncated chunk header at $off")
        val cc = fourcc(off)
        val size = u32(off + 4)
        val dataOff = off + 8
        if (dataOff + size > end)
          fail(s"chunk $cc at $off declares $size bytes, overrunning its container")
        cc match {
          case "LIST" =>
            if (size < 4) fail(s"LIST at $off too small for a type")
            // recurse into hdrl/strl/movi; depth-capped against crafted
            // self-nesting (real AVIs nest 2 deep). Frame chunks are
            // only frames inside `LIST movi` (or a `rec ` group within
            // it) — a `..dc` fourcc anywhere else is NOT frame data
            val listType = fourcc(dataOff)
            val childInMovi =
              listType == "movi" || (inMovi && listType == "rec ")
            if (depth < 8)
              walk(dataOff + 4, (dataOff + size).toInt, depth + 1,
                childInMovi)
          case "avih" =>
            if (size < 40) fail(s"avih holds $size bytes (< 40)")
            totalFrames = u32(dataOff + 16)
            w = u32(dataOff + 32)
            h = u32(dataOff + 36)
          case "strh" =>
            if (size < 40) fail(s"strh holds $size bytes (< 40)")
            val fccType = fourcc(dataOff)
            lastStrhWasVids = fccType == "vids"
            if (fccType == "vids") {
              // a second vids strh would silently overwrite rate/scale/
              // strLength — refuse instead of decoding half-wrong
              if (sawVids) fail("a second vids stream header — " +
                "multi-video-stream AVIs are not supported")
              sawVids = true
              vidsStream = strhSeen
              val handler = fourcc(dataOff + 4)
              if (handler != "MJPG")
                fail(s"video stream handler is $handler, not MJPG")
              scale = u32(dataOff + 20)
              rate = u32(dataOff + 24)
              strLength = u32(dataOff + 32)
            }
            strhSeen += 1
          case "strf" =>
            // the strf belongs to the immediately-preceding strh of the
            // same strl — only the VIDEO stream's format must be MJPG
            // (an audio strf is a WAVEFORMAT and has no biCompression)
            if (lastStrhWasVids && size >= 20 &&
              fourcc(dataOff + 16) == "MJPG")
              sawMjpgStrf = true
          case c if inMovi && c.length == 4 && c.charAt(0).isDigit &&
            c.charAt(1).isDigit && c.endsWith("dc") &&
            (c.charAt(0) - '0') * 10 + (c.charAt(1) - '0') == vidsStream =>
            val frame = java.util.Arrays.copyOfRange(
              payload, dataOff, (dataOff + size).toInt)
            val d = decodeImage(id, frame)
            if (d.fmt != "jpeg")
              fail(s"frame $framesDecoded is ${d.fmt}, not JPEG")
            if (w >= 0 && (d.width.toLong != w || d.height.toLong != h))
              fail(s"frame $framesDecoded is ${d.width}x${d.height} but " +
                s"the header declares ${w}x$h")
            if (framesDecoded == 0L) corner = d.corner.toLong
            cornerSum += d.corner.toLong
            framesDecoded += 1L
          case _ => () // unknown chunks (idx1, junk, other streams' data)
        }
        off = (dataOff + size + (size & 1L)).toInt
      }
    }
    walk(12, end0, 0, inMovi = false)

    if (totalFrames < 0) fail("no avih main header")
    if (!sawVids) fail("no vids stream header")
    if (!sawMjpgStrf) fail("stream format is not MJPG")
    if (scale <= 0 || rate <= 0) fail(s"bad rate/scale ($rate/$scale)")
    if (framesDecoded == 0L) fail("no decodable video frames")
    if (framesDecoded != totalFrames)
      fail(s"header declares $totalFrames frames but $framesDecoded " +
        "decoded (truncated movi?)")
    if (strLength >= 0 && strLength != framesDecoded)
      fail(s"stream header declares $strLength frames but " +
        s"$framesDecoded decoded")
    DecodedVideo(w, h, framesDecoded, rate, scale, corner, cornerSum)
  }

  /** Typed output row of [[VideoFeatures]] (field order = schema). */
  private[operators] final case class VideoFeatureRow(
      doc_id: Long, fmt: String, byte_len: Long, width: Long, height: Long,
      n_frames: Long, fps_num: Long, fps_den: Long, duration_ms: Long,
      corner_px: Long, corner_sum: Long)

  /** Extract video features from a binary MJPEG-AVI payload column —
    * the operator that retires the video stub, the last placeholder in
    * the multimodal family: the RIFF/AVI container walk and the
    * per-frame `javax.imageio` JPEG decode are both REAL
    * ([[decodeVideo]]), and `corner_px`/`corner_sum` (frame-0 corner,
    * corner summed over EVERY decoded frame) are pixel-level probes a
    * header-only parse could not produce.
    * The frame rate is carried EXACTLY as `fps_num`/`fps_den`
    * (the container's dwRate/dwScale) — real-world rates are
    * fractional (NTSC 30000/1001 = 29.97), so a truncated integer fps
    * column would be silently lossy — and
    * `duration_ms = n_frames * 1000 * fps_den / fps_num` (one exact
    * integer division at the END, no compounding truncation).
    * Undecodable payloads fail loud with the id.
    *
    * Same 100 TB shape as the image/audio paths: embarrassingly
    * parallel typed `mapPartitions`, one payload decoded at a time, no
    * shuffle.
    */
  final case class VideoFeatures(idColumn: String = "doc_id",
                                 payloadColumn: String = "payload")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, payloadColumn))
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idColumn).cast("long"), col(payloadColumn).cast("binary"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, payload) =>
            val d = decodeVideo(id, payload)
            VideoFeatureRow(id, "mjpeg_avi", payload.length.toLong,
              d.width, d.height, d.nFrames, d.rate, d.scale,
              d.nFrames * 1000L * d.scale / d.rate, d.corner, d.cornerSum)
          }
        }
        .toDF()
    }
  }

  /** Demuxed view of an AVI's interleaved PCM audio stream. */
  private[operators] final case class DemuxedAudio(
      hasAudio: Boolean, nChunks: Long, nBytes: Long, byteSum: Long,
      firstByte: Long, sampleRate: Long, channels: Long)

  /** Demux the AUDIO stream out of an AVI container — the companion of
    * [[decodeVideo]] (which decodes only the vids stream and skips
    * `##wb` data by fourcc): streams are numbered by strh order, the
    * `auds` stream's `NNwb` data chunks concatenate into the PCM byte
    * stream, and its WAVEFORMAT strf supplies channels/sample rate.
    * The same structural fail-loud rules as the video walk (magic,
    * overruns, truncated headers, a SECOND auds strh); a container with
    * NO audio stream demuxes to the explicit empty class rather than
    * an error — silent video is data, not corruption.
    */
  private[operators] def demuxAudio(id: Long,
                                    payload: Array[Byte]): DemuxedAudio = {
    if (!sniffAvi(payload)) throw new IllegalArgumentException(
      s"media $id: payload is not an AVI container (RIFF/AVI magic not " +
        s"found in ${if (payload == null) 0 else payload.length} bytes)")
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"media $id: corrupt AVI: $msg")
    def u32(off: Int): Long = {
      if (off + 4 > payload.length) fail(s"size field at $off runs past payload end")
      (payload(off) & 0xFFL) | ((payload(off + 1) & 0xFFL) << 8) |
        ((payload(off + 2) & 0xFFL) << 16) | ((payload(off + 3) & 0xFFL) << 24)
    }
    def u16(off: Int): Long = {
      if (off + 2 > payload.length) fail(s"field at $off runs past payload end")
      (payload(off) & 0xFFL) | ((payload(off + 1) & 0xFFL) << 8)
    }
    def fourcc(off: Int): String = {
      if (off + 4 > payload.length) fail(s"fourcc at $off runs past payload end")
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    }
    val riffSize = u32(4)
    if (8L + riffSize > payload.length)
      fail(s"RIFF declares ${riffSize} bytes but payload holds ${payload.length - 8}")
    val end0 = (8L + riffSize).toInt

    var strhSeen = 0
    var audsStream = -1
    var lastStrhWasAuds = false
    var sawAuds = false
    var channels = 0L
    var sampleRate = 0L
    var nChunks = 0L
    var nBytes = 0L
    var byteSum = 0L
    var firstByte = -1L

    def walk(start: Int, end: Int, depth: Int, inMovi: Boolean): Unit = {
      var off = start
      while (off < end) {
        if (off + 8 > end) fail(s"truncated chunk header at $off")
        val cc = fourcc(off)
        val size = u32(off + 4)
        val dataOff = off + 8
        if (dataOff + size > end)
          fail(s"chunk $cc at $off declares $size bytes, overrunning its container")
        cc match {
          case "LIST" =>
            if (size < 4) fail(s"LIST at $off too small for a type")
            val listType = fourcc(dataOff)
            val childInMovi =
              listType == "movi" || (inMovi && listType == "rec ")
            if (depth < 8)
              walk(dataOff + 4, (dataOff + size).toInt, depth + 1,
                childInMovi)
          case "strh" =>
            if (size < 40) fail(s"strh holds $size bytes (< 40)")
            val fccType = fourcc(dataOff)
            lastStrhWasAuds = fccType == "auds"
            if (fccType == "auds") {
              if (sawAuds) fail("a second auds stream header — " +
                "multi-audio-stream AVIs are not supported")
              sawAuds = true
              audsStream = strhSeen
            }
            strhSeen += 1
          case "strf" =>
            // the auds strf is a WAVEFORMAT: wFormatTag u16,
            // nChannels u16, nSamplesPerSec u32 (public layout)
            if (lastStrhWasAuds) {
              if (size < 8) fail(s"audio strf holds $size bytes (< 8)")
              channels = u16(dataOff + 2)
              sampleRate = u32(dataOff + 4)
            }
          case c if inMovi && c.length == 4 && c.charAt(0).isDigit &&
            c.charAt(1).isDigit && c.endsWith("wb") && audsStream >= 0 &&
            (c.charAt(0) - '0') * 10 + (c.charAt(1) - '0') == audsStream =>
            var i = dataOff
            val stop = (dataOff + size).toInt
            while (i < stop) {
              val b = payload(i) & 0xFFL
              if (firstByte < 0) firstByte = b
              byteSum += b
              i += 1
            }
            nChunks += 1L
            nBytes += size
          case _ => ()
        }
        off = (dataOff + size + (size & 1L)).toInt
      }
    }
    walk(12, end0, 0, inMovi = false)

    if (!sawAuds) DemuxedAudio(false, 0L, 0L, 0L, -1L, 0L, 0L)
    else {
      if (channels <= 0 || sampleRate <= 0)
        fail(s"auds stream without a usable WAVEFORMAT strf " +
          s"(channels=$channels rate=$sampleRate)")
      if (nChunks == 0L) fail("auds stream header but no audio data chunks")
      DemuxedAudio(true, nChunks, nBytes, byteSum, firstByte,
        sampleRate, channels)
    }
  }

  /** Typed output row of [[VideoAudioDemux]] (field order = schema). */
  private[operators] final case class DemuxRow(
      doc_id: Long, has_audio: Boolean, n_audio_chunks: Long,
      n_audio_bytes: Long, byte_sum: Long, first_byte: Long,
      sample_rate: Long, channels: Long)

  /** Extract the interleaved AUDIO stream from MJPEG-AVI payloads —
    * the demux leg of the multimodal family ([[VideoFeatures]] reads
    * the video stream and skips audio data by fourcc; this reads the
    * `NNwb` chunks of the auds stream and folds EVERY PCM byte into
    * oracle-checked probes (`byte_sum`, `first_byte`), so the demux is
    * proven on content, not just chunk counts). Containers without an
    * audio stream emit the explicit empty class (`has_audio = false`,
    * zero counts) — silent video is data, never an error; structural
    * corruption fails loud with the id.
    *
    * Same 100 TB shape as the codec family: embarrassingly parallel
    * typed `mapPartitions`, one payload at a time, no shuffle.
    */
  final case class VideoAudioDemux(idColumn: String = "doc_id",
                                   payloadColumn: String = "payload")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, payloadColumn))
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idColumn).cast("long"), col(payloadColumn).cast("binary"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, payload) =>
            val d = demuxAudio(id, payload)
            DemuxRow(id, d.hasAudio, d.nChunks, d.nBytes, d.byteSum,
              d.firstByte, d.sampleRate, d.channels)
          }
        }
        .toDF()
    }
  }

  /** Typed output row of [[Resize]]. */
  private[operators] final case class ResizeRow(
      doc_id: Long, fmt: String, width: Long, height: Long, scale_den: Long,
      out_w: Long, out_h: Long, corner_px: Long, resized_fp: String,
      resized_payload: Array[Byte])

  /** Aspect-preserving fit-in-box resize of the REAL decoded frame 0:
    * integer downscale factor `k = max(1, ceil(w/maxW), ceil(h/maxH))`,
    * output dims `max(1, dim/k)`, nearest-neighbor resample
    * (`out(x,y,b) = in(x·k, y·k, b)` per raster band — exact integer
    * sampling, so the (0,0) corner pixel survives and the DuckDB oracle
    * can verify pixels end-to-end from the generator's closed form).
    * Output payload is the resized image re-encoded as PNG (container
    * normalization; PNG carries gray, indexed and RGB losslessly) plus
    * `resized_fp`, an MD5 over the resized raster's samples
    * (band-interleaved row-major, one byte per sample) so downstream
    * caching/dedup keys on PIXELS, not encoder byte quirks.
    */
  final case class Resize(idColumn: String = "doc_id",
                          payloadColumn: String = "payload",
                          maxW: Long = 640L,
                          maxH: Long = 360L)
      extends Wrangler {
    require(maxW >= 1 && maxH >= 1, "target box must be positive")
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, payloadColumn))
      val spark = df.sparkSession
      import spark.implicits._
      val (mw, mh) = (maxW, maxH)
      df.select(col(idColumn).cast("long"), col(payloadColumn).cast("binary"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5")
          it.map { case (id, payload) =>
            val d = decodeImage(id, payload)
            val (w, h) = (d.width.toLong, d.height.toLong)
            val k = math.max(1L, math.max((w + mw - 1) / mw, (h + mh - 1) / mh))
            val ow = math.max(1L, w / k).toInt
            val oh = math.max(1L, h / k).toInt
            val in = d.frame0.getRaster
            val bands = in.getNumBands
            val cm = d.frame0.getColorModel
            val out = new BufferedImage(cm,
              cm.createCompatibleWritableRaster(ow, oh),
              cm.isAlphaPremultiplied, null)
            val outR = out.getRaster
            val pix = new Array[Byte](ow * oh * bands)
            var y = 0
            var i = 0
            while (y < oh) {
              var x = 0
              while (x < ow) {
                var b = 0
                while (b < bands) {
                  val s = in.getSample((x * k).toInt, (y * k).toInt, b)
                  outR.setSample(x, y, b, s)
                  pix(i) = s.toByte
                  i += 1
                  b += 1
                }
                x += 1
              }
              y += 1
            }
            md.reset()
            val fp = md.digest(pix).map(b => f"$b%02x").mkString
            val bos = new java.io.ByteArrayOutputStream()
            ImageIO.write(out, "png", bos)
            ResizeRow(id, d.fmt, w, h, k, ow.toLong, oh.toLong,
              d.corner.toLong, fp, bos.toByteArray)
          }
        }
        .toDF()
    }
  }
}
