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
  * Image decode is REAL: PNG / JPEG / GIF payloads go through the JDK's
  * `javax.imageio` (headless-safe, no external dependency) — header
  * fields, frame counts (animated GIF) and pixel data all come from the
  * actual codec. Audio decode is REAL too: WAV payloads go through the
  * JDK's `javax.sound.sampled` ([[AudioFeatures]]), format header and
  * every PCM sample. Only VIDEO has no JDK codec, so it can opt into a
  * clearly-documented deterministic placeholder
  * ([[Multimodal.decodeStub]], `stubNonImage = true`); by default an
  * undecodable payload FAILS LOUD with the offending id rather than
  * fabricating data.
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

  /** Deterministic placeholder "decode" for VIDEO media (the one media
    * class without a JDK codec — images decode via `javax.imageio`,
    * WAV audio via `javax.sound.sampled`/[[AudioFeatures]]): header-ish
    * fields derived from the payload bytes via MD5 (portable to any
    * engine for verification). Only reachable behind an explicit
    * `stubNonImage = true` opt-in.
    */
  private[operators] def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val h = graft.functions.Portable.md5Prefix(
      MessageDigest.getInstance("MD5").digest(payload))
    val width = h % 1280L
    val height = h % 720L
    val frames = payload.length % 16L + 1L
    (width, height, frames)
  }

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
        s"not found in ${if (payload == null) 0 else payload.length} bytes); " +
        "use stubNonImage=true only for non-image media"))
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
    * Undecodable payloads fail loud with the id; `stubNonImage = true`
    * routes them to the documented audio/video placeholder instead
    * (`fmt = "stub"`, corner −1).
    *
    * Implemented as a typed `Dataset.mapPartitions` — the per-partition
    * iterator is where the codec streams payload batches — which stays
    * inside whole-stage codegen (DeserializeToObject/MapPartitions/
    * SerializeFromObject), unlike an `df.rdd` round-trip that would cut
    * the plan at an ExternalRDD scan and fall out of Tungsten.
    */
  final case class MediaFeatures(idColumn: String = "doc_id",
                                 payloadColumn: String = "payload",
                                 maxSample: Int = 4,
                                 stubNonImage: Boolean = false)
      extends Wrangler {
    require(maxSample >= 1, "maxSample must be positive")
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, payloadColumn))
      val spark = df.sparkSession
      import spark.implicits._
      val (ms, stub) = (maxSample, stubNonImage)
      df.select(col(idColumn).cast("long"), col(payloadColumn).cast("binary"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, payload) =>
            if (stub && sniffFormat(payload).isEmpty) {
              // the stub covers VIDEO only (no JDK codec): a WAV is
              // REAL, decodable audio — fabricating header fields for
              // it would be exactly the dishonesty the stub opt-in is
              // scoped to avoid
              if (sniffWav(payload)) throw new IllegalArgumentException(
                s"media $id: payload is WAV audio — decode it with " +
                  "AudioFeatures (the stub is for video only)")
              val (w, h, frames) = decodeStub(payload)
              MediaFeatureRow(id, "stub", payload.length.toLong, w, h,
                frames, (frames + ms - 1) / ms, -1L)
            } else {
              val d = decodeImage(id, payload)
              // ceil division: at most maxSample sampled frames
              val stride = (d.nFrames + ms - 1) / ms
              MediaFeatureRow(id, d.fmt, payload.length.toLong,
                d.width.toLong, d.height.toLong, d.nFrames.toLong,
                stride.toLong, d.corner.toLong)
            }
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
    * audio sibling of [[MediaFeatures]], and the operator that retires
    * the audio stub ([[decodeStub]] now covers only video, the one
    * media class without a JDK codec). Real `javax.sound.sampled`
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
