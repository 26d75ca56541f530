package graft.operators

import java.io.ByteArrayInputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.MediaGen

/** Real-codec specs for the multimodal layer: the payloads are REAL
  * PNG / animated-GIF / JPEG bytes (encoded via `javax.imageio`), and
  * every assertion pins the decode output against either the MediaGen
  * closed form or an independent per-pixel recompute in this spec.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def mediaDF(ids: Long*) =
    MediaGen.AttachPayload().transform(ids.toDF("doc_id"))

  test("MediaGen payloads carry real image magic and are deterministic") {
    val png = MediaGen.payloadFor(4L)
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P')
    val gif = MediaGen.payloadFor(5L)
    assert(new String(gif.take(4), "US-ASCII") == "GIF8")
    assert(MediaGen.payloadFor(4L).toSeq == png.toSeq)
    assert(MediaGen.payloadFor(5L).toSeq == gif.toSeq)
  }

  test("MediaFeatures: PNG decode matches the generator closed form") {
    val ids = Seq(0L, 2L, 96L, 200L, 511L * 2L)
    val rows = Multimodal.MediaFeatures().transform(mediaDF(ids: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- ids) {
      val r = rows(id)
      assert(r.getAs[String]("fmt") == "png")
      assert(r.getAs[Long]("width") == MediaGen.widthOf(id))
      assert(r.getAs[Long]("height") == MediaGen.heightOf(id))
      assert(r.getAs[Long]("n_frames") == 1L)
      assert(r.getAs[Long]("frame_stride") == 1L)
      assert(r.getAs[Long]("corner_px") == id % 256L)
      assert(r.getAs[Long]("byte_len") == MediaGen.payloadFor(id).length)
    }
  }

  test("MediaFeatures: animated GIF frame count and palette pixels are real") {
    val ids = Seq(1L, 3L, 7L, 13L, 27L) // frames 2,4,1,7,7
    val rows = Multimodal.MediaFeatures(maxSample = 4)
      .transform(mediaDF(ids: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- ids) {
      val r = rows(id)
      assert(r.getAs[String]("fmt") == "gif")
      assert(r.getAs[Long]("width") == MediaGen.widthOf(id))
      assert(r.getAs[Long]("height") == MediaGen.heightOf(id))
      assert(r.getAs[Long]("n_frames") == 1L + id % 7L)
      assert(r.getAs[Long]("frame_stride") == (1L + id % 7L + 3L) / 4L)
      assert(r.getAs[Long]("corner_px") == 85L * (id % 4L))
    }
  }

  test("MediaFeatures: JPEG headers decode exactly (pixels lossy by design)") {
    val df = Seq(9L, 14L).map(id => (id, MediaGen.encodeJpeg(id)))
      .toDF("doc_id", "payload")
    val rows = Multimodal.MediaFeatures().transform(df)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(9L, 14L)) {
      assert(rows(id).getAs[String]("fmt") == "jpeg")
      assert(rows(id).getAs[Long]("width") == MediaGen.widthOf(id))
      assert(rows(id).getAs[Long]("height") == MediaGen.heightOf(id))
      assert(rows(id).getAs[Long]("n_frames") == 1L)
    }
  }

  test("corrupt payloads fail loud with the offending id") {
    val junk = Seq((42L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
      .toDF("doc_id", "payload")
    val e1 = intercept[org.apache.spark.SparkException](
      Multimodal.MediaFeatures().transform(junk).collect())
    assert(e1.getMessage.contains("media 42") ||
      e1.getCause.getMessage.contains("media 42"))

    val truncated = Seq((43L, MediaGen.payloadFor(4L).take(40)))
      .toDF("doc_id", "payload")
    val e2 = intercept[org.apache.spark.SparkException](
      Multimodal.MediaFeatures().transform(truncated).collect())
    assert(e2.getMessage.contains("media 43") ||
      e2.getCause.getMessage.contains("media 43"))

    // Resize shares the fail-loud decode
    val e3 = intercept[org.apache.spark.SparkException](
      Multimodal.Resize().transform(junk).collect())
    assert(e3.getMessage.contains("media 42") ||
      e3.getCause.getMessage.contains("media 42"))
  }

  // ------------------------------------------------------- WAV audio

  test("AudioGen payloads are real RIFF/WAVE containers, deterministic, " +
    "and sized header + 2 bytes per sample") {
    val p = graft.sources.AudioGen.payloadFor(3L)
    assert(new String(p.take(4), "US-ASCII") == "RIFF")
    assert(new String(p.slice(8, 12), "US-ASCII") == "WAVE")
    assert(graft.sources.AudioGen.payloadFor(3L).toSeq == p.toSeq)
    val n = graft.sources.AudioGen.framesOf(3L) *
      graft.sources.AudioGen.channelsOf(3L)
    assert(p.length >= 44 + n * 2, s"${p.length} vs ${44 + n * 2}")
  }

  test("AudioFeatures: real javax.sound.sampled decode matches the " +
    "generator closed forms — header fields AND the full sample stream") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 7L, 100L, 999L)
    val df = graft.sources.AudioGen.AttachPayload()
      .transform(ids.toDF("doc_id"))
    val rows = Multimodal.AudioFeatures().transform(df)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- ids) {
      val r = rows(id)
      assert(r.getAs[String]("fmt") == "wav")
      assert(r.getAs[Long]("sample_rate") ==
        graft.sources.AudioGen.sampleRateOf(id))
      assert(r.getAs[Long]("channels") ==
        graft.sources.AudioGen.channelsOf(id))
      val frames = graft.sources.AudioGen.framesOf(id)
      assert(r.getAs[Long]("n_frames") == frames)
      assert(r.getAs[Long]("duration_ms") ==
        frames * 1000L / graft.sources.AudioGen.sampleRateOf(id))
      assert(r.getAs[Long]("first_sample") ==
        graft.sources.AudioGen.sampleOf(id, 0L))
      val n = frames * graft.sources.AudioGen.channelsOf(id)
      val expSum = (0L until n)
        .map(graft.sources.AudioGen.sampleOf(id, _)).sum
      assert(r.getAs[Long]("sample_sum") == expSum,
        s"id=$id sample_sum drift")
      assert(r.getAs[Long]("byte_len") >= 44L + n * 2L)
    }
  }

  test("AudioFeatures: corrupt / truncated / non-WAV payloads fail " +
    "loud with the offending id") {
    val junk = Seq((51L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))
      .toDF("doc_id", "payload")
    val e1 = intercept[org.apache.spark.SparkException](
      Multimodal.AudioFeatures().transform(junk).collect())
    assert(e1.getMessage.contains("media 51") ||
      e1.getCause.getMessage.contains("media 51"))

    // RIFF/WAVE magic intact but the sample data chopped mid-stream
    val full = graft.sources.AudioGen.payloadFor(6L)
    val truncated = Seq((52L, full.take(full.length / 2)))
      .toDF("doc_id", "payload")
    val e2 = intercept[org.apache.spark.SparkException](
      Multimodal.AudioFeatures().transform(truncated).collect())
    assert(e2.getMessage.contains("media 52") ||
      e2.getCause.getMessage.contains("media 52"))

    // an IMAGE payload is not audio — the sniff rejects it by id
    val png = Seq((53L, MediaGen.payloadFor(4L))).toDF("doc_id", "payload")
    val e3 = intercept[org.apache.spark.SparkException](
      Multimodal.AudioFeatures().transform(png).collect())
    assert(e3.getMessage.contains("media 53") ||
      e3.getCause.getMessage.contains("media 53"))

    // a crafted header declaring sample rate 0 fails WITH the id,
    // never a bare division error (the fmt chunk's rate field sits at
    // bytes 24..27 of the canonical RIFF header, little-endian)
    val zeroRate = graft.sources.AudioGen.payloadFor(6L).clone()
    zeroRate(24) = 0; zeroRate(25) = 0; zeroRate(26) = 0; zeroRate(27) = 0
    val e4 = intercept[org.apache.spark.SparkException](
      Multimodal.AudioFeatures().transform(
        Seq((61L, zeroRate)).toDF("doc_id", "payload")).collect())
    assert(e4.getMessage.contains("media 61") ||
      e4.getCause.getMessage.contains("media 61"))
  }

  test("MediaFeatures redirects WAV and AVI payloads to their REAL " +
    "decoders by container magic — no placeholder path exists (r13: " +
    "the stub is retired)") {
    val wav = Seq((71L, graft.sources.AudioGen.payloadFor(3L)))
      .toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.MediaFeatures().transform(wav).collect())
    assert(e.getMessage.contains("AudioFeatures") ||
      e.getCause.getMessage.contains("AudioFeatures"))
    val avi = Seq((72L, graft.sources.VideoGen.payloadFor(3L)))
      .toDF("doc_id", "payload")
    val e2 = intercept[org.apache.spark.SparkException](
      Multimodal.MediaFeatures().transform(avi).collect())
    assert(e2.getMessage.contains("VideoFeatures") ||
      e2.getCause.getMessage.contains("VideoFeatures"))
    // an opaque payload with no known magic fails loud with the id
    val junk = Seq((73L, Array[Byte](9, 9, 9, 9, 9, 9, 9, 9, 9, 9)))
      .toDF("doc_id", "payload")
    val e3 = intercept[org.apache.spark.SparkException](
      Multimodal.MediaFeatures().transform(junk).collect())
    assert(e3.getMessage.contains("media 73") ||
      e3.getCause.getMessage.contains("media 73"))
  }

  test("Resize: nearest-neighbor pixels verified against an independent recompute") {
    val id = 100L // png 116? width=16+(3700%97), deterministic
    val out = Multimodal.Resize(maxW = 40L, maxH = 30L)
      .transform(mediaDF(id)).head()
    val w = MediaGen.widthOf(id)
    val h = MediaGen.heightOf(id)
    val k = math.max(1L, math.max((w + 39) / 40, (h + 29) / 30))
    assert(out.getAs[Long]("width") == w)
    assert(out.getAs[Long]("height") == h)
    assert(out.getAs[Long]("scale_den") == k)
    val ow = math.max(1L, w / k).toInt
    val oh = math.max(1L, h / k).toInt
    assert(out.getAs[Long]("out_w") == ow && out.getAs[Long]("out_h") == oh)
    assert(out.getAs[Long]("corner_px") == id % 256L)

    // decode the emitted PNG payload back and check EVERY pixel against
    // the generator function sampled at (x*k, y*k)
    val back = ImageIO.read(
      new ByteArrayInputStream(out.getAs[Array[Byte]]("resized_payload")))
    assert(back.getWidth == ow && back.getHeight == oh)
    val raster = back.getRaster
    val pix = new Array[Byte](ow * oh)
    for (y <- 0 until oh; x <- 0 until ow) {
      val expect = MediaGen.pngPixel(id, (x * k).toInt, (y * k).toInt)
      assert(raster.getSample(x, y, 0) == expect,
        s"pixel ($x,$y) of resized $id")
      pix(y * ow + x) = expect.toByte
    }
    // fingerprint is the md5 of exactly those samples
    val fp = MessageDigest.getInstance("MD5").digest(pix)
      .map(b => f"$b%02x").mkString
    assert(out.getAs[String]("resized_fp") == fp)
  }

  test("Resize: GIF frame-0 resample keeps palette values and corner") {
    val id = 7L // gif, corner 85*(7%4)=255
    val out = Multimodal.Resize(maxW = 20L, maxH = 20L)
      .transform(mediaDF(id)).head()
    val w = MediaGen.widthOf(id)
    val h = MediaGen.heightOf(id)
    val k = math.max(1L, math.max((w + 19) / 20, (h + 19) / 20))
    assert(out.getAs[Long]("scale_den") == k)
    assert(out.getAs[Long]("corner_px") == 85L * (id % 4L))
    val back = ImageIO.read(
      new ByteArrayInputStream(out.getAs[Array[Byte]]("resized_payload")))
    for (y <- 0 until back.getHeight; x <- 0 until back.getWidth)
      assert(back.getRaster.getSample(x, y, 0) ==
        MediaGen.gifPixel(id, 0, (x * k).toInt, (y * k).toInt))
  }

  test("Resize: media already inside the box is identity (k = 1)") {
    val id = 8L
    val out = Multimodal.Resize(maxW = 10000L, maxH = 10000L)
      .transform(mediaDF(id)).head()
    assert(out.getAs[Long]("scale_den") == 1L)
    assert(out.getAs[Long]("out_w") == MediaGen.widthOf(id))
    assert(out.getAs[Long]("out_h") == MediaGen.heightOf(id))
    // identity resample: payload decodes to the original pixels
    val back = ImageIO.read(
      new ByteArrayInputStream(out.getAs[Array[Byte]]("resized_payload")))
    for (y <- 0 until back.getHeight; x <- 0 until back.getWidth)
      assert(back.getRaster.getSample(x, y, 0) == MediaGen.pngPixel(id, x, y))
  }

  test("FrameSample over real GIF frame counts never exceeds maxSample") {
    val ids = (1L to 41L by 2L) // all gifs, frames 1..7
    val feats = Multimodal.MediaFeatures(maxSample = 4)
      .transform(mediaDF(ids: _*))
    val counts = Multimodal.FrameSample().transform(feats)
      .groupBy("doc_id").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(c => c >= 1 && c <= 4))
    // exact expansion for one known id: 13 -> 7 frames, stride 2 -> 0,2,4,6
    val f13 = Multimodal.FrameSample()
      .transform(Multimodal.MediaFeatures(maxSample = 4)
        .transform(mediaDF(13L)))
      .select("frame_idx").as[Long].collect().toSeq.sorted
    assert(f13 == Seq(0L, 2L, 4L, 6L))
  }
}
