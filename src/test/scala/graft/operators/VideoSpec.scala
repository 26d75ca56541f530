package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.VideoGen

/** MJPEG-in-AVI decode goldens: the real RIFF walk + per-frame JDK JPEG
  * decode against [[VideoGen]]'s closed forms, and the corrupt-container
  * fail-loud contract. The corpus-scale sweep is the `mm_video` oracle
  * row; the uniform-frame JPEG exactness this relies on is asserted
  * per-pixel here.
  */
class VideoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def videoDF(ids: Long*) =
    VideoGen.AttachPayload().transform(ids.toDF("doc_id"))

  test("decode matches the generator's closed forms: dims, frame " +
    "count, fps, frame-0 corner and the corner sum over EVERY frame") {
    val ids = Seq(0L, 1L, 5L, 17L, 100L, 9999L)
    val rows = Multimodal.VideoFeatures().transform(videoDF(ids: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    ids.foreach { id =>
      val r = rows(id)
      assert(r.getAs[String]("fmt") == "mjpeg_avi")
      assert(r.getAs[Long]("width") == VideoGen.widthOf(id), s"id=$id")
      assert(r.getAs[Long]("height") == VideoGen.heightOf(id), s"id=$id")
      assert(r.getAs[Long]("n_frames") == VideoGen.framesOf(id), s"id=$id")
      assert(r.getAs[Long]("fps") == VideoGen.fpsOf(id), s"id=$id")
      assert(r.getAs[Long]("corner_px") == VideoGen.cornerOf(id), s"id=$id")
      assert(r.getAs[Long]("corner_sum") == VideoGen.cornerSumOf(id),
        s"id=$id")
      assert(r.getAs[Long]("duration_ms") ==
        VideoGen.framesOf(id) * 1000L / VideoGen.fpsOf(id))
    }
  }

  test("uniform frames are the exactness contract: every decoded pixel " +
    "of every frame equals the generator's value (JPEG DC-only blocks " +
    "round-trip bit-exactly through the JDK codec)") {
    val id = 42L
    val payload = VideoGen.payloadFor(id)
    // walk the movi chunks by hand and decode each frame fully
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var f = 0
    while (off + 8 <= payload.length) {
      val cc = new String(payload, off, 4, "US-ASCII")
      val size = bb.getInt(off + 4)
      if (cc == "LIST" &&
        new String(payload, off + 8, 4, "US-ASCII") == "movi") {
        var o = off + 12
        val end = off + 8 + size
        while (o + 8 <= end) {
          val sub = new String(payload, o, 4, "US-ASCII")
          val ssz = bb.getInt(o + 4)
          if (sub == "00dc") {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                java.util.Arrays.copyOfRange(payload, o + 8, o + 8 + ssz)))
            val expect = VideoGen.framePixel(id, f)
            for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
              assert(img.getRaster.getSample(x, y, 0) == expect,
                s"frame $f pixel ($x,$y)")
            f += 1
          }
          o += 8 + ssz + (ssz & 1)
        }
        off = end
      } else off += 8 + size + (size & 1)
    }
    assert(f == VideoGen.framesOf(id).toInt)
  }

  test("corrupt containers fail loud naming the media id") {
    def decodeOf(id: Long, payload: Array[Byte]) =
      Multimodal.VideoFeatures().transform(
        Seq((id, payload)).toDF("doc_id", "payload")).collect()
    def failsWith(id: Long, payload: Array[Byte], needle: String): Unit = {
      val e = intercept[Exception](decodeOf(id, payload))
      val msg = e.getMessage +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains(s"media $id") && msg.contains(needle),
        s"wanted `$needle` in: $msg")
    }
    val good = VideoGen.payloadFor(7L)
    // not an AVI at all
    failsWith(1L, "plainly not a riff file".getBytes, "not an AVI")
    // truncated payload: the outer RIFF size catches it first
    failsWith(2L, good.take(good.length - 40), "payload holds")
    // truncated mid-movi with a CONSISTENT outer size: the last frame
    // chunk now overruns its container
    val trunc = good.take(good.length - 40)
    val newSize = trunc.length - 8
    trunc(4) = (newSize & 0xFF).toByte
    trunc(5) = ((newSize >> 8) & 0xFF).toByte
    trunc(6) = ((newSize >> 16) & 0xFF).toByte
    trunc(7) = ((newSize >> 24) & 0xFF).toByte
    failsWith(22L, trunc, "overrunning")
    // RIFF size field beyond the actual payload
    val short = good.clone(); short(4) = (short(4) + 64).toByte
    failsWith(3L, short, "payload holds")
    // header/frame dimension mismatch: corrupt avih's dwWidth (at
    // avih data offset +32)
    val avih = indexOfChunk(good, "avih")
    val badW = good.clone(); badW(avih + 8 + 32) = 1
    failsWith(4L, badW, "header declares")
    // a frame chunk whose bytes are not JPEG
    val idx = indexOfChunk(good, "00dc")
    val badFrame = good.clone()
    badFrame(idx + 8) = 0; badFrame(idx + 9) = 0 // break the JPEG magic
    failsWith(5L, badFrame, "not a decodable image")
  }

  /** Offset of the first `cc` chunk header in the payload (test helper —
    * scans for the fourcc bytes). */
  private def indexOfChunk(p: Array[Byte], cc: String): Int = {
    val pat = cc.getBytes("US-ASCII")
    (0 until p.length - 4).find(i =>
      p(i) == pat(0) && p(i + 1) == pat(1) &&
        p(i + 2) == pat(2) && p(i + 3) == pat(3)).get
  }

  test("generator guards: negative ids refused; payloads are real RIFF " +
    "containers the image/audio operators refuse with a redirect") {
    assertThrows[IllegalArgumentException](VideoGen.payloadFor(-1L))
    assert(Multimodal.sniffAvi(VideoGen.payloadFor(0L)))
  }
}
