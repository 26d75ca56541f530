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
    "count, exact rate/scale, frame-0 corner and the corner sum over " +
    "EVERY frame — including NTSC-fractional-rate and audio-interleaved " +
    "two-stream containers") {
    // 4, 19: id % 5 == 4 → 30000/1001 (29.97 fps); 1, 19, 100:
    // id % 3 == 1 → auds stream FIRST, video is stream 01 with 00wb
    // audio chunks interleaved; 19 is both at once
    val ids = Seq(0L, 1L, 4L, 5L, 17L, 19L, 100L, 9999L)
    val rows = Multimodal.VideoFeatures().transform(videoDF(ids: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    ids.foreach { id =>
      val r = rows(id)
      assert(r.getAs[String]("fmt") == "mjpeg_avi")
      assert(r.getAs[Long]("width") == VideoGen.widthOf(id), s"id=$id")
      assert(r.getAs[Long]("height") == VideoGen.heightOf(id), s"id=$id")
      assert(r.getAs[Long]("n_frames") == VideoGen.framesOf(id), s"id=$id")
      assert(r.getAs[Long]("fps_num") == VideoGen.rateOf(id), s"id=$id")
      assert(r.getAs[Long]("fps_den") == VideoGen.scaleOf(id), s"id=$id")
      assert(r.getAs[Long]("corner_px") == VideoGen.cornerOf(id), s"id=$id")
      assert(r.getAs[Long]("corner_sum") == VideoGen.cornerSumOf(id),
        s"id=$id")
      assert(r.getAs[Long]("duration_ms") == VideoGen.durationMsOf(id),
        s"id=$id")
    }
    // the fractional case really is fractional: id 4 has 6 frames at
    // 30000/1001; truncated integer fps (29) would give
    // 6 * 1000 / 29 = 206 ms, the exact form 6 * 1000 * 1001 / 30000
    // = 200 ms
    assert(VideoGen.rateOf(4L) == 30000L && VideoGen.scaleOf(4L) == 1001L)
    assert(rows(4L).getAs[Long]("duration_ms") ==
      VideoGen.framesOf(4L) * 1000L * 1001L / 30000L)
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
    val good = VideoGen.payloadFor(6L) // id % 3 != 1: single-stream, 00dc
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
    // RIFF size field beyond the actual payload (+65536 via the third
    // size byte — bumping the LOW byte can wrap and shrink the size)
    val short = good.clone(); short(6) = (short(6) + 1).toByte
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

  /** Splice `ins` into `p` at `at` and bump the little-endian u32 size
    * fields at each offset in `sizeFixups` by `ins.length` (test helper
    * for crafting structurally-consistent adversarial containers). */
  private def splice(p: Array[Byte], at: Int, ins: Array[Byte],
                     sizeFixups: Seq[Int]): Array[Byte] = {
    val out = p.take(at) ++ ins ++ p.drop(at)
    sizeFixups.foreach { off =>
      val bb = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(off, bb.getInt(off) + ins.length)
    }
    out
  }

  private def featuresOf(id: Long, payload: Array[Byte]) =
    Multimodal.VideoFeatures().transform(
      Seq((id, payload)).toDF("doc_id", "payload")).collect()(0)

  test("a `..dc` chunk OUTSIDE `LIST movi` is container junk, not a " +
    "frame — the decode ignores it and matches the clean payload") {
    val id = 6L // no audio: vids is stream 00
    val good = VideoGen.payloadFor(id)
    // a top-level 00dc chunk with garbage bytes, spliced between hdrl
    // and movi; only the outer RIFF size needs fixing up
    val junk = "00dc".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4)
    val hdrlOff = indexOfChunk(good, "LIST")
    val bb = java.nio.ByteBuffer.wrap(good)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hdrlEnd = hdrlOff + 8 + bb.getInt(hdrlOff + 4)
    val crafted = splice(good, hdrlEnd, junk, Seq(4))
    val r = featuresOf(id, crafted)
    assert(r.getAs[Long]("n_frames") == VideoGen.framesOf(id))
    assert(r.getAs[Long]("corner_sum") == VideoGen.cornerSumOf(id))
  }

  test("a `NNdc` chunk of ANOTHER stream inside movi is skipped — only " +
    "the vids stream's number decodes into the pixel probes") {
    val id = 6L // vids is stream 00; inject a bogus 05dc inside movi
    val good = VideoGen.payloadFor(id)
    val moviOff = indexOfChunk(good, "movi") // LIST type fourcc offset
    val junk = "05dc".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    // bump the movi LIST's size (its header sits 8 bytes before the
    // type fourcc) and the outer RIFF size
    val crafted = splice(good, moviOff + 4, junk, Seq(moviOff - 4, 4))
    val r = featuresOf(id, crafted)
    assert(r.getAs[Long]("n_frames") == VideoGen.framesOf(id))
    assert(r.getAs[Long]("corner_sum") == VideoGen.cornerSumOf(id))
  }

  test("a second vids stream header fails loud instead of silently " +
    "overwriting rate/scale/length") {
    val id = 7L // audio id: the auds strl precedes the vids strl
    val good = VideoGen.payloadFor(id)
    // turn the AUDIO stream's strh into a second plausible vids strh:
    // fccType `auds` → `vids`, handler 0 → `MJPG`
    val strhOff = indexOfChunk(good, "auds")
    val crafted = good.clone()
    "vids".getBytes("US-ASCII").copyToArray(crafted, strhOff)
    "MJPG".getBytes("US-ASCII").copyToArray(crafted, strhOff + 4)
    val e = intercept[Exception](featuresOf(id, crafted))
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains(s"media $id") && msg.contains("second vids"),
      s"wanted `second vids` in: $msg")
  }

  test("generator guards: negative ids refused; payloads are real RIFF " +
    "containers the image/audio operators refuse with a redirect") {
    assertThrows[IllegalArgumentException](VideoGen.payloadFor(-1L))
    assert(Multimodal.sniffAvi(VideoGen.payloadFor(0L)))
  }

  test("audio demux matches the generator's closed forms byte-for-" +
    "byte; silent containers are the explicit empty class; non-AVI " +
    "payloads fail loud") {
    val ids = Seq(0L, 1L, 4L, 7L, 19L, 100L) // 1, 7, 19, 100 have audio
    val rows = Multimodal.VideoAudioDemux().transform(videoDF(ids: _*))
      .as[(Long, Boolean, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == ids.sorted)
    rows.foreach { case (id, hasA, nCh, nB, bSum, fb, sr, ch) =>
      assert(hasA == VideoGen.hasAudioOf(id), s"has_audio of $id")
      if (hasA) {
        assert(nCh == VideoGen.framesOf(id), s"chunks of $id")
        assert(nB == VideoGen.audioBytesOf(id), s"bytes of $id")
        assert(bSum == VideoGen.audioSumOf(id), s"byte sum of $id")
        assert(fb == VideoGen.audioSample(id, 0).toLong, s"first of $id")
        assert(sr == 8000L && ch == 1L, s"format of $id")
      } else
        assert((nCh, nB, bSum, fb, sr, ch) == ((0L, 0L, 0L, -1L, 0L, 0L)),
          s"empty class of $id")
    }
    val e = intercept[Exception] {
      Multimodal.VideoAudioDemux().transform(
        Seq((5L, "not an avi".getBytes)).toDF("doc_id", "payload"))
        .collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("media 5") && msg.contains("not an AVI"))
  }

  test("a second auds stream header fails loud; the demux ignores the " +
    "VIDEO stream's dc chunks entirely") {
    val id = 19L // audio container
    val good = VideoGen.payloadFor(id)
    val strhOff = indexOfChunk(good, "auds")
    val crafted = good.clone()
    // craft the VIDEO strh into a second auds: find the vids strh
    val vidsOff = indexOfChunk(good, "vids")
    "auds".getBytes("US-ASCII").copyToArray(crafted, vidsOff)
    val e = intercept[Exception] {
      Multimodal.VideoAudioDemux().transform(
        Seq((id, crafted)).toDF("doc_id", "payload")).collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains(s"media $id") && msg.contains("second auds"),
      s"wanted `second auds` in: $msg")
    assert(strhOff != vidsOff)
  }
}
