package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode / feature-extraction runs per-partition
  * over the binary batches. The actual media codecs are STUBBED with a
  * deterministic byte-level fake (this container has no image/audio
  * libraries) — the Spark-side shape is real: binary schema, typed
  * per-partition iteration without collecting to the driver, and a
  * metadata struct contract downstream operators can rely on.
  *
  * At 100 TB the decode is the classic embarrassingly-parallel map: no
  * shuffle, bounded memory per partition (one payload at a time via the
  * partition iterator), and `spark.sql.files.maxPartitionBytes` controls
  * batch sizing.
  */
object Multimodal {

  /** Deterministic fake "decode": header-ish fields derived from the
    * payload bytes via MD5 (portable to any engine for verification).
    * A real build replaces ONLY this function with the codec call.
    */
  private[operators] def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val h = graft.functions.Portable.md5Prefix(
      MessageDigest.getInstance("MD5").digest(payload))
    val width = h % 1280L
    val height = h % 720L
    val frames = payload.length % 16L + 1L
    (width, height, frames)
  }

  /** Typed output row of [[MediaFeatures]] (field order = output schema). */
  private[operators] final case class MediaFeatureRow(
      doc_id: Long, byte_len: Long, width: Long, height: Long,
      n_frames: Long, frame_stride: Long)

  /** Extract media features from a binary payload column. Input columns:
    * `idColumn` (long) + `payloadColumn` (binary). Output: one row per
    * media with decoded dimensions, frame count and the sampling stride
    * for `maxSample` frames.
    *
    * Implemented as a typed `Dataset.mapPartitions` — the per-partition
    * iterator is where a real codec would stream payload batches — which
    * stays inside whole-stage codegen (DeserializeToObject/MapPartitions/
    * SerializeFromObject), unlike an `df.rdd` round-trip that would cut
    * the plan at an ExternalRDD scan and fall out of Tungsten.
    */
  final case class MediaFeatures(idColumn: String = "doc_id",
                                 payloadColumn: String = "payload",
                                 maxSample: Int = 4)
      extends Wrangler {
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, payloadColumn))
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idColumn).cast("long"), col(payloadColumn).cast("binary"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, payload) =>
            val (w, h, frames) = decodeStub(payload)
            // ceil division: at most maxSample sampled frames
            val stride = (frames + maxSample - 1) / maxSample
            MediaFeatureRow(id, payload.length.toLong, w, h, frames, stride)
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

  /** Typed output row of [[Resize]]. */
  private[operators] final case class ResizeRow(
      doc_id: Long, width: Long, height: Long, scale_den: Long,
      out_w: Long, out_h: Long, resized_fp: String)

  /** Aspect-preserving fit-in-box resize of the decoded media: integer
    * downscale factor `k = max(1, ceil(w/maxW), ceil(h/maxH))`, output
    * dims `max(1, dim/k)`, plus a fingerprint of (payload, out dims) so
    * downstream caching/dedup can key on the RESIZED artifact. The pixel
    * transform itself is the stubbed codec step (see [[decodeStub]]);
    * the dimension algebra, per-partition batch shape and fingerprint
    * contract are real — a production build swaps only the codec call.
    * Exact integer math end to end, so the DuckDB oracle reproduces it
    * bit-for-bit.
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
            val (w, h, _) = decodeStub(payload)
            val k = math.max(1L, math.max((w + mw - 1) / mw, (h + mh - 1) / mh))
            val ow = math.max(1L, w / k)
            val oh = math.max(1L, h / k)
            md.reset()
            val payloadHex = md.digest(payload)
              .map(b => f"$b%02x").mkString
            md.reset()
            val fp = md.digest(s"$payloadHex-${ow}x$oh"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              .map(b => f"$b%02x").mkString
            ResizeRow(id, w, h, k, ow, oh, fp)
          }
        }
        .toDF()
    }
  }
}
