package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.operators.{HeapPrune, Similarity}

/** Streaming ANN against a STATIC persisted IVF member index — the
  * stream-static face of [[graft.operators.Similarity.IncrementalIvfTopK]]
  * (the same move [[StreamingIncrementalDedup]] makes for exact dedup):
  * query vectors arriving on a stream probe their `nprobe` closest
  * inverted lists through a stream-static cluster equi-join, are scored
  * with the family's exact integer-cosine expressions, and each
  * (event-time window, query) emits its top-`k` neighbors once the
  * watermark closes the window (append mode).
  *
  * The per-query top-k is a typed [[Aggregator]] holding a bounded
  * best-`k` buffer under [[HeapPrune.worstFirstByScore]] — the SAME
  * total order as the batch rank window (NaN-largest, −0.0 == 0.0,
  * id-asc ties), so stream and batch agree on every neighbor set.
  * State per open (window, query) is O(k), NEVER the candidate list —
  * the stateful-agg analogue of the batch map-side heap prune (a
  * `collect_list` agg would hold a whole inverted list per query).
  *
  * Centroids are re-derived from the index at plan time (driver-held,
  * `nlist` rows — the [[StreamingDsir]] driver-table pattern); the
  * static side re-executes per micro-batch, so persist the index.
  * Folding admitted vectors back in is a batch-side
  * `IncrementalIvf.foldBatch` at a compaction cadence, picked up on
  * restart — the documented horizon trade of the streaming family.
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingIvfTopK(memberIndex: DataFrame,
                             idColumn: String = "vec_id",
                             vecColumn: String = "embedding",
                             tsColumn: String = "ts",
                             windowDuration: String = "1 minute",
                             watermarkDelay: String = "10 minutes",
                             nlist: Int = 16,
                             nprobe: Int = 4,
                             k: Int = 5) {
  require(nprobe >= 1, "nprobe must be >= 1")
  require(k >= 1, "k must be >= 1")

  /** `df` must be a streaming DataFrame. Unlike the other windowed
    * streaming operators, the watermark is (re-)asserted INTERNALLY
    * from `watermarkDelay`: the quantize+probe flatMap mints fresh
    * output attributes, which silently drops any caller-set event-time
    * watermark tag — append mode would then reject the aggregation.
    * Output: one row per (window_start, window_end, query_id, rank)
    * with `neighbor_id` and the exact `cosine`.
    */
  def transform(df: DataFrame): DataFrame = {
    graft.util.SparkUtil.validateColumns(df,
      Seq(idColumn, tsColumn, vecColumn))
    graft.util.SparkUtil.validateColumns(memberIndex,
      Seq("vec_id", "cluster", "q", "nrm"))
    require(df.isStreaming,
      "StreamingIvfTopK.transform needs a streaming DataFrame (with a " +
        s"watermark on `$tsColumn`); use Similarity.IncrementalIvfTopK " +
        "for batch probes")
    val spark = df.sparkSession
    import spark.implicits._
    val index = memberIndex.select(col("vec_id").cast("long").as("id"),
      col("cluster").cast("long"), col("q"), col("nrm").cast("long"))
    val centroids = Similarity.pickCentroids(index, nlist)
    require(centroids.nonEmpty,
      "StreamingIvfTopK: empty member index — fit " +
        "IncrementalIvf.memberIndex on a non-empty corpus first")
    val np = nprobe
    // quantize + probe in one typed flatMap (the quantizedRows
    // arithmetic with the event time carried through)
    val probes = df.select(col(tsColumn), col(idColumn).cast("long"),
        col(vecColumn).cast("array<float>"))
      .as[(java.sql.Timestamp, Long, Array[Float])]
      .flatMap { case (ts, id, vec) =>
        val q = new Array[Long](vec.length)
        var i = 0
        var nrm = 0L
        while (i < vec.length) {
          val v = Math.round(vec(i).toDouble * 10000)
          q(i) = v; nrm += v * v; i += 1
        }
        Similarity.rankedClusterIds(centroids, q, nrm).take(np)
          .map(c => (ts, id, q, nrm, c.toLong))
      }
      .toDF(tsColumn, "query_id", "qq", "qnrm", "cluster")
    val scored = probes.join(index, Seq("cluster"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", round(Portable.qCosine(
        Portable.qDot(col("q"), col("qq")), col("nrm"), col("qnrm")), 6))
    // STATELESS map-side prune before the stateful agg — the batch
    // design's move (Similarity.ranked), per (event, query) so the
    // window assignment downstream is untouched: the candidate stream
    // entering the aggregator shrinks from inverted-list volume to
    // partitions x queries x k, and the ScalaAggregator's per-row
    // buffer encode/decode stops dominating (measured 465 s -> the
    // stress row's tens of seconds on the 62M-candidate burst). The
    // prune uses the SAME total order as the aggregator, so results
    // are bit-identical.
    val kk = k
    // event time rides the prune as primitive epoch-µs (a Timestamp
    // object codec per candidate row measurably dominates at
    // inverted-list volumes) and is rebuilt losslessly after
    val pruned = scored.select(unix_micros(col(tsColumn)).as("__us"),
        col("query_id"), col("id"), col("cosine"))
      .as[(Long, Long, Long, Double)]
      .mapPartitions { it =>
        val worstFirst = HeapPrune.worstFirstByScore
        val heaps = scala.collection.mutable.LinkedHashMap
          .empty[(Long, Long),
            scala.collection.mutable.PriorityQueue[(Long, Double)]]
        it.foreach { case (us, qid, id, cos) =>
          val h = heaps.getOrElseUpdate((us, qid),
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          h.enqueue((id, cos))
          if (h.size > kk) h.dequeue()
        }
        heaps.iterator.flatMap { case ((us, qid), h) =>
          h.iterator.map { case (id, cos) => (us, qid, id, cos) }
        }
      }
      .toDF("__us", "query_id", "id", "cosine")
      .withColumn(tsColumn, timestamp_micros(col("__us")))
      .drop("__us")
      .withWatermark(tsColumn, watermarkDelay)
    val topk = udaf(new StreamingIvfTopK.TopKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    pruned
      .groupBy(window(col(tsColumn), windowDuration), col("query_id"))
      .agg(topk(col("id"), col("cosine")).as("__top"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("query_id"),
        posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("window_start"), col("window_end"), col("query_id"),
        (col("__p") + 1L).cast("long").as("rank"),
        col("__e").getField("_1").as("neighbor_id"),
        col("__e").getField("_2").as("cosine"))
  }
}

object StreamingIvfTopK {

  /** Bounded best-`k` aggregator over `(id, score)` pairs under the
    * family's shared total order — O(k) state per group, merge-safe,
    * finish emits best-first exactly like the batch rank window.
    */
  private[streaming] final class TopKAgg(k: Int)
      extends Aggregator[(Long, Double), List[(Long, Double)],
        Seq[(Long, Double)]] {
    // ascending under worstFirstByScore IS best-first (its maximum is
    // the worst kept entry), so trim = sort + take(k) and finish needs
    // no extra ordering work
    private def trim(xs: List[(Long, Double)]): List[(Long, Double)] =
      xs.sorted(HeapPrune.worstFirstByScore).take(k)
    def zero: List[(Long, Double)] = Nil
    def reduce(b: List[(Long, Double)], a: (Long, Double)): List[(Long, Double)] =
      trim(a :: b)
    def merge(b1: List[(Long, Double)], b2: List[(Long, Double)]): List[(Long, Double)] =
      trim(b1 ::: b2)
    def finish(b: List[(Long, Double)]): Seq[(Long, Double)] =
      b.sorted(HeapPrune.worstFirstByScore) // best first
    def bufferEncoder: Encoder[List[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
