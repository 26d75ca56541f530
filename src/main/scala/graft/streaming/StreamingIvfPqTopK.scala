package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.{HeapPrune, Similarity, SimilarityPq}
import graft.util.SparkUtil

/** Streaming ANN against a STATIC persisted IVF-PQ member index — the
  * stream-static face of
  * [[graft.operators.SimilarityPq.IncrementalIvfPqTopK]], and the
  * compressed sibling of [[StreamingIvfTopK]]: query vectors arriving
  * on a stream probe their `nprobe` inverted lists through a
  * stream-static cluster equi-join against the CODES index (the full
  * corpus vectors never enter the stream plan — the index the join
  * scans per micro-batch is `m` codes + a norm per vector), score via
  * per-partition ADC lookup tables, and each (event-time window,
  * query) emits its top-`k` once the watermark closes the window
  * (append mode).
  *
  * Output cosines are the ADC APPROXIMATION (rounded to 6 — exact
  * integer table sums through one IEEE div/sqrt, deterministic),
  * matching the batch probe's `refineWith = None` face bit-for-bit:
  * an exact re-rank needs the full-vector table, which is precisely
  * what a PQ deployment keeps OUT of the serving path — run the batch
  * probe with `refineWith` over the shortlist downstream when exact
  * scores matter.
  *
  * State per open (window, query) is O(k) (the shared [[StreamingIvfTopK
  * .TopKAgg]] under the family's total order), never a candidate list;
  * the stateless ADC+prune pass bounds the aggregator's input at
  * partitions x queries x k rows per micro-batch. Quantizers
  * (centroids + codebooks) re-derive from the index's pick rows at
  * plan time — driver-held, `max(nlist, ksub)` rows.
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingIvfPqTopK(memberIndex: DataFrame,
                               idColumn: String = "vec_id",
                               vecColumn: String = "embedding",
                               tsColumn: String = "ts",
                               windowDuration: String = "1 minute",
                               watermarkDelay: String = "10 minutes",
                               nlist: Int = 16,
                               m: Int = 8,
                               ksub: Int = 16,
                               nprobe: Int = 4,
                               k: Int = 5,
                               maxQueriesPerPartition: Long = 1000000L,
                               residual: Boolean = false) {
  require(nprobe >= 1, "nprobe must be >= 1")
  require(k >= 1, "k must be >= 1")
  require(maxQueriesPerPartition >= 1,
    "maxQueriesPerPartition must be >= 1")

  /** `df` must be a streaming DataFrame; the watermark is (re-)asserted
    * internally (the typed probe flatMap mints fresh attributes — the
    * [[StreamingIvfTopK]] caveat). Output: one row per (window_start,
    * window_end, query_id, rank) with `neighbor_id` and the ADC
    * `cosine`.
    */
  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, Seq(idColumn, tsColumn, vecColumn))
    SparkUtil.validateColumns(memberIndex,
      Seq("vec_id", "cluster", "codes", "nrm", "q"))
    SparkUtil.requireFitParam(memberIndex, "cluster", "nlist",
      nlist.toLong, "StreamingIvfPqTopK")
    SparkUtil.requireFitParam(memberIndex, "cluster", "m", m.toLong,
      "StreamingIvfPqTopK")
    SparkUtil.requireFitParam(memberIndex, "cluster", "ksub",
      ksub.toLong, "StreamingIvfPqTopK")
    SparkUtil.requireFitParam(memberIndex, "cluster", "residual",
      if (residual) 1L else 0L, "StreamingIvfPqTopK")
    require(df.isStreaming,
      "StreamingIvfPqTopK.transform needs a streaming DataFrame; use " +
        "SimilarityPq.IncrementalIvfPqTopK for batch probes")
    val spark = df.sparkSession
    import spark.implicits._
    val index = SimilarityPq.IncrementalIvfPq
      .withAlpha(memberIndex, residual, "StreamingIvfPqTopK")
      .select(col("vec_id").cast("long").as("id"),
        col("cluster").cast("long"), col("codes"),
        col("nrm").cast("long"), col("alpha").cast("long"), col("q"))
    val picked = SimilarityPq.pickRows(
      index.select(col("id"), col("q"), col("nrm")),
      SimilarityPq.IncrementalIvfPq.pickCount(nlist, ksub, residual))
    require(picked.nonEmpty,
      "StreamingIvfPqTopK: empty member index — fit " +
        "IncrementalIvfPq.memberIndex on a non-empty corpus first")
    val (cents, cb) =
      if (residual) SimilarityPq.deriveRes(picked, nlist, m, ksub,
        "StreamingIvfPqTopK")
      else SimilarityPq.derive(picked, nlist, m, ksub,
        "StreamingIvfPqTopK")
    val bcCb = spark.sparkContext.broadcast(cb)
    val np = nprobe
    val res = residual
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
        Similarity.rankedClusterIds(cents, q, nrm).take(np)
          .map(c => (ts, id, q, nrm, c.toLong,
            if (res) Similarity.localDot(q, cents(c - 1)._2) else 0L))
      }
      .toDF(tsColumn, "query_id", "qq", "qnrm", "cluster", "cdot")
    // one stateless pass does ADC scoring AND the per-(event, query)
    // best-k prune — the candidate stream entering the stateful agg is
    // partitions x queries x k, never inverted-list volume
    val joined = probes.join(index.drop("q"), Seq("cluster"))
      .filter(col("id") =!= col("query_id"))
      .select(unix_micros(col(tsColumn)).as("__us"), col("query_id"),
        col("id"), col("codes"), col("nrm"), col("qq"), col("qnrm"),
        col("cdot"), col("alpha"))
      .as[(Long, Long, Long, Array[Int], Long, Array[Long], Long,
        Long, Long)]
    val kk = k
    val maxQ = maxQueriesPerPartition
    val pruned = joined.mapPartitions { it =>
      val cbv = bcCb.value
      val ksubActual = cbv(0).length
      val worstFirst = HeapPrune.worstFirstByScore
      // the ADC table cache keys by (event-time, query) — the SAME
      // granularity as the heaps and the downstream window agg. A
      // recurring monitor query re-sent with an UPDATED vector arrives
      // as a new (us, qid) event; keying by qid alone would silently
      // score its candidates against the FIRST event's table whenever
      // they share a partition (likely — similar vectors probe the
      // same clusters), breaking the bit-identical-to-batch contract.
      // Bounded fail-loud like the batch adcScan: one m*ksub table per
      // entry, a high-cardinality query stream must raise, not grow.
      val tables = scala.collection.mutable
        .HashMap.empty[(Long, Long), Array[Long]]
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[(Long, Long),
          scala.collection.mutable.PriorityQueue[(Long, Double)]]
      it.foreach { case (us, qid, id, codes, nrm, qq, qnrm, cdot,
          alpha) =>
        if (!tables.contains((us, qid)) && tables.size >= maxQ)
          throw new IllegalStateException(
            s"StreamingIvfPqTopK: partition saw more than $maxQ " +
              "distinct (event, query) pairs in one micro-batch — the " +
              "ADC scan holds one lookup table per pair; raise " +
              "maxQueriesPerPartition explicitly if a query stream " +
              "this dense is intended")
        val t = tables.getOrElseUpdate((us, qid),
          SimilarityPq.adcTable(cbv, qq))
        var tsum = 0L
        var s = 0
        while (s < codes.length) {
          tsum += t(s * ksubActual + (codes(s) - 1)); s += 1
        }
        // residual decomposition — bit-identical to the batch
        // refineWith=None face ([[SimilarityPq.adcScan]])
        val cos =
          if (nrm > 0 && qnrm > 0) {
            if (res)
              (alpha * cdot + SimilarityPq.AlphaScale * tsum).toDouble /
                (SimilarityPq.AlphaScale *
                  math.sqrt(nrm.toDouble * qnrm.toDouble))
            else tsum.toDouble / math.sqrt(nrm.toDouble * qnrm.toDouble)
          } else Double.NaN
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
        // round AFTER ranking — the batch refineWith=None contract
        round(col("__e").getField("_2"), 6).as("cosine"))
  }
}
