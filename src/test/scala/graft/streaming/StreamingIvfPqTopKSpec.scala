package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.SimilarityPq

/** Stream-vs-batch agreement for the streaming IVF-PQ probe: the same
  * query vectors through [[StreamingIvfPqTopK]] (windowed, watermarked,
  * append mode) and through the batch
  * [[SimilarityPq.IncrementalIvfPqTopK]] with `refineWith = None` must
  * produce identical neighbor sets, ranks and ADC cosines — the
  * compressed index's serving face, stream and batch bit-for-bit.
  */
class StreamingIvfPqTopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private case class VecEvent(ts: Timestamp, vec_id: Long,
                              embedding: Seq[Float])

  private val rnd = new scala.util.Random(31)
  private val corpusRows = (100L until 160L).map(i =>
    i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
  private def corpus = corpusRows.toDF("vec_id", "embedding")

  private val queryRows = (0L until 6L).map(i =>
    i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))

  test("stream ADC top-k equals the batch refineWith=None probe " +
    "bit-for-bit; the full vectors never enter the stream plan") {
    implicit val sqlCtx = spark.sqlContext
    val idx = SimilarityPq.IncrementalIvfPq.memberIndex(corpus,
      nlist = 4, m = 4, ksub = 6).localCheckpoint()
    val input = MemoryStream[VecEvent]
    val out = new StreamingIvfPqTopK(idx, windowDuration = "1 minute",
        watermarkDelay = "0 seconds", nlist = 4, m = 4, ksub = 6,
        nprobe = 2, k = 3)
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("sivfpq")
      .outputMode("append").start()
    try {
      input.addData(queryRows.map { case (id, v) =>
        VecEvent(new Timestamp(30000L), id, v) })
      query.processAllAvailable()
      input.addData(VecEvent(new Timestamp(600000L), 999L,
        Seq.fill(8)(0.1f)))
      query.processAllAvailable()
      val got = spark.table("sivfpq")
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSeq
        .filter(_._1 != 999L).sorted
      val want = SimilarityPq.IncrementalIvfPqTopK(idx,
          refineWith = None, nlist = 4, m = 4, ksub = 6, nprobe = 2,
          k = 3)
        .transform(queryRows.toDF("vec_id", "embedding"))
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      assert(want.nonEmpty)
      assert(got == want)
      val st = query.lastProgress.stateOperators
      assert(st.nonEmpty)
    } finally query.stop()
  }

  test("RESIDUAL index: stream ADC top-k equals the batch " +
    "refineWith=None residual probe bit-for-bit; residual drift " +
    "raises before the stream starts") {
    implicit val sqlCtx = spark.sqlContext
    val idx = SimilarityPq.IncrementalIvfPq.memberIndex(corpus,
      nlist = 4, m = 4, ksub = 6, residual = true).localCheckpoint()
    val input = MemoryStream[VecEvent]
    val out = new StreamingIvfPqTopK(idx, windowDuration = "1 minute",
        watermarkDelay = "0 seconds", nlist = 4, m = 4, ksub = 6,
        nprobe = 2, k = 3, residual = true)
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("sivfpq_res")
      .outputMode("append").start()
    try {
      input.addData(queryRows.map { case (id, v) =>
        VecEvent(new Timestamp(30000L), id, v) })
      query.processAllAvailable()
      input.addData(VecEvent(new Timestamp(600000L), 999L,
        Seq.fill(8)(0.1f)))
      query.processAllAvailable()
      val got = spark.table("sivfpq_res")
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSeq
        .filter(_._1 != 999L).sorted
      val want = SimilarityPq.IncrementalIvfPqTopK(idx,
          refineWith = None, nlist = 4, m = 4, ksub = 6, nprobe = 2,
          k = 3, residual = true)
        .transform(queryRows.toDF("vec_id", "embedding"))
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      assert(want.nonEmpty)
      assert(got == want)
    } finally query.stop()
    val e = intercept[IllegalArgumentException] {
      new StreamingIvfPqTopK(idx, nlist = 4, m = 4, ksub = 6)
        .transform(input.toDF())
    }
    assert(e.getMessage.contains("residual"), e.getMessage)
  }

  test("the same query_id re-sent WITHIN one micro-batch with an " +
    "updated vector scores each event against its OWN vector — the " +
    "ADC table cache keys by (event, query), not query alone") {
    implicit val sqlCtx = spark.sqlContext
    val idx = SimilarityPq.IncrementalIvfPq.memberIndex(corpus,
      nlist = 4, m = 4, ksub = 6).localCheckpoint()
    // a recurring monitor query: same id, two event-time windows, the
    // vector UPDATED between them — and only slightly, so both events
    // probe the same clusters and their candidates share partitions
    // (the exact regime where a qid-keyed cache reuses the stale table)
    val vA = corpusRows.head._2.map(v => v * 0.9f + 0.01f)
    val vB = vA.map(v => v + 0.05f)
    val input = MemoryStream[VecEvent]
    val out = new StreamingIvfPqTopK(idx, windowDuration = "1 minute",
        watermarkDelay = "0 seconds", nlist = 4, m = 4, ksub = 6,
        nprobe = 2, k = 3)
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("sivfpq_r")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        VecEvent(new Timestamp(30000L), 7L, vA),
        VecEvent(new Timestamp(90000L), 7L, vB)))
      query.processAllAvailable()
      input.addData(VecEvent(new Timestamp(600000L), 999L,
        Seq.fill(8)(0.1f)))
      query.processAllAvailable()
      def batchOn(v: Seq[Float]) =
        SimilarityPq.IncrementalIvfPqTopK(idx, refineWith = None,
          nlist = 4, m = 4, ksub = 6, nprobe = 2, k = 3)
          .transform(Seq((7L, v)).toDF("vec_id", "embedding"))
          .select("rank", "neighbor_id", "cosine")
          .as[(Long, Long, Double)].collect().toSeq.sorted
      val rows = spark.table("sivfpq_r")
        .select($"window_start", $"rank", $"neighbor_id", $"cosine")
        .as[(Timestamp, Long, Long, Double)].collect().toSeq
        .filter(_._1.getTime < 600000L)
      val byWin = rows.groupBy(_._1.getTime).view
        .mapValues(_.map(r => (r._2, r._3, r._4)).sorted).toMap
      assert(byWin.keySet == Set(0L, 60000L), byWin.keySet.toString)
      assert(byWin(0L) == batchOn(vA))
      assert(byWin(60000L) == batchOn(vB))
      // the updated vector must actually change the scores, or the
      // assertion proves nothing
      assert(byWin(0L) != byWin(60000L))
    } finally query.stop()
  }

  test("a micro-batch denser than maxQueriesPerPartition in distinct " +
    "(event, query) pairs fails loud naming the knob") {
    implicit val sqlCtx = spark.sqlContext
    val idx = SimilarityPq.IncrementalIvfPq.memberIndex(corpus,
      nlist = 4, m = 4, ksub = 6).localCheckpoint()
    val input = MemoryStream[VecEvent]
    val out = new StreamingIvfPqTopK(idx, windowDuration = "1 minute",
        watermarkDelay = "0 seconds", nlist = 4, m = 4, ksub = 6,
        nprobe = 4, k = 3, maxQueriesPerPartition = 1L)
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("sivfpq_cap")
      .outputMode("append").start()
    try {
      val e = intercept[org.apache.spark.sql.streaming
          .StreamingQueryException] {
        // nprobe = nlist: every query's candidates land in EVERY
        // probed list's partitions, so some partition must see both
        input.addData(queryRows.take(2).map { case (id, v) =>
          VecEvent(new Timestamp(30000L), id, v) })
        query.processAllAvailable()
      }
      assert(e.getMessage.contains("maxQueriesPerPartition"),
        e.getMessage)
    } finally query.stop()
  }

  test("fit-param drift and a non-streaming input fail loud before " +
    "the stream starts") {
    implicit val sqlCtx = spark.sqlContext
    val idx = SimilarityPq.IncrementalIvfPq.memberIndex(corpus,
      nlist = 4, m = 4, ksub = 6)
    val input = MemoryStream[VecEvent]
    val e = intercept[IllegalArgumentException] {
      new StreamingIvfPqTopK(idx, nlist = 4, m = 2, ksub = 6)
        .transform(input.toDF())
    }
    assert(e.getMessage.contains("m"))
    val e2 = intercept[IllegalArgumentException] {
      new StreamingIvfPqTopK(idx, nlist = 4, m = 4, ksub = 6)
        .transform(queryRows.toDF("vec_id", "embedding")
          .withColumn("ts", org.apache.spark.sql.functions
            .lit(new Timestamp(0L))))
    }
    assert(e2.getMessage.contains("streaming"))
  }
}
