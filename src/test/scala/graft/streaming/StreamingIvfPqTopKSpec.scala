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
