package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Corpus

/** Top level for the Encoder (a spec-nested case class has no outer
  * scope when the stream deserializes it). */
case class StripDoc(doc_id: Long, text: String)

/** Stream-vs-batch agreement for the streaming line strip: the same
  * documents through [[StreamingHotLineStrip]] (stateless, broadcast
  * hot set) and through the batch serving face
  * ([[Corpus.IncrementalHotLineStrip]] with `countBatch = false`) must
  * produce identical rows — hotness from the index frequencies alone,
  * the only contract an unbounded stream can honor.
  */
class StreamingHotLineStripSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = (0 until 30).map(i =>
    (i.toLong, s"unique corpus $i\nshared banner\ncorpus tail $i"))
    .toDF("doc_id", "text")

  private val batch = Seq(
    StripDoc(100L, "fresh line\nshared banner\nanother"),
    StripDoc(101L, "shared banner"),
    StripDoc(102L, "all original\nlines here"),
    StripDoc(103L, null))

  test("stream strip == the batch countBatch=false face bit-for-bit; " +
    "stateless (no state operators)") {
    implicit val sqlCtx = spark.sqlContext
    val idx = Corpus.IncrementalHotLines.lineIndex(corpus)
      .localCheckpoint()
    val input = MemoryStream[StripDoc]
    val out = new StreamingHotLineStrip(idx, maxDocFreq = 10L)
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("shls")
      .outputMode("append").start()
    try {
      input.addData(batch: _*)
      query.processAllAvailable()
      val got = spark.table("shls")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      val want = Corpus.IncrementalHotLineStrip(idx, maxDocFreq = 10L,
          countBatch = false)
        .transform(batch.toDF())
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(want.nonEmpty)
      assert(got == want)
      // the banner (corpus df 30 > 10) stripped; fresh lines kept;
      // null text is the 0-line empty class
      assert(got.find(_._1 == 101L).get._4 == "")
      assert(got.find(_._1 == 100L).get._4 == "fresh line\nanother")
      assert(got.find(_._1 == 103L).get == ((103L, 0L, 0L, "")))
      // fully stateless: no state store in the plan
      assert(query.lastProgress.stateOperators.isEmpty)
    } finally query.stop()
  }

  test("hot-set cap and non-streaming input fail loud") {
    implicit val sqlCtx = spark.sqlContext
    val idx = Corpus.IncrementalHotLines.lineIndex(corpus)
    val input = MemoryStream[StripDoc]
    val wide = Seq(("a", 5L), ("b", 5L), ("c", 5L))
      .toDF("line", "doc_freq")
    val e = intercept[IllegalArgumentException] {
      new StreamingHotLineStrip(wide, maxDocFreq = 1L, maxHotLines = 2)
        .transform(input.toDF())
    }
    assert(e.getMessage.contains("maxHotLines"))
    val e2 = intercept[IllegalArgumentException] {
      new StreamingHotLineStrip(idx, maxDocFreq = 10L)
        .transform(batch.toDF())
    }
    assert(e2.getMessage.contains("streaming"))
  }
}
