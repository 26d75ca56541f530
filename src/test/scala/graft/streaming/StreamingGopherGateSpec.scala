package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** Stream-vs-batch agreement for the Gopher rule gate: documents
  * through [[StreamingGopherGate]] must carry counters/verdicts
  * bit-identical to the batch [[TextAnalysis.GopherRules]], across
  * micro-batch boundaries; the pass is stateless and `admitOnly`
  * composes the gate.
  */
final case class RuleDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamingGopherGateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("stream == batch bit-for-bit across micro-batches; admitOnly " +
    "gates; the pass is stateless") {
    implicit val sqlCtx = spark.sqlContext
    // mix of admitted prose, a bullet wall, symbol junk, number salad
    val arrivals = (0L until 12L).map { i =>
      RuleDoc(i, new Timestamp(i * 1000L), i % 4 match {
        case 0 => s"the data of run $i stays small here and now fine"
        case 1 => "- a\n- b\n- c\n- d"
        case 2 => s"### junk ### $i ..."
        case _ => s"$i 123 456"
      })
    }
    val gate = (minW: Long) => new StreamingGopherGate(minWords = minW,
      maxWords = 100L, stopwords = Seq("the", "of", "and"))
    val input = MemoryStream[RuleDoc]
    val q = gate(5L).transform(input.toDF())
      .writeStream.format("memory").queryName("sggate")
      .outputMode("append").start()
    val got = try {
      input.addData(arrivals.take(7): _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(7): _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty)
      spark.table("sggate")
        .select("doc_id", "n_words", "word_chars", "symbol_marks",
          "stopword_hits", "admit")
        .as[(Long, Long, Long, Long, Long, Boolean)]
        .collect().sortBy(_._1).toSeq
    } finally q.stop()
    val want = TextAnalysis.GopherRules(minWords = 5L, maxWords = 100L,
        stopwords = Seq("the", "of", "and"))
      .transform(arrivals.toDF().select("doc_id", "text"))
      .select("doc_id", "n_words", "word_chars", "symbol_marks",
        "stopword_hits", "admit")
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got.nonEmpty && got == want)
    assert(got.exists(_._6) && got.exists(!_._6)) // a real split
    // admitOnly composes the gate
    val input2 = MemoryStream[RuleDoc]
    val q2 = new StreamingGopherGate(minWords = 5L, maxWords = 100L,
        stopwords = Seq("the", "of", "and"), admitOnly = true)
      .transform(input2.toDF())
      .writeStream.format("memory").queryName("sggate_adm")
      .outputMode("append").start()
    val admitted = try {
      input2.addData(arrivals: _*)
      q2.processAllAvailable()
      spark.table("sggate_adm").select("doc_id").as[Long].collect().toSet
    } finally q2.stop()
    assert(admitted == want.filter(_._6).map(_._1).toSet)
    // a batch frame is redirected to the batch operator
    val e = intercept[IllegalArgumentException](
      gate(5L).transform(arrivals.toDF()))
    assert(e.getMessage.contains("streaming"))
  }
}
