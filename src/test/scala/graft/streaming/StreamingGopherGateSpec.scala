package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** Stream-vs-batch agreement for the COMPLETE Gopher gate: documents
  * through [[StreamingGopherGate]] must carry counters/verdicts
  * bit-identical to the batch composition of
  * [[TextAnalysis.GopherRules]] + [[TextAnalysis.GopherRepetition]]
  * (outlier rules AND structural + n-gram repetition rules), across
  * micro-batch boundaries; the pass is stateless and `admitOnly`
  * composes the gate.
  */
final case class RuleDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamingGopherGateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** The gate's batch equivalent, column-for-column. */
  private def batchGate(df: DataFrame, minW: Long): DataFrame = {
    val ruled = TextAnalysis.GopherRules(minWords = minW,
        maxWords = 100L, stopwords = Seq("the", "of", "and"))
      .transform(df)
      .withColumnRenamed("admit", "rules_admit")
      .withColumnRenamed("n_lines", "gate_n_lines")
    TextAnalysis.GopherRepetition().transform(ruled)
      .withColumnRenamed("admit", "rep_admit")
      .withColumn("admit", col("rules_admit") && col("rep_admit"))
  }

  private val auditCols = Seq("doc_id", "n_words", "word_chars",
    "symbol_marks", "stopword_hits", "dup_lines", "top2_chars",
    "dup5_chars", "r_top2_gram", "r_dup5_gram", "rules_admit",
    "rep_admit", "admit")

  test("stream == batch bit-for-bit across micro-batches (outlier AND " +
    "repetition rule families); admitOnly gates; the pass is stateless") {
    implicit val sqlCtx = spark.sqlContext
    // mix of admitted prose, a bullet wall, symbol junk, number salad,
    // and a phrase-repeat doc that PASSES the outlier rules but trips
    // the n-gram repetition rules — only the composed gate rejects it
    val arrivals = (0L until 15L).map { i =>
      RuleDoc(i, new Timestamp(i * 1000L), i % 5 match {
        case 0 => s"the data of run $i stays small here and now fine"
        case 1 => "- a\n- b\n- c\n- d"
        case 2 => s"### junk ### $i ..."
        case 3 => s"$i 123 456"
        case _ => "the cat and " * 8 + "the cat sat"
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
        .select(auditCols.map(col): _*)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    } finally q.stop()
    val wantDf = batchGate(arrivals.toDF().select("doc_id", "text"), 5L)
    val want = wantDf.select(auditCols.map(col): _*)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(got.nonEmpty && got == want)
    val admitIdx = auditCols.indexOf("admit")
    assert(got.exists(_(admitIdx) == true) &&
      got.exists(_(admitIdx) == false)) // a real split
    // the phrase-repeat docs are rejected BY THE REPETITION HALF:
    // outlier rules pass, n-gram rules fail
    val phraseRows = want.filter { r =>
      r.head.asInstanceOf[Long] % 5L == 4L }
    assert(phraseRows.nonEmpty)
    phraseRows.foreach { r =>
      assert(r(auditCols.indexOf("rules_admit")) == true)
      assert(r(auditCols.indexOf("r_top2_gram")) == false)
      assert(r(auditCols.indexOf("rep_admit")) == false)
      assert(r(admitIdx) == false)
    }
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
    assert(admitted == want.filter(_(admitIdx) == true)
      .map(_.head.asInstanceOf[Long]).toSet)
    // a batch frame is redirected to the batch operators
    val e = intercept[IllegalArgumentException](
      gate(5L).transform(arrivals.toDF()))
    assert(e.getMessage.contains("streaming"))
  }
}
