package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** Stream-vs-batch agreement for the C4 cleaning gate: documents
  * through [[StreamingC4Gate]] must carry counters, verdicts and the
  * EDITED `clean_text` bit-identical to the batch
  * [[TextAnalysis.C4Clean]], across micro-batch boundaries; the pass
  * is stateless and `admitOnly` composes the gate.
  */
class StreamingC4GateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val auditCols = Seq("doc_id", "n_lines", "kept_lines",
    "js_lines", "n_sentences", "block_hits", "clean_text", "admit")

  test("stream == batch bit-for-bit across micro-batches; admitOnly " +
    "gates; the pass is stateless") {
    implicit val sqlCtx = spark.sqlContext
    val arrivals = (0L until 12L).map { i =>
      RuleDoc(i, new Timestamp(i * 1000L), i % 4 match {
        // three clean sentences -> admitted
        case 0 => s"run $i had five good words.\nsecond line has " +
          "five words.\nthird line has five words!"
        // javascript + short lines -> everything drops, 0 sentences
        case 1 => "use javascript on this page.\nshort.\nno punct here"
        // lorem ipsum page -> rejected whole
        case 2 => "lorem ipsum dolor sit amet.\nsecond line has " +
          "five words.\nthird line has five words."
        // brace page -> rejected whole
        case _ => s"doc $i has brace free text here.\nsecond line " +
          "has five words.\nvar x = {"
      })
    }
    val input = MemoryStream[RuleDoc]
    val q = new StreamingC4Gate().transform(input.toDF())
      .writeStream.format("memory").queryName("sc4gate")
      .outputMode("append").start()
    val got = try {
      input.addData(arrivals.take(7): _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(7): _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty)
      spark.table("sc4gate").select(auditCols.map(col): _*)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    } finally q.stop()
    val want = TextAnalysis.C4Clean()
      .transform(arrivals.toDF().select("doc_id", "text"))
      .select(auditCols.map(col): _*)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(got.nonEmpty && got == want)
    val admitIdx = auditCols.indexOf("admit")
    assert(got.exists(_(admitIdx) == true) &&
      got.exists(_(admitIdx) == false))
    // admitOnly composes the gate
    val input2 = MemoryStream[RuleDoc]
    val q2 = new StreamingC4Gate(admitOnly = true)
      .transform(input2.toDF())
      .writeStream.format("memory").queryName("sc4gate_adm")
      .outputMode("append").start()
    val admitted = try {
      input2.addData(arrivals: _*)
      q2.processAllAvailable()
      spark.table("sc4gate_adm").select("doc_id").as[Long]
        .collect().toSet
    } finally q2.stop()
    assert(admitted == want.filter(_(admitIdx) == true)
      .map(_.head.asInstanceOf[Long]).toSet)
    // a batch frame is redirected to the batch operator
    val e = intercept[IllegalArgumentException](
      new StreamingC4Gate().transform(arrivals.toDF()))
    assert(e.getMessage.contains("streaming"))
  }
}
