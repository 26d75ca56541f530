package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Classifier

/** Stream-vs-batch agreement for the trained quality gate: documents
  * through [[StreamingQualityGate]] against a persisted
  * [[Classifier.weightsTable]] must score bit-identically to the batch
  * [[Classifier.Score]], across micro-batch boundaries; the pass is
  * stateless and `admitOnly` composes the gate.
  */
final case class GateDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamingQualityGateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("stream == batch bit-for-bit across micro-batches; admitOnly " +
    "gates; the pass is stateless; fit drift raises before the start") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = (0L until 40L).map { i =>
      val p = i % 2 == 0
      (i, if (p) "seed" else "web",
        s"common ${if (p) "excellent prose" else "spam junk"} w$i")
    }.toDF("doc_id", "source", "text")
    val w = Classifier.weightsTable(corpus, positiveValue = "seed",
      numFeatures = 64, rounds = 4)
    val arrivals = (100L until 112L).map { i =>
      GateDoc(i, new Timestamp(i * 1000L),
        if (i % 3 == 0) s"fresh excellent prose a$i"
        else s"fresh spam junk b$i")
    }
    val input = MemoryStream[GateDoc]
    val out = new StreamingQualityGate(w, numFeatures = 64)
      .transform(input.toDF())
    val q = out.writeStream.format("memory").queryName("sqgate")
      .outputMode("append").start()
    val got = try {
      input.addData(arrivals.take(5): _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(5): _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty)
      spark.table("sqgate")
        .select("doc_id", "quality_margin", "quality_keep")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    } finally q.stop()
    val want = Classifier.Score(w, numFeatures = 64)
      .transform(arrivals.toDF().select("doc_id", "text"))
      .select("doc_id", "quality_margin", "quality_keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got.nonEmpty && got == want)
    assert(got.exists(_._3) && got.exists(!_._3)) // a real split
    // admitOnly composes the gate
    val input2 = MemoryStream[GateDoc]
    val out2 = new StreamingQualityGate(w, numFeatures = 64,
      admitOnly = true).transform(input2.toDF())
    val q2 = out2.writeStream.format("memory").queryName("sqgate_adm")
      .outputMode("append").start()
    val admitted = try {
      input2.addData(arrivals: _*)
      q2.processAllAvailable()
      spark.table("sqgate_adm").select("doc_id")
        .as[Long].collect().toSet
    } finally q2.stop()
    assert(admitted == want.filter(_._3).map(_._1).toSet)
    // drift raises before the stream starts
    val e = intercept[IllegalArgumentException] {
      new StreamingQualityGate(w, numFeatures = 128)
        .transform(input.toDF())
    }
    assert(e.getMessage.contains("numFeatures"), e.getMessage)
  }
}
