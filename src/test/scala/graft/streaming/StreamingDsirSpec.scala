package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dsir

class StreamingDsirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // corpus: "seed" docs share vocabulary w0/w1, web docs skew w2/w3
  private val corpus = Seq(
    (0L, "w0 w1 w0", "seed"), (1L, "w1 w0", "seed"),
    (2L, "w2 w3 w2 w3", "web"), (3L, "w3 w2", "web"),
    (4L, "w0 w2", "web"), (5L, null.asInstanceOf[String], "web"))

  private def counts = Dsir.featureCounts(
    corpus.toDF("doc_id", "text", "source"), "seed",
    numFeatures = 64).cache()

  // stream docs: seed-like, web-like, corpus-unseen tokens, null text
  private val streamDocs = Seq(
    (10L, "w0 w1"), (11L, "w2 w3"), (12L, "zz1 zz2"),
    (13L, null.asInstanceOf[String]), (14L, "w0 zz1"))

  private def doc(id: Long, text: String): StreamEvent =
    StreamEvent("g", new Timestamp(id * 1000L), id, text)

  /** Batch scores of the same docs: IncrementalResample at
    * fraction 1.0 keeps every row with its score.
    */
  private def batchScores: Map[Long, Long] =
    Dsir.IncrementalResample(counts, fraction = 1.0, numFeatures = 64)
      .transform(streamDocs.toDF("doc_id", "text"))
      .select("doc_id", "dsir_score")
      .as[(Long, Long)].collect().toMap

  test("stream scores are bit-identical to the batch scorer, including " +
    "unseen tokens and null text; the gate is stateless") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val out = new StreamingDsir(counts, minScore = Long.MinValue,
        idColumn = "order", textColumn = "marker", numFeatures = 64)
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("sdsir_all")
      .outputMode("append").start()
    try {
      input.addData(streamDocs.map { case (id, tx) => doc(id, tx) }: _*)
      query.processAllAvailable()
      val got = spark.table("sdsir_all")
        .select("order", "dsir_score")
        .as[(Long, Long)].collect().toMap
      assert(got == batchScores)
      // null text scores exactly 0, the batch contract
      assert(got(13L) == 0L)
      // stateless: no state store behind the gate
      assert(query.lastProgress.stateOperators.isEmpty)
    } finally query.stop()
  }

  test("threshold admission: exactly the docs at or above minScore " +
    "pass (the batch cut replayed on the stream)") {
    implicit val sqlCtx = spark.sqlContext
    val scores = batchScores
    // cut at the median score: ties at the cut admit (>=)
    val cut = scores.values.toSeq.sorted.apply(scores.size / 2)
    val input = MemoryStream[StreamEvent]
    val out = new StreamingDsir(counts, minScore = cut,
        idColumn = "order", textColumn = "marker", numFeatures = 64)
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("sdsir_cut")
      .outputMode("append").start()
    try {
      input.addData(streamDocs.map { case (id, tx) => doc(id, tx) }: _*)
      query.processAllAvailable()
      val got = spark.table("sdsir_cut").select("order")
        .as[Long].collect().toSet
      assert(got == scores.filter(_._2 >= cut).keySet)
    } finally query.stop()
  }

  test("empty feature-count table fails loud at wiring time") {
    val empty = Dsir.featureCounts(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source"),
      "seed", numFeatures = 64)
    val e = intercept[IllegalArgumentException] {
      new StreamingDsir(empty, minScore = 0L, numFeatures = 64)
        .transform(spark.readStream.format("rate").load()
          .selectExpr("value AS doc_id", "timestamp AS ts",
            "CAST(value AS STRING) AS text"))
    }
    assert(e.getMessage.contains("empty feature-count table"))
  }

  test("a table fitted with a different (larger) numFeatures is " +
    "rejected, not silently mis-bucketed") {
    val big = Dsir.featureCounts(
      corpus.toDF("doc_id", "text", "source"), "seed",
      numFeatures = 4096)
    val e = intercept[IllegalArgumentException] {
      new StreamingDsir(big, minScore = 0L, numFeatures = 7)
        .transform(spark.readStream.format("rate").load()
          .selectExpr("value AS doc_id", "timestamp AS ts",
            "CAST(value AS STRING) AS text"))
    }
    assert(e.getMessage.contains("different numFeatures"))
  }
}
