package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

class StreamingIncrementalDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def doc(text: String, sec: Long): StreamEvent =
    StreamEvent("g", new Timestamp(sec * 1000L), sec, text)

  private def corpusIndex = Dedup.IncrementalExactDedup.fingerprintIndex(
    Seq((10L, "known corpus doc"), (11L, "another corpus doc"))
      .toDF("doc_id", "text")).cache()

  test("stream-static probe: corpus content is known with its canonical " +
    "id, new content is new, in-stream copies collapse first") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val out = new StreamingIncrementalDedup(corpusIndex,
        textColumn = "marker")
      .transform(input.toDF().withWatermark("ts", "5 seconds"))
    val query = out.writeStream.format("memory").queryName("sid_test")
      .outputMode("append").start()
    try {
      input.addData(
        doc("KNOWN corpus doc", 1),   // normalizes onto corpus doc 10
        doc("brand new text", 2),
        doc("brand  NEW text", 3))    // in-stream copy of 2 -> collapsed
      query.processAllAvailable()
      val got = spark.table("sid_test")
        .select("order", "is_known", "canonical_id")
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(got == Set((1L, true, 10L), (2L, false, -1L)))
    } finally query.stop()
  }

  test("null-text rows probe null-safely instead of staying forever new") {
    implicit val sqlCtx = spark.sqlContext
    // corpus with a null-text doc: its fingerprint class is null
    val idx = Dedup.IncrementalExactDedup.fingerprintIndex(
      Seq((20L, null.asInstanceOf[String]), (21L, "real text"))
        .toDF("doc_id", "text")).cache()
    val input = MemoryStream[StreamEvent]
    val out = new StreamingIncrementalDedup(idx, textColumn = "marker")
      .transform(input.toDF().withWatermark("ts", "5 seconds"))
    val query = out.writeStream.format("memory").queryName("sid_null")
      .outputMode("append").start()
    try {
      input.addData(doc(null, 1), doc("fresh", 2))
      query.processAllAvailable()
      val got = spark.table("sid_null")
        .select("order", "is_known", "canonical_id")
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(got == Set((1L, true, 20L), (2L, false, -1L)))
    } finally query.stop()
  }

  test("output/working column collisions are rejected up front") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val withCol = input.toDF().withColumn("is_known",
      org.apache.spark.sql.functions.lit(true))
    val e = intercept[IllegalArgumentException] {
      new StreamingIncrementalDedup(corpusIndex, textColumn = "marker")
        .transform(withCol)
    }
    assert(e.getMessage.contains("is_known"))
  }
}
