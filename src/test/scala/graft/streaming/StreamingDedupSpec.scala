package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // marker column doubles as the document text
  private def doc(text: String, sec: Long): StreamEvent =
    StreamEvent("g", new Timestamp(sec * 1000L), sec, text)

  test("watermark-bounded dedup drops in-horizon copies and re-admits " +
    "a fingerprint after its state is evicted") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val out = new StreamingDedup(textColumn = "marker").transform(
      input.toDF().withWatermark("ts", "5 seconds"))
    val query = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      // same normalized content three times inside the horizon -> 1 row
      input.addData(doc("Hello  World", 1), doc("hello world", 2),
        doc("other text", 3))
      query.processAllAvailable()
      input.addData(doc("HELLO world", 4))
      query.processAllAvailable()
      // advance the watermark far past the entries, evicting state
      input.addData(doc("advance", 100))
      query.processAllAvailable()
      // the same fingerprint arrives after eviction -> admitted again
      input.addData(doc("hello world", 101))
      query.processAllAvailable()

      val got = spark.table("dedup_test")
        .select("order", "marker").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "Hello  World"), (3L, "other text"),
        (100L, "advance"), (101L, "hello world")))
    } finally query.stop()
  }
}
