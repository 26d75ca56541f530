package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingSessionizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(g: String, sec: Long): StreamEvent =
    StreamEvent(g, new Timestamp(sec * 1000L), sec, "x")

  test("sessions close when the watermark passes gap boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val out = new StreamingSessionize("5 seconds").transform(
      input.toDF().withWatermark("ts", "2 seconds"))
    val query = out.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      // key a: events at 1,3,4s (one session), then 20,21s (second)
      input.addData(ev("a", 1), ev("a", 3), ev("a", 4), ev("b", 2))
      query.processAllAvailable()
      input.addData(ev("a", 20), ev("a", 21))
      query.processAllAvailable()
      input.addData(ev("a", 60)) // advance watermark past session 2
      query.processAllAvailable()

      val got = spark.table("sess_test")
        .select("groupKey", "session_start", "n_events")
        .collect().map(r => (r.getString(0),
          r.getTimestamp(1).getTime / 1000, r.getLong(2))).toSet
      assert(got.contains(("a", 1L, 3L)))  // 1,3,4s merged
      assert(got.contains(("a", 20L, 2L))) // 20,21s
      assert(got.contains(("b", 2L, 1L)))
    } finally query.stop()
  }
}
