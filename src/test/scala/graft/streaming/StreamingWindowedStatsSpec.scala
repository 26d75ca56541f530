package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingWindowedStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(key: String, sec: Long, order: Long): StreamEvent =
    StreamEvent(key, new Timestamp(sec * 1000L), order, "x")

  test("tumbling windows emit per-key counts/sums once the watermark " +
    "closes them; late data beyond the horizon is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val out = new StreamingWindowedStats("10 seconds").transform(
      input.toDF().withWatermark("ts", "5 seconds"))
    val query = out.writeStream.format("memory").queryName("wstats_test")
      .outputMode("append").start()
    try {
      // window [0,10): a:{1,2}, b:{7}; window [10,20): a:{12}
      input.addData(ev("a", 1, 10), ev("a", 2, 20), ev("b", 7, 5),
        ev("a", 12, 3))
      query.processAllAvailable()
      // nothing closed yet: watermark = 12 - 5 = 7 < 10
      assert(spark.table("wstats_test").count() == 0)
      // advance watermark past 10 -> the [0,10) windows close
      input.addData(ev("b", 30, 1))
      query.processAllAvailable()
      // an event for the long-closed [0,10) window: silently dropped
      input.addData(ev("a", 3, 999))
      query.processAllAvailable()
      // advance far enough to close everything else
      input.addData(ev("a", 100, 1))
      query.processAllAvailable()

      val got = spark.table("wstats_test")
        .select("groupKey", "window_start", "window_end", "n_events",
          "sum_value", "max_value")
        .as[(String, Timestamp, Timestamp, Long, Long, Long)]
        .collect().map { case (k, s, e, n, sm, mx) =>
          (k, s.getTime / 1000, e.getTime / 1000, n, sm, mx)
        }.toSet
      assert(got.contains(("a", 0L, 10L, 2L, 30L, 20L))) // 999 dropped
      assert(got.contains(("b", 0L, 10L, 1L, 5L, 5L)))
      assert(got.contains(("a", 10L, 20L, 1L, 3L, 3L)))
      assert(got.contains(("b", 30L, 40L, 1L, 1L, 1L)))
    } finally query.stop()
  }

  test("sliding windows attribute each event to duration/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val out = new StreamingWindowedStats("10 seconds", Some("5 seconds"))
      .transform(input.toDF().withWatermark("ts", "0 seconds"))
    val query = out.writeStream.format("memory").queryName("wstats_slide")
      .outputMode("append").start()
    try {
      input.addData(ev("a", 7, 4)) // windows [0,10) and [5,15)
      query.processAllAvailable()
      input.addData(ev("a", 100, 1)) // close them
      query.processAllAvailable()
      val got = spark.table("wstats_slide")
        .select("window_start", "n_events")
        .as[(Timestamp, Long)].collect()
        .map { case (s, n) => (s.getTime / 1000, n) }.toSet
      assert(got == Set((0L, 1L), (5L, 1L)))
    } finally query.stop()
  }
}
