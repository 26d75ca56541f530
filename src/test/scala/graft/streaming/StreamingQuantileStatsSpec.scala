package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Event shape for [[StreamingQuantileStatsSpec]] (top-level: Spark
  * encoders cannot derive for inner case classes). */
final case class QEvent(g: String, ts: Timestamp, v: Double)

/** Windowed streaming quantiles: append-mode finality, per-(window,
  * group) values exact at sub-sketch scale (GK holds every value below
  * ~`accuracy` rows, where it degenerates to exact percentile_disc —
  * the documented regime of these tests), and the batch-misuse guard.
  */
class StreamingQuantileStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(g: String, sec: Long, v: Double): QEvent =
    QEvent(g, new Timestamp(sec * 1000L), v)

  test("per-(window, group) quantiles emit once on window close and " +
    "match exact percentile_disc at sub-sketch scale") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QEvent]
    val op = new StreamingQuantileStats(Seq("g"), "v",
      quantiles = Seq(0.5, 1.0), windowDuration = "10 seconds")
    val out = op.transform(
      input.toDF().withWatermark("ts", "5 seconds"))
    val query = out.writeStream.format("memory").queryName("sq_test")
      .outputMode("append").start()
    try {
      // window [0,10): g1 = {1..5} (p50=3, p100=5); g2 = {10, 20}
      // (p50=10, p100=20); window [10,20): g1 = {7}
      input.addData(ev("g1", 1, 4), ev("g1", 2, 2), ev("g1", 3, 1),
        ev("g1", 4, 5), ev("g1", 5, 3),
        ev("g2", 6, 20), ev("g2", 7, 10),
        ev("g1", 12, 7))
      query.processAllAvailable()
      // watermark = 12 - 5 = 7: nothing closed yet
      assert(spark.table("sq_test").count() == 0)
      input.addData(ev("g2", 30, 1)) // watermark -> 25: [0,10) and
      query.processAllAvailable()    // [10,20) both close
      val got = spark.table("sq_test")
        .select("g", "n", "p50", "p100")
        .as[(String, Long, Double, Double)].collect().toSet
      assert(got == Set(("g1", 5L, 3.0, 5.0), ("g2", 2L, 10.0, 20.0),
        ("g1", 1L, 7.0, 7.0)), got)
      // the [30,40) window closes later and emits exactly once: the
      // earlier rows are final, never retracted
      input.addData(ev("g2", 60, 1))
      query.processAllAvailable()
      val all = spark.table("sq_test")
        .select("g", "n", "p50", "p100")
        .as[(String, Long, Double, Double)].collect().toSeq
      assert(all.size == 4, all)
      assert(all.count { case (g, n, p50, p100) =>
        g == "g2" && n == 1L && p50 == 1.0 && p100 == 1.0 } == 1, all)
    } finally query.stop()
  }

  test("guards: batch frames, bad quantiles and colliding names " +
    "rejected") {
    intercept[IllegalArgumentException](
      new StreamingQuantileStats(Nil, "v"))
    intercept[IllegalArgumentException](
      new StreamingQuantileStats(Seq("g"), "v", quantiles = Seq(0.0)))
    intercept[IllegalArgumentException](
      new StreamingQuantileStats(Seq("g"), "v",
        quantiles = Seq(0.5, 0.50)))
    val batch = Seq(("g", new Timestamp(0L), 1.0)).toDF("g", "ts", "v")
    val e = intercept[IllegalArgumentException](
      new StreamingQuantileStats(Seq("g"), "v").transform(batch))
    assert(e.getMessage.contains("streaming"), e.getMessage)
  }
}
