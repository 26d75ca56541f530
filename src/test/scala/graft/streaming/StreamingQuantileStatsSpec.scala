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

  test("state store numerics: exactly ONE sketch row per OPEN (window, " +
    "group) pair, evicted when the watermark closes the window " +
    "(round-10 verdict #5 — the numeric pin StreamingFunnelSpec has)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QEvent]
    val op = new StreamingQuantileStats(Seq("g"), "v",
      quantiles = Seq(0.5), windowDuration = "10 seconds")
    val out = op.transform(
      input.toDF().withWatermark("ts", "5 seconds"))
    val query = out.writeStream.format("memory").queryName("sq_state")
      .outputMode("append").start()
    try {
      def stateRows: Long = {
        val p = query.lastProgress
        p.stateOperators.toSeq.map(_.numRowsTotal).sum
      }
      // 3 open pairs: ([0,10), g1), ([0,10), g2), ([10,20), g1);
      // wm -> 6, nothing closes — state holds exactly the open pairs,
      // NOT one row per input event (8 events land in 3 sketches)
      input.addData(ev("g1", 1, 1), ev("g1", 2, 2), ev("g1", 3, 3),
        ev("g1", 4, 4), ev("g1", 5, 5),
        ev("g2", 2, 10), ev("g2", 3, 20),
        ev("g1", 11, 7))
      query.processAllAvailable()
      assert(stateRows == 3L, s"state rows = $stateRows")
      assert(spark.table("sq_state").count() == 0)
      // wm -> 20: all three close and EVICT; only ([20,30), g1) open
      input.addData(ev("g1", 25, 1))
      query.processAllAvailable()
      assert(stateRows == 1L, s"state rows = $stateRows")
      assert(spark.table("sq_state").count() == 3)
      // a second group joins the open window: 2 open pairs
      input.addData(ev("g2", 26, 2), ev("g1", 27, 3))
      query.processAllAvailable()
      assert(stateRows == 2L, s"state rows = $stateRows")
      // wm -> 40: both evict, the soak ends with the single fresh pair
      input.addData(ev("g1", 45, 1))
      query.processAllAvailable()
      assert(stateRows == 1L, s"state rows = $stateRows")
      assert(spark.table("sq_state").count() == 5)
    } finally query.stop()
  }

  test("composition: closed-window thresholds gate the NEXT window's " +
    "stream — the streaming face of the batch quantile band gate") {
    // The feedback pattern the operator exists for: the threshold query
    // materializes per-(window, group) quantiles as windows close; a
    // second query on the same source gates each micro-batch's docs
    // against the LATEST closed window's band via foreachBatch (the
    // standard Structured Streaming side-input mechanism — a
    // broadcast-joined table refreshed per batch, no stream-stream
    // join needed because thresholds are final when read).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QEvent]
    val thresholds = new StreamingQuantileStats(Seq("g"), "v",
      quantiles = Seq(0.1, 0.9), windowDuration = "10 seconds")
      .transform(input.toDF().withWatermark("ts", "2 seconds"))
    val thQuery = thresholds.writeStream.format("memory")
      .queryName("sq_gate_th").outputMode("append").start()
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val gateQuery = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val th = spark.table("sq_gate_th")
        if (!th.isEmpty) {
          import org.apache.spark.sql.expressions.Window
          val latest = th.withColumn("__rn",
            org.apache.spark.sql.functions.row_number().over(
              Window.partitionBy("g")
                .orderBy(org.apache.spark.sql.functions.col("window_end")
                  .desc)))
            .filter(org.apache.spark.sql.functions.col("__rn") === 1)
            .select("g", "p10", "p90")
          batch.join(org.apache.spark.sql.functions.broadcast(latest), "g")
            .filter(org.apache.spark.sql.functions.col("v") >=
              org.apache.spark.sql.functions.col("p10") &&
              org.apache.spark.sql.functions.col("v") <=
              org.apache.spark.sql.functions.col("p90"))
            .select("g", "v")
            .collect().foreach(r =>
              kept.synchronized {
                kept += ((r.getString(0), r.getDouble(1)))
              })
        }
        ()
      }.start()
    try {
      // window [0,10): g1 values 1..10 -> p10 = 1, p90 = 9
      input.addData((1 to 10).map(i => ev("g1", i.toLong % 10, i.toDouble)): _*)
      thQuery.processAllAvailable(); gateQuery.processAllAvailable()
      // close [0,10): the threshold row (p10=1, p90=9) materializes
      input.addData(ev("g1", 30, 100.0))
      thQuery.processAllAvailable(); gateQuery.processAllAvailable()
      // next batch of docs gates against the closed window's band:
      // 0.5 (< p10) and 9.5 (> p90) drop, 5.0 keeps
      input.addData(ev("g1", 31, 0.5), ev("g1", 32, 5.0),
        ev("g1", 33, 9.5))
      thQuery.processAllAvailable(); gateQuery.processAllAvailable()
      val gated = kept.synchronized(kept.toSet)
      assert(gated.contains(("g1", 5.0)), gated)
      assert(!gated.contains(("g1", 0.5)) && !gated.contains(("g1", 9.5)),
        gated)
    } finally { thQuery.stop(); gateQuery.stop() }
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
