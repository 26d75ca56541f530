package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end streaming spec: MemoryStream -> watermark ->
  * StreamingIntervalIdentifier -> memory sink, with out-of-order and
  * cross-batch arrivals, checked against the batch LSFE semantics.
  */
class StreamingIntervalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(g: String, order: Long, marker: String): StreamEvent =
    StreamEvent(g, new Timestamp((order + 1) * 1000L), order, marker)

  test("streaming LSFE matches batch semantics across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val op = new StreamingIntervalIdentifier("s", "e")
    val out = op.transform(
      input.toDF().withWatermark("ts", "2 seconds"))
    val query = out.writeStream.format("memory").queryName("iids_test")
      .outputMode("append").start()
    try {
      // markers by order: 0:x 1:s 2:x 3:e 4:x 5:s 6:x 7:x 8:e 9:x
      // expected iids:    0   1   1   1   0   2   2   2   2   0
      input.addData(ev("g", 3, "e"), ev("g", 0, "x"), ev("g", 1, "s"),
        ev("g", 4, "x"), ev("g", 2, "x"))
      query.processAllAvailable()
      input.addData(ev("g", 9, "x"), ev("g", 5, "s"), ev("g", 6, "x"),
        ev("g", 7, "x"), ev("g", 8, "e"))
      query.processAllAvailable()
      input.addData(ev("g", 20, "x")) // advance watermark to flush the tail
      query.processAllAvailable()

      val got = spark.table("iids_test").as[StreamIid].collect()
        .map(r => r.order -> r.iids).toMap
      val want = Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
        5L -> 2L, 6L -> 2L, 7L -> 2L, 8L -> 2L, 9L -> 0L)
      assert(want.toSet.subsetOf(got.toSet),
        s"got $got, want at least $want")
    } finally query.stop()
  }

  test("streaming: two groups stay independent, state carries count") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val op = new StreamingIntervalIdentifier("s", "e")
    val out = op.transform(
      input.toDF().withWatermark("ts", "1 second"))
    val query = out.writeStream.format("memory").queryName("iids_test2")
      .outputMode("append").start()
    try {
      input.addData(ev("a", 0, "s"), ev("a", 1, "e"), ev("b", 0, "x"))
      query.processAllAvailable()
      input.addData(ev("a", 2, "s"), ev("a", 3, "e"),
        ev("b", 1, "s"), ev("b", 2, "e"))
      query.processAllAvailable()
      input.addData(ev("a", 50, "x"), ev("b", 50, "x"))
      query.processAllAvailable()

      val got = spark.table("iids_test2").as[StreamIid].collect()
        .map(r => (r.groupKey, r.order) -> r.iids).toMap
      assert(got(("a", 0L)) == 1L && got(("a", 1L)) == 1L)
      assert(got(("a", 2L)) == 2L && got(("a", 3L)) == 2L) // count carried
      assert(got(("b", 0L)) == 0L)
      assert(got(("b", 1L)) == 1L && got(("b", 2L)) == 1L)
    } finally query.stop()
  }

  test("maxPending bounds state: a never-closing interval is evicted as " +
    "non-interval and cannot close retroactively") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val op = new StreamingIntervalIdentifier("s", "e", maxPending = 3)
    val out = op.transform(
      input.toDF().withWatermark("ts", "1 second"))
    val query = out.writeStream.format("memory").queryName("iids_evict")
      .outputMode("append").start()
    try {
      // an open start marker followed by filler that never ends: the
      // buffered suffix would grow forever without the cap
      input.addData(ev("g", 0, "s"), ev("g", 1, "x"), ev("g", 2, "x"))
      query.processAllAvailable()
      input.addData(ev("g", 3, "x"), ev("g", 4, "x"), ev("g", 5, "x"))
      query.processAllAvailable()
      input.addData(ev("g", 6, "x"), ev("g", 7, "x"))
      query.processAllAvailable()
      // rows 0.. must have been force-finalized as 0 despite no end and
      // no watermark passing them beyond the open start
      val afterOverflow = spark.table("iids_evict").as[StreamIid]
        .collect().map(r => r.order -> r.iids).toMap
      assert(afterOverflow.keySet.contains(0L),
        s"open-start row not evicted: $afterOverflow")
      assert(afterOverflow(0L) == 0L)
      // a late end marker must NOT resurrect the abandoned interval
      input.addData(ev("g", 8, "e"), ev("g", 20, "x"))
      query.processAllAvailable()
      val got = spark.table("iids_evict").as[StreamIid].collect()
        .map(r => r.order -> r.iids).toMap
      assert((0L to 8L).forall(o => got.get(o).forall(_ == 0L)), got.toString)
    } finally query.stop()
  }

  test("soak: 20 batches of a never-closing group hold the state bound " +
    "every batch — eviction keeps pace with the stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val cap = 16
    val op = new StreamingIntervalIdentifier("s", "e", maxPending = cap)
    val out = op.transform(
      input.toDF().withWatermark("ts", "1 second"))
    val query = out.writeStream.format("memory").queryName("iids_soak")
      .outputMode("append").start()
    try {
      // one open start, then filler forever: the adversarial shape whose
      // buffer grows without bound at maxPending = default
      var sent = 0L
      input.addData(ev("g", 0, "s")); sent += 1
      (1 to 20).foreach { batch =>
        val base = batch * 10L
        input.addData((0L until 10L).map(i => ev("g", base + i, "x")): _*)
        sent += 10
        query.processAllAvailable()
        val emitted = spark.table("iids_soak").count()
        // invariant: at most `cap` rows are ever buffered, so everything
        // else must already have been emitted (watermark trails one
        // batch: allow rows still above it)
        val aboveWm = 10L // the newest batch may still be unripe
        assert(emitted >= sent - cap - aboveWm,
          s"batch $batch: $emitted emitted of $sent sent — state " +
            s"exceeded maxPending=$cap")
      }
      // everything evicted under an open start is non-interval
      val ids = spark.table("iids_soak").as[StreamIid]
        .collect().map(_.iids).toSet
      assert(ids == Set(0L), s"unexpected interval ids: $ids")
    } finally query.stop()
  }

  test("assign: pairing, open-start cut, and base count") {
    val op = new StreamingIntervalIdentifier("s", "e")
    val (ids, cut, n, open) = op.assign(Seq("x", "s", "e", "x", "s"), 5L)
    assert(ids == Seq(0L, 6L, 6L, 0L, 0L))
    assert(cut == 4) // everything before the open start is final
    assert(n == 6L)
    assert(!open) // first-end config: never extendable
  }
}
