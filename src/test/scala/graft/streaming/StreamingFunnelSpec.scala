package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end streaming funnel: MemoryStream -> watermark ->
  * StreamingFunnel -> memory sink, with out-of-order and cross-batch
  * arrivals, checked against the batch Funnel semantics (each step
  * completion emitted exactly once, never retracted).
  */
class StreamingFunnelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(g: String, sec: Long, tpe: String): FunnelEvent =
    FunnelEvent(g, new Timestamp(sec * 1000L), tpe)

  private val steps = Seq("signup", "view", "purchase")

  test("step completions match batch semantics across batches, " +
    "emitted exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val op = new StreamingFunnel(steps)
    val out = op.transform(input.toDF().withWatermark("ts", "2 seconds"))
    val query = out.writeStream.format("memory").queryName("funnel_test")
      .outputMode("append").start()
    try {
      // batch 1 (out of order): view@5 BEFORE the signup@10 must not
      // count; the view@20 does — but only once the watermark confirms
      // no earlier event can arrive
      input.addData(ev("u1", 5, "view"), ev("u1", 10, "signup"),
        ev("u1", 20, "view"), ev("u1", 15, "purchase"),
        ev("u2", 10, "signup"))
      query.processAllAvailable()
      // batch 2: u1's purchase after the counted view; u2 never advances
      input.addData(ev("u1", 30, "purchase"), ev("u2", 5, "view"))
      query.processAllAvailable()
      // advance the watermark far enough to finalize everything
      input.addData(ev("u3", 100, "signup"))
      query.processAllAvailable()
      input.addData(ev("u3", 200, "click")) // filtered non-step type
      query.processAllAvailable()

      val got = spark.table("funnel_test").as[FunnelStepDone].collect()
      // exactly-once: no (key, stepIndex) appears twice
      val keys = got.map(r => (r.groupKey, r.stepIndex)).toSeq
      assert(keys.size == keys.distinct.size, got.mkString(", "))
      val byKey = got.groupBy(_.groupKey)
        .map { case (k, rs) =>
          k -> rs.sortBy(_.stepIndex).map(r => (r.step, r.ts)).toSeq
        }
      // u1: signup@10, first view >= 10 is 20, first purchase >= 20 is
      // 30 (the purchase@15 is before the counted view: ignored)
      assert(byKey("u1") == Seq(("signup", 10000L), ("view", 20000L),
        ("purchase", 30000L)), byKey.toString)
      // u2: the view@5 is before its signup@10: funnel stuck at step 0
      assert(byKey("u2") == Seq(("signup", 10000L)), byKey.toString)
      // u3: only its signup (the click is not a step type)
      assert(byKey("u3") == Seq(("signup", 100000L)), byKey.toString)
    } finally query.stop()
  }

  test("fold: order restoration, ties chain, completed funnel stops") {
    val op = new StreamingFunnel(steps)
    // ties at the same instant chain, matching the batch operator
    assert(op.fold(Nil, Seq((10L, "signup"), (10L, "view"),
      (10L, "purchase"))) == Seq(10L, 10L, 10L))
    // a step type arriving before its turn does not count
    assert(op.fold(Nil, Seq((5L, "view"), (10L, "signup"),
      (7L, "purchase"))) == Seq(10L))
    // folding resumes from carried state
    assert(op.fold(Seq(10L), Seq((12L, "view"), (11L, "purchase")))
      == Seq(10L, 12L))
    // completed funnels ignore everything
    assert(op.fold(Seq(1L, 2L, 3L), Seq((9L, "signup"))) ==
      Seq(1L, 2L, 3L))
  }

  test("guards: short and duplicate step lists rejected") {
    intercept[IllegalArgumentException](new StreamingFunnel(Seq("a")))
    intercept[IllegalArgumentException](
      new StreamingFunnel(Seq("a", "a")))
    intercept[IllegalArgumentException](
      new StreamingFunnel(steps, completedRetentionMs = -1L))
    intercept[IllegalArgumentException](
      new StreamingFunnel(steps, idleTtlMs = 0L))
  }

  test("state lifecycle: completed keys are removed (round-9 ADVICE); " +
    "idle TTL reaps never-completing keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    // 5-second idle TTL so the stuck key u2 is reaped once the
    // watermark moves 5s of event time past its last activity. The
    // watermark-driver keys w1/w2/w3 COMPLETE their funnel in one
    // instant, so each is itself removed once finalized — they advance
    // the clock without accumulating state of their own.
    val op = new StreamingFunnel(steps, idleTtlMs = 5000L)
    val out = op.transform(input.toDF().withWatermark("ts", "2 seconds"))
    val query = out.writeStream.format("memory")
      .queryName("funnel_state_test").outputMode("append").start()
    try {
      def stateRows: Long = {
        val p = query.lastProgress
        p.stateOperators.toSeq.map(_.numRowsTotal).sum
      }
      def full(k: String, sec: Long) = Seq(ev(k, sec, "signup"),
        ev(k, sec, "view"), ev(k, sec, "purchase"))
      // u1 completes by ts=12; u2 sticks at step 0 forever
      input.addData(Seq(ev("u1", 10, "signup"), ev("u1", 11, "view"),
        ev("u1", 12, "purchase"), ev("u2", 10, "signup")): _*)
      query.processAllAvailable()
      input.addData(full("w1", 30): _*)  // -> wm 10: nothing final yet
      query.processAllAvailable()
      input.addData(full("w2", 60): _*)
      query.processAllAvailable()
      // the data batch runs at wm 28 (u1 completes and is removed; u2
      // idle-reaped: its horizon was set at wm=10 -> expiry 15) and the
      // trailing no-data batch advances wm to 58, finalizing w1 too —
      // only w2's still-unripe buffer remains
      assert(stateRows == 1L, s"state rows = $stateRows")
      input.addData(full("w3", 100): _*) // -> wm 98: w2 finalizes
      query.processAllAvailable()
      // w2 completed and removed; only w3's buffer remains — completion
      // keeps the store at O(in-flight keys), never O(all keys)
      assert(stateRows == 1L, s"state rows = $stateRows")
      // emissions unaffected: exactly-once facts for u1's full funnel,
      // exactly one fact (signup) for the reaped u2
      val got = spark.table("funnel_state_test").as[FunnelStepDone]
        .collect()
      val u1 = got.filter(_.groupKey == "u1").sortBy(_.stepIndex)
        .map(r => (r.step, r.ts)).toSeq
      assert(u1 == Seq(("signup", 10000L), ("view", 11000L),
        ("purchase", 12000L)), got.mkString(", "))
      assert(got.count(_.groupKey == "u2") == 1, got.mkString(", "))
    } finally query.stop()
  }

  test("idle TTL is anchored to the key's own EVENT-time activity, not " +
    "the processing batch's watermark (round-10 ADVICE)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    // 5 s TTL. u signs up at ts=10 and returns at ts=14 — within its
    // own 5 s event-time horizon (expiry 15), so its progress MUST
    // survive, even though the signup was delivered in a batch whose
    // watermark was far behind (a wm-anchored horizon would have
    // expired u at wm 5 and re-started it, losing the funnel)
    val op = new StreamingFunnel(steps, idleTtlMs = 5000L)
    val out = op.transform(input.toDF().withWatermark("ts", "2 seconds"))
    val query = out.writeStream.format("memory")
      .queryName("funnel_anchor_test").outputMode("append").start()
    try {
      def full(k: String, sec: Long) = Seq(ev(k, sec, "signup"),
        ev(k, sec, "view"), ev(k, sec, "purchase"))
      input.addData(ev("u", 10, "signup") +: full("w1", 12): _*)
      // wm -> 10: u's signup folds in the trailing batch. A wm-anchored
      // horizon (set while wm was still 0) would be 5 and reap u HERE;
      // the event-time anchor is 10+5 = 15, so u survives
      query.processAllAvailable()
      input.addData(full("w2", 15): _*)
      query.processAllAvailable() // wm -> 13: u idle since 10, expiry 15
      input.addData(Seq(ev("u", 14, "view"), ev("u", 14, "purchase")) ++
        full("w3", 30): _*)
      query.processAllAvailable() // u continues and completes
      val got = spark.table("funnel_anchor_test").as[FunnelStepDone]
        .collect().filter(_.groupKey == "u").sortBy(_.stepIndex)
        .map(r => (r.step, r.ts)).toSeq
      assert(got == Seq(("signup", 10000L), ("view", 14000L),
        ("purchase", 14000L)), got.mkString(", "))
    } finally query.stop()
  }

  test("episodic re-entry is deterministic in EVENT time: events past " +
    "the retention horizon start a new episode, at-or-below are " +
    "swallowed even when delivered early") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    // completion at ts=12 -> horizon 17; signup@15 (<= 17) must be
    // swallowed FOREVER even though it is delivered long before the
    // watermark passes 17, while the @20..22 events (> 17) must fold
    // as a full second episode — the previous revision judged
    // swallowing by ARRIVAL batch, so this exact stream could emit
    // either 3 or 7 facts depending on delivery timing
    val op = new StreamingFunnel(steps, completedRetentionMs = 5000L)
    val out = op.transform(input.toDF().withWatermark("ts", "2 seconds"))
    val query = out.writeStream.format("memory")
      .queryName("funnel_episodic_test").outputMode("append").start()
    try {
      input.addData(
        ev("u1", 10, "signup"), ev("u1", 11, "view"),
        ev("u1", 12, "purchase"),
        ev("u1", 15, "signup"), // within the horizon: swallowed
        ev("u1", 20, "signup"), ev("u1", 21, "view"),
        ev("u1", 22, "purchase")) // the next episode
      query.processAllAvailable()
      input.addData(ev("wm", 40, "signup"))
      query.processAllAvailable()
      input.addData(ev("wm", 80, "signup"))
      query.processAllAvailable()
      val got = spark.table("funnel_episodic_test").as[FunnelStepDone]
        .collect().filter(_.groupKey == "u1")
      assert(got.length == 6, got.mkString(", "))
      assert(!got.exists(_.ts == 15000L), got.mkString(", "))
      assert(got.map(_.ts).toSet ==
        Set(10000L, 11000L, 12000L, 20000L, 21000L, 22000L),
        got.mkString(", "))
      // two full episodes: each step index emitted exactly twice
      (0 to 2).foreach { i =>
        assert(got.count(_.stepIndex == i) == 2, got.mkString(", "))
      }
    } finally query.stop()
  }

  test("completedRetentionMs: a tombstone shields re-entry within the " +
    "horizon, then expires") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val op = new StreamingFunnel(steps, completedRetentionMs = 50000L)
    val out = op.transform(input.toDF().withWatermark("ts", "2 seconds"))
    val query = out.writeStream.format("memory")
      .queryName("funnel_retention_test").outputMode("append").start()
    try {
      input.addData(ev("u1", 10, "signup"), ev("u1", 11, "view"),
        ev("u1", 12, "purchase"))
      input.addData(ev("wm", 30, "signup")) // advance wm past 12
      query.processAllAvailable()
      // u1 re-enters within the 50s retention: the tombstone holds all
      // three steps, so nothing new can be emitted for u1
      input.addData(ev("u1", 35, "signup"), ev("u1", 36, "view"),
        ev("u1", 37, "purchase"))
      input.addData(ev("wm", 60, "signup"))
      query.processAllAvailable()
      val got = spark.table("funnel_retention_test").as[FunnelStepDone]
        .collect().filter(_.groupKey == "u1")
      val keys = got.map(r => (r.groupKey, r.stepIndex)).toSeq
      assert(keys.size == keys.distinct.size, got.mkString(", "))
      assert(got.length == 3, got.mkString(", "))
      assert(got.map(_.ts).toSet == Set(10000L, 11000L, 12000L),
        got.mkString(", "))
    } finally query.stop()
  }
}
