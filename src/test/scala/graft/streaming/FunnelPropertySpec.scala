package graft.streaming

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Funnel

/** Randomized cross-implementation check of the funnel chain: an
  * independent fixed-point model computes
  * `t_k = min{ts >= t_(k-1) : step-k event}` per user, and both the
  * batch window-chain operator and the streaming fold must agree on
  * every random event set — including heavy ties (small timestamp
  * domain) and missing/misordered steps. This spec found a real
  * divergence: a ts-only-sorted streaming fold misses a step-2 event
  * tying with the step-1 instant but sorted before it; the operator
  * now tiebreaks equal timestamps by step index.
  */
class FunnelPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val steps = Seq("s1", "s2", "s3")
  private val types = steps ++ Seq("x", "y") // non-step noise

  /** Fixed-point model: completed-step times per user (order-free,
    * computed from the event SET like the batch conditional-min
    * windows).
    */
  private def model(events: Seq[(Long, Long, String)])
      : Map[Long, Seq[Long]] =
    events.groupBy(_._1).map { case (u, evs) =>
      var times = Vector.empty[Long]
      var continue = true
      while (continue && times.size < steps.size) {
        val step = steps(times.size)
        val floor = times.lastOption.getOrElse(Long.MinValue)
        val cands = evs.collect {
          case (_, ts, tpe) if tpe == step && ts >= floor => ts
        }
        if (cands.isEmpty) continue = false
        else times = times :+ cands.min
      }
      u -> times
    }

  test("batch Funnel agrees with the fixed-point model on random " +
    "tie-heavy event sets") {
    val rnd = new Random(98765L)
    for (round <- 1 to 15) {
      val events = (0 until 150).map { _ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(12).toLong,
          types(rnd.nextInt(types.size)))
      }
      val want = model(events)
      val got = Funnel(steps).transform(
          events.toDF("user_id", "ts", "event_type"))
        .select("user_id", "t_s1", "t_s2", "t_s3", "steps_completed")
        .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
        .collect()
      assert(got.length == want.size, s"round $round user count")
      got.foreach { case (u, t1, t2, t3, sc) =>
        val w = want(u)
        val ts = Seq(t1, t2, t3).flatten
        assert(ts == w && sc == w.size.toLong,
          s"round $round user $u: got ($ts, $sc) want $w")
      }
    }
  }

  test("streaming fold agrees with the fixed-point model, including " +
    "cross-batch splits at watermark boundaries") {
    val rnd = new Random(13579L)
    val op = new StreamingFunnel(steps)
    for (round <- 1 to 60) {
      val evs = (0 until 40).map { _ =>
        (0L, rnd.nextInt(12).toLong, types(rnd.nextInt(types.size)))
      }
      val want = model(evs)(0L)
      // the operator sorts by (ts, step index) before folding; mirror it
      val sorted = evs.collect {
        case (_, ts, tpe) if steps.contains(tpe) => (ts, tpe)
      }.sortBy { case (ts, tpe) => (ts, steps.indexOf(tpe)) }
      assert(op.fold(Nil, sorted) == want, s"round $round")
      // cross-batch split invariance at a TIMESTAMP boundary (the
      // engine's late-row drop guarantees same-ts events always ripen
      // in the same batch, so mid-tie splits cannot occur)
      val cutTs = rnd.nextInt(14) - 1 // may cut before/after everything
      val (a, b) = sorted.partition(_._1 <= cutTs)
      assert(op.fold(op.fold(Nil, a), b) == want,
        s"round $round cutTs $cutTs")
    }
  }
}
