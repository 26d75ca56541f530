package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Last-end (and all other) streaming configs validated two ways:
  * a deterministic simulation of the step loop (random marker sequences,
  * random batch splits, gradually advancing watermark) against the
  * sequential collapse-pair oracle, plus one end-to-end MemoryStream LSLE
  * run exercising the GroupState glue.
  */
class StreamingLastEndSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Sequential oracle generalized over both use-first flags (same
    * algebra as IntervalPropertySpec's, plus last-end run collapse).
    */
  private def oracle(markers: Seq[String], su: Boolean,
                     eu: Boolean): (Seq[Long], Int) = {
    val events = markers.zipWithIndex.collect {
      case (m, i) if m == "s" || m == "e" => (i, m == "s")
    }
    val kept = Vector.newBuilder[(Int, Boolean)]
    var run = List.empty[(Int, Boolean)]
    def flush(): Unit = if (run.nonEmpty) {
      val keepFirst = if (run.head._2) su else eu
      kept += (if (keepFirst) run.last else run.head)
      run = Nil
    }
    events.foreach { ev =>
      if (run.nonEmpty && run.head._2 != ev._2) flush()
      run = ev :: run
    }
    flush()
    val seq = kept.result()
    val ids = Array.fill(markers.size)(0L)
    var n = 0
    var k = 0
    var lastPairedE = -1
    while (k < seq.size - 1) {
      if (seq(k)._2 && !seq(k + 1)._2) {
        n += 1
        (seq(k)._1 to seq(k + 1)._1).foreach(i => ids(i) = n)
        lastPairedE = seq(k + 1)._1
        k += 2
      } else k += 1
    }
    // decidable prefix at stream end (a stream never "ends": an open
    // interval, or a still-extendable last-end run, holds its suffix)
    val firstOpenStart = markers.zipWithIndex.indexWhere {
      case (m, i) => i > lastPairedE && m == "s"
    }
    val cut =
      if (firstOpenStart != -1) firstOpenStart
      else if (!eu && lastPairedE >= 0) lastPairedE + 1
      else markers.size
    (ids.toSeq, cut)
  }

  /** Replays the operator's step loop: arrivals split into batches (each
    * delivered out of order), watermark = max delivered ts of previous
    * batches, final infinite-watermark flush.
    */
  private def simulate(markers: Seq[String], su: Boolean, eu: Boolean,
                       nBatches: Int, seed: Long): Map[Long, Long] = {
    val op = new StreamingIntervalIdentifier("s", "e", su, eu)
    val rnd = new scala.util.Random(seed)
    val events = markers.zipWithIndex.map { case (m, i) =>
      ((i + 1) * 1000L, i.toLong, m)
    }
    val batches = {
      val cuts = Seq.fill(nBatches - 1)(rnd.nextInt(events.size + 1))
        .sorted
      (Seq(0) ++ cuts ++ Seq(events.size)).sliding(2)
        .map { case Seq(a, b) => events.slice(a, b) }.toSeq
    }
    var count = 0L
    var open = false
    var pending = Vector.empty[(Long, Long, String)]
    var wm = 0L
    val out = scala.collection.mutable.Map.empty[Long, Long]
    def stepWith(arrivals: Seq[(Long, Long, String)], newWm: Long): Unit = {
      wm = math.max(wm, newWm)
      pending = (pending ++ arrivals).sortBy(t => (t._2, t._1))
      val (ripe, unripe) = pending.partition(_._1 <= wm)
      val (ids, cut, c2, o2) = op.assign(ripe.map(_._3), count, open)
      ripe.take(cut).zip(ids.take(cut)).foreach { case ((_, o, _), id) =>
        out(o) = id
      }
      pending = ripe.drop(cut) ++ unripe
      count = c2
      open = o2
    }
    var delivered = 0L
    batches.foreach { b =>
      // watermark trails the previous batches' max event time
      stepWith(rnd.shuffle(b), delivered)
      delivered = math.max(delivered, b.map(_._1).maxOption.getOrElse(0L))
    }
    stepWith(Nil, Long.MaxValue) // final flush
    out.toMap
  }

  private val markerGen: Gen[String] =
    Gen.frequency(3 -> Gen.const("s"), 3 -> Gen.const("e"),
      3 -> Gen.const("x"))
  private val seqGen: Gen[List[String]] =
    Gen.choose(0, 30).flatMap(Gen.listOfN(_, markerGen))

  for ((su, eu) <- Seq((false, true), (true, true), (false, false),
    (true, false)))
    test(s"simulated stream matches sequential oracle su=$su eu=$eu") {
      (1 to 60).foreach { i =>
        seqGen(Gen.Parameters.default, Seed(i.toLong)).foreach { markers =>
          val (ids, cut) = oracle(markers, su, eu)
          val want = (0 until cut).map(o => o.toLong -> ids(o)).toMap
          (2 to 4).foreach { nb =>
            val got = simulate(markers, su, eu, nb, seed = i * 100L + nb)
            assert(got == want,
              s"seed=$i batches=$nb su=$su eu=$eu markers=$markers")
          }
        }
      }
    }

  test("end-to-end LSLE through MemoryStream: extending end-run re-attaches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(o: Long, m: String) =
      StreamEvent("g", new Timestamp((o + 1) * 1000L), o, m)
    val input = MemoryStream[StreamEvent]
    val op = new StreamingIntervalIdentifier("s", "e", endUseFirst = false)
    val out = op.transform(input.toDF().withWatermark("ts", "2 seconds"))
    val query = out.writeStream.format("memory").queryName("lsle_test")
      .outputMode("append").start()
    try {
      // 0:x 1:s 2:e -> interval 1 opens; end-run may extend
      input.addData(ev(0, "x"), ev(1, "s"), ev(2, "e"))
      query.processAllAvailable()
      // 3:x 4:e extends interval 1 through order 4; 5:s opens interval 2
      input.addData(ev(3, "x"), ev(4, "e"), ev(5, "s"), ev(6, "e"))
      query.processAllAvailable()
      input.addData(ev(30, "x")) // flush
      query.processAllAvailable()
      val got = spark.table("lsle_test").as[StreamIid].collect()
        .map(r => r.order -> r.iids).toMap
      val want = Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        5L -> 2L, 6L -> 2L)
      assert(want.toSet.subsetOf(got.toSet), s"got $got")
    } finally query.stop()
  }
}
