package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based cross-check of the window-algebra interval identifier
  * against an independent sequential oracle.
  *
  * The oracle reimplements the SPEC (not the algorithm): take the
  * start/end marker event subsequence, collapse consecutive same-type
  * runs per the use-first/use-last flags, then pair each start with the
  * immediately following end — a state-machine formulation equivalent to
  * the reference's pandas NaiveIterator
  * (reference: src/pywrangler/pandas/wranglers/interval_identifier.py:74-293),
  * structurally unlike the cumsum window algebra it checks.
  */
class IntervalPropertySpec extends AnyFunSuite {

  /** Deterministic seeded sampling (scalatestplus bridge not on the
    * offline classpath; explicit seeds also make failures replayable). */
  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  private val spark = TestSpark.spark

  private val Start = "s"
  private val End = "e"

  /** Sequential reference: enumerated iids for one ordered group. */
  private def oracle(markers: Seq[String], su: Boolean,
                     eu: Boolean): Seq[Long] = {
    val events = markers.zipWithIndex.collect {
      case (m, i) if m == Start || m == End => (i, m == Start)
    }
    // collapse consecutive same-type runs: keep first or last per flags
    val kept = Vector.newBuilder[(Int, Boolean)]
    var run = List.empty[(Int, Boolean)]
    def flush(): Unit = if (run.nonEmpty) {
      val isStart = run.head._2
      val keepFirst = if (isStart) su else eu
      kept += (if (keepFirst) run.last else run.head) // run is reversed
      run = Nil
    }
    events.foreach { ev =>
      if (run.nonEmpty && run.head._2 != ev._2) flush()
      run = ev :: run
    }
    flush()
    val seq = kept.result()
    val iids = Array.fill(markers.size)(0L)
    var n = 0
    var k = 0
    while (k < seq.size - 1) {
      if (seq(k)._2 && !seq(k + 1)._2) {
        n += 1
        (seq(k)._1 to seq(k + 1)._1).foreach(i => iids(i) = n)
        k += 2
      } else k += 1
    }
    iids.toSeq
  }

  /** Identical-marker reference: running count of the marker. */
  private def oracleIdentical(markers: Seq[String]): Seq[Long] =
    markers.scanLeft(0L)((acc, m) => if (m == Start) acc + 1 else acc).tail

  private val markerGen: Gen[String] =
    Gen.frequency(3 -> Gen.const(Start), 3 -> Gen.const(End),
      3 -> Gen.const("x"), 1 -> Gen.const(null: String))

  private val groupsGen: Gen[List[List[String]]] =
    Gen.choose(1, 3).flatMap(g =>
      Gen.listOfN(g, Gen.choose(0, 25).flatMap(Gen.listOfN(_, markerGen))))

  private val schema = StructType(Seq(
    StructField("g", IntegerType), StructField("o", IntegerType),
    StructField("marker", StringType)))

  private def runSpark(groups: List[List[String]], su: Boolean, eu: Boolean,
                       adjusted: Boolean,
                       identical: Boolean = false): Map[(Int, Int), Long] = {
    val rows = for ((ms, g) <- groups.zipWithIndex; (m, o) <- ms.zipWithIndex)
      yield Row(g, o, m)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val w =
      if (identical)
        new IntervalIdentifier("marker", Start, None,
          orderbyColumns = Seq("o"), groupbyColumns = Seq("g"))
      else if (adjusted)
        new IntervalIdentifierAdjusted("marker", Start, Some(End), su, eu,
          orderbyColumns = Seq("o"), groupbyColumns = Seq("g"))
      else
        new IntervalIdentifier("marker", Start, Some(End), su, eu,
          orderbyColumns = Seq("o"), groupbyColumns = Seq("g"))
    w.transform(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Number]("iids").longValue)
      .toMap
  }

  private def check(su: Boolean, eu: Boolean, adjusted: Boolean): Unit =
    forAllSeeded(groupsGen, 40) { groups =>
      val got = runSpark(groups, su, eu, adjusted)
      groups.zipWithIndex.foreach { case (ms, g) =>
        val want = oracle(ms, su, eu)
        ms.indices.foreach { o =>
          assert(got((g, o)) == want(o),
            s"group $g markers=$ms config su=$su eu=$eu adjusted=$adjusted " +
              s"pos $o: got ${got((g, o))}, want ${want(o)}")
        }
      }
    }

  for {
    (su, eu) <- Seq((false, true), (true, true), (false, false), (true, false))
  } test(s"property: generic matches sequential oracle su=$su eu=$eu") {
    check(su, eu, adjusted = false)
  }

  test("property: adjusted FSFE fast path matches oracle") {
    check(su = true, eu = true, adjusted = true)
  }

  test("property: adjusted LSLE fast path matches oracle") {
    check(su = false, eu = false, adjusted = true)
  }

  test("property: identical-marker path matches running-count oracle") {
    forAllSeeded(groupsGen, 30) { groups =>
      val got = runSpark(groups, su = false, eu = true, adjusted = false,
        identical = true)
      groups.zipWithIndex.foreach { case (ms, g) =>
        val want = oracleIdentical(ms)
        ms.indices.foreach { o => assert(got((g, o)) == want(o)) }
      }
    }
  }
}
