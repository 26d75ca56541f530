package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.testing.PlainFrame

/** Golden-case suite for the interval identifier: every corpus case runs
  * through both implementations under its marker-use configs and must
  * reproduce the expected `iid` column exactly (enumerated) or up to
  * relabeling (raw/valid; reference:
  * tests/pyspark/wranglers/test_interval_identifier.py).
  */
class IntervalIdentifierSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  import IntervalCorpus._

  private def runCase(gc: GoldenCase, su: Boolean, eu: Boolean,
                      adjusted: Boolean): PlainFrame = {
    val df = gc.input.toDF(spark)
    PlainFrame.fromDF(gc.wrangler(su, eu, adjusted).transform(df))
  }

  /** Exact golden equality for enumerated results, across the generic,
    * adjusted and salted (saltBuckets=3, forcing chunk carries)
    * formulations.
    */
  private def checkExact(gc: GoldenCase): Unit =
    for ((su, eu) <- gc.configs; variant <- Seq("generic", "adjusted", "salted")) {
      val label = s"${gc.name} su=$su eu=$eu $variant"
      val w = variant match {
        case "salted" => gc.saltedWrangler(su, eu)
        case v        => gc.wrangler(su, eu, adjusted = v == "adjusted")
      }
      val got = PlainFrame.fromDF(w.transform(gc.input.toDF(spark)))
      try got.assertEqual(gc.expected)
      catch {
        case e: AssertionError =>
          throw new AssertionError(s"[$label] ${e.getMessage}", e)
      }
    }

  /** Relabeling-insensitive comparison for raw/valid result types: group
    * rows by groupby cols, sort by orderby, and compare change-point
    * positions (and, for valid, the zero-set) of the id sequence
    * (reference: test_interval_identifier.py:133-197).
    */
  private def checkUpToRelabeling(gc: GoldenCase, zeroSet: Boolean): Unit =
    for ((su, eu) <- gc.configs;
         variant <- Seq("generic", "adjusted", "salted")) {
      val label = s"${gc.name} su=$su eu=$eu $variant"
      val got = variant match {
        case "salted" => PlainFrame.fromDF(
          gc.saltedWrangler(su, eu).transform(gc.input.toDF(spark)))
        case v => runCase(gc, su, eu, adjusted = v == "adjusted")
      }

      def sequences(pf: PlainFrame): Map[Vector[Any], Vector[Long]] = {
        val gIdx = gc.groupby.map(pf.columnNames.indexOf)
        val oIdx = gc.orderby.map(pf.columnNames.indexOf)
        val iIdx = pf.columnNames.indexOf("iid")
        pf.rows.groupBy(r => gIdx.map(r).toVector).map { case (k, rs) =>
          val sorted = rs.sortBy(r => oIdx.map(c => r(c).asInstanceOf[Long]))(
            Ordering.Implicits.seqOrdering[Seq, Long])
          val ordered = if (gc.ascending.head) sorted else sorted.reverse
          k -> ordered.map(_(iIdx).asInstanceOf[Long]).toVector
        }
      }

      def changePoints(xs: Vector[Long]): Vector[Boolean] =
        xs.zip(0L +: xs).zipWithIndex.map { case ((cur, prev), i) =>
          i != 0 && cur != prev
        }

      val g = sequences(got)
      val e = sequences(gc.expected)
      assert(g.keySet == e.keySet, s"[$label] group keys differ")
      for (k <- g.keySet) {
        assert(changePoints(g(k)) == changePoints(e(k)),
          s"[$label] change points differ for group $k: ${g(k)} vs ${e(k)}")
        if (zeroSet)
          assert(g(k).map(_ == 0) == e(k).map(_ == 0),
            s"[$label] zero positions differ for group $k: ${g(k)} vs ${e(k)}")
      }
    }

  collectionGeneral.foreach { gc =>
    test(s"CollectionGeneral/${gc.name}") { checkExact(gc) }
  }

  collectionIdenticalStartEnd.foreach { gc =>
    test(s"CollectionIdenticalStartEnd/${gc.name}") { checkExact(gc) }
  }

  markerSpecifics.foreach { gc =>
    test(s"CollectionMarkerSpecifics/${gc.name}") { checkExact(gc) }
  }

  collectionNoOrderGroupBy.foreach { gc =>
    test(s"CollectionNoOrderGroupBy/${gc.name}") {
      checkExact(gc) // generic + adjusted, all four span configs
      for ((su, eu) <- gc.configs) { // single-pass formulation too
        val w = new IntervalIdentifierSinglePass("marker", gc.markerStart,
          gc.markerEnd, su, eu, gc.orderby, Nil, gc.ascending,
          gc.resultType, "iid")
        val got = PlainFrame.fromDF(w.transform(gc.input.toDF(spark)))
        try got.assertEqual(gc.expected)
        catch {
          case e: AssertionError => throw new AssertionError(
            s"[${gc.name} single-pass su=$su eu=$eu] ${e.getMessage}", e)
        }
      }
    }
  }

  test("ResultTypeRawIids (change points)") {
    checkUpToRelabeling(resultTypeRaw, zeroSet = false)
  }

  test("ResultTypeValidIids (change points + zero set)") {
    checkUpToRelabeling(resultTypeValid, zeroSet = true)
  }

  test("partitioning invariance: repartition(5) does not change results") {
    val gc = multipleIntervalsSpanningGroupbyExtended
    val df = gc.input.toDF(spark).repartition(5)
    val got = PlainFrame.fromDF(gc.wrangler(false, true, adjusted = false)
      .transform(df))
    got.assertEqual(gc.expected)
  }

  test("missing groupby: single global sequence") {
    // reference: tests/pyspark/wranglers/test_interval_identifier.py:200-223
    val gc = multipleIntervals
    val w = new IntervalIdentifier("marker", 1, Some(2),
      orderbyColumns = Seq("order"), groupbyColumns = Nil,
      targetColumnName = "iid")
    val got = PlainFrame.fromDF(w.transform(gc.input.toDF(spark)))
    got.assertEqual(gc.expected)
  }

  test("missing orderby raises") {
    intercept[IllegalArgumentException] {
      new IntervalIdentifier("marker", 1, Some(2), orderbyColumns = Nil)
    }
  }

  test("unknown column raises") {
    val gc = singleInterval
    val w = new IntervalIdentifier("nope", 1, Some(2),
      orderbyColumns = Seq("order"), groupbyColumns = Seq("groupby"))
    intercept[IllegalArgumentException] {
      w.transform(gc.input.toDF(spark))
    }
  }

  test("target column name is configurable and sample size preserved") {
    val gc = singleInterval
    val w = new IntervalIdentifier("marker", 1, Some(2),
      orderbyColumns = Seq("order"), groupbyColumns = Seq("groupby"),
      targetColumnName = "my_iids")
    val out = w.transform(gc.input.toDF(spark))
    assert(out.columns.contains("my_iids"))
    assert(out.count() == gc.input.nRows)
    assert(w.preservesSampleSize)
  }
}
