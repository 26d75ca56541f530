package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.testing._

/** Mutation testing of the interval identifier through DataTestCase: the
  * golden assertion must fail for every load-bearing cell perturbation
  * (reference protocol: datatestcase.py:281-311 — a surviving mutant
  * means the test constrains nothing).
  */
class IntervalMutationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def run(df: DataFrame): DataFrame =
    new IntervalIdentifier("marker", 1, Some(2),
      orderbyColumns = Seq("order"), groupbyColumns = Seq("groupby"))
      .transform(df)

  private def runSalted(df: DataFrame): DataFrame =
    new IntervalIdentifierSalted("marker", 1, Some(2),
      orderbyColumns = Seq("order"), groupbyColumns = Seq("groupby"),
      saltBuckets = 3, maxChunkRows = 1L).transform(df)

  test("golden case with killed mutants and repartition invariance") {
    val tc = new DataTestCase(spark) {
      // noise, start, noise, end, noise -> interval 1 on rows 1..3
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1, 1, 0, null), Seq(2, 1, 1, null), Seq(3, 1, 0, null),
          Seq(4, 1, 2, null), Seq(5, 1, 0, null)),
        Seq("order:i", "groupby:i", "marker:i", "iids:i"))
        .drop("iids")
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 0, 1),
          Seq(4, 1, 2, 1), Seq(5, 1, 0, 0)),
        Seq("order:i", "groupby:i", "marker:i", "iids:i"))
      override def mutants = Seq(
        ValueMutant("marker", 1, 0L),  // remove the start marker
        ValueMutant("marker", 3, 0L),  // remove the end marker
        ValueMutant("marker", 0, 2L),  // stray end before start
        RandomMutant(count = 1, seed = 3L, columns = Seq("marker")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(5))
    // same goldens + mutants through the salted formulation: every
    // load-bearing perturbation must change its output too
    tc.test(runSalted)
    tc.test(runSalted, repartition = Some(5))
  }

  test("a mutant touching only non-load-bearing cells survives (and raises)") {
    // project the echoed marker away so only semantic changes can kill
    def runProjected(df: DataFrame): DataFrame =
      run(df).select("order", "groupby", "iids")
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1, 1, 0), Seq(2, 1, 1), Seq(3, 1, 2)),
        Seq("order:i", "groupby:i", "marker:i"))
      def expected = PlainFrame.fromPlain(
        Seq(Seq(1, 1, 0), Seq(2, 1, 1), Seq(3, 1, 1)),
        Seq("order:i", "groupby:i", "iids:i"))
      // marker 0 -> 3: still noise, identical iids -> survives
      override def mutants = Seq(ValueMutant("marker", 0, 3L))
    }
    val e = intercept[AssertionError](tc.test(runProjected))
    assert(e.getMessage.contains("NOT killed"))
  }
}
