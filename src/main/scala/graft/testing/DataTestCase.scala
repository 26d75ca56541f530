package graft.testing

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Golden input/output test case executed against a Spark transformation,
  * with mutation testing and partitioning-invariance hooks
  * (reference: src/pywrangler/util/testing/datatestcase.py:25-311).
  *
  * Contract:
  *   - `input` and `expected` are literal [[PlainFrame]]s;
  *   - `test(func)` asserts func(input) == expected (row-order
  *     insensitive, dtype-checked);
  *   - every declared mutant must change the output ("be killed") or the
  *     case errors — guarding against vacuously-passing goldens;
  *   - `repartition` reruns the same assertion over an n-way repartition
  *     of the input, pinning shuffle invariance
  *     (reference: datatestcase.py:219-222).
  */
abstract class DataTestCase(spark: SparkSession) {

  def input: PlainFrame
  def expected: PlainFrame
  def mutants: Seq[Mutant] = Seq.empty

  /** Assert the transformation reproduces the golden output. */
  def test(func: DataFrame => DataFrame, repartition: Option[Int] = None): Unit = {
    val df0 = input.toDF(spark)
    val df = repartition.map(df0.repartition(_)).getOrElse(df0)
    PlainFrame.fromDF(func(df)).assertEqual(expected)
    assertMutantsKilled(func)
  }

  /** Every mutant must make the assertion fail (reference:
    * datatestcase.py:281-311 generic_assert_mutants).
    */
  private def assertMutantsKilled(func: DataFrame => DataFrame): Unit =
    mutants.foreach { m =>
      val mutated = m.mutate(input)
      val survived =
        try {
          PlainFrame.fromDF(func(mutated.toDF(spark))).assertEqual(expected)
          true // assertion passed => mutant survived => bad
        } catch {
          case _: AssertionError => false
          case _: Exception => false // mutant broke the op entirely: killed
        }
      if (survived) throw new AssertionError(
        s"Mutant NOT killed: $m — the test does not constrain these cells")
    }
}
