package graft.testing

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PlainFrame kit self-tests (reference:
  * tests/util/testing/test_plainframe.py — round-trips, validation,
  * equality semantics).
  */
class PlainFrameSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def full = PlainFrame.fromPlain(
    Seq(
      Seq(true, 1, 1.5, "a", Timestamp.valueOf("2020-01-01 00:00:00")),
      Seq(null, null, Double.NaN, null, null),
      Seq(false, 3, -2.0, "c", Timestamp.valueOf("2020-01-03 00:00:00"))),
    Seq("b:bool", "i:int", "f:float", "s:str", "d:datetime"))

  test("round-trip through Spark preserves values, nulls and NaN") {
    val back = PlainFrame.fromDF(full.toDF(spark))
    back.assertEqual(full)
    full.assertEqual(back)
  }

  test("typed annotations and explicit dtype lists agree") {
    val a = PlainFrame.fromPlain(Seq(Seq(1, "x")), Seq("n:i", "s:s"))
    val b = PlainFrame.fromPlain(Seq(Seq(1, "x")), Seq("n", "s"),
      Seq("int", "str"))
    a.assertEqual(b)
    intercept[IllegalArgumentException](
      PlainFrame.fromPlain(Seq(Seq(1)), Seq("untyped")))
    intercept[IllegalArgumentException](
      PlainFrame.fromPlain(Seq(Seq(1)), Seq("n:nope")))
  }

  test("assertEqual is row-order insensitive, column-order tolerant") {
    val a = PlainFrame.fromPlain(Seq(Seq(1, "x"), Seq(2, "y")),
      Seq("n:i", "s:s"))
    val shuffled = PlainFrame.fromPlain(Seq(Seq("y", 2), Seq("x", 1)),
      Seq("s:s", "n:i"))
    a.assertEqual(shuffled)
  }

  test("assertEqual catches value, dtype, shape and name mismatches") {
    val base = PlainFrame.fromPlain(Seq(Seq(1)), Seq("n:i"))
    intercept[AssertionError](base.assertEqual(
      PlainFrame.fromPlain(Seq(Seq(2)), Seq("n:i"))))
    intercept[AssertionError](base.assertEqual(
      PlainFrame.fromPlain(Seq(Seq(1.0)), Seq("n:f"))))
    intercept[AssertionError](base.assertEqual(
      PlainFrame.fromPlain(Seq(Seq(1), Seq(2)), Seq("n:i"))))
    intercept[AssertionError](base.assertEqual(
      PlainFrame.fromPlain(Seq(Seq(1)), Seq("m:i"))))
  }

  test("NULL and NaN are distinct float values") {
    val withNull = PlainFrame.fromPlain(Seq(Seq(null)), Seq("f:f"))
    val withNaN = PlainFrame.fromPlain(Seq(Seq(Double.NaN)), Seq("f:f"))
    intercept[AssertionError](withNull.assertEqual(withNaN))
    withNaN.assertEqual(withNaN) // NaN == NaN for comparison purposes
  }

  test("value normalization: int upcasts, wrong dtypes rejected") {
    val pf = PlainFrame.fromPlain(Seq(Seq(1, 2)), Seq("a:f", "b:i"))
    assert(pf.column("a").values == Vector(1.0)) // int -> float upcast
    assert(pf.column("b").values == Vector(2L))
    intercept[IllegalArgumentException](
      PlainFrame.fromPlain(Seq(Seq("str")), Seq("n:i")))
  }

  test("select / drop / withValue") {
    val pf = full.select("i", "s")
    assert(pf.columnNames == Vector("i", "s"))
    assert(full.drop("b", "d").columnNames == Vector("i", "f", "s"))
    val mutated = full.withValue("s", 0, "changed")
    assert(mutated.column("s").values(0) == "changed")
    intercept[AssertionError](mutated.assertEqual(full))
  }

  test("duplicate names and ragged columns rejected") {
    intercept[IllegalArgumentException](PlainFrame(Vector(
      PlainColumn("x", PFType.Int, Vector(1L)),
      PlainColumn("x", PFType.Int, Vector(2L)))))
    intercept[IllegalArgumentException](PlainFrame(Vector(
      PlainColumn("a", PFType.Int, Vector(1L)),
      PlainColumn("b", PFType.Int, Vector(1L, 2L)))))
  }
}
