package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ArrayOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("longArrayDot: values, null propagation, unequal lengths") {
    val df = Seq(
      (1L, Array(1L, 2L, 3L), Array(4L, 5L, 6L)),   // 4+10+18 = 32
      (2L, Array(-2L, 7L), Array(3L, -1L)),          // -6-7 = -13
      (3L, Array.empty[Long], Array(1L, 2L)),        // empty -> 0
      (4L, Array(1L, 2L, 3L), Array(10L, 10L)))      // shorter bounds: 30
      .toDF("id", "a", "b")
    val got = df.select($"id", ArrayOps.longArrayDot($"a", $"b").as("d"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 32L, 2L -> -13L, 3L -> 0L, 4L -> 30L))

    val withNull = Seq((Some(Array(1L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
      .select(ArrayOps.longArrayDot($"a", $"b").as("d"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("longArrayDot: casts int arrays via ExpectsInputTypes") {
    val got = Seq((Array(2, 3), Array(4, 5))).toDF("a", "b")
      .select(ArrayOps.longArrayDot($"a", $"b").as("d"))
      .as[Long].head()
    assert(got == 23L)
  }

  test("longArrayDot interpreted eval matches codegen result") {
    // force the interpreted path via eval() on the raw expression
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftshim.LongArrayDot
    val e = LongArrayDot(
      Literal.create(Seq(1L, 2L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)),
      Literal.create(Seq(3L, 4L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 11L)
  }
}
