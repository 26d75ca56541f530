package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The single-pass (mapPartitions) interval identifier must match the
  * window-algebra implementation bit-for-bit on random inputs, across all
  * span configs and result types.
  */
class SinglePassSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val markerGen: Gen[String] =
    Gen.frequency(3 -> Gen.const("s"), 3 -> Gen.const("e"),
      3 -> Gen.const("x"), 1 -> Gen.const(null: String))

  private val groupsGen: Gen[List[List[String]]] =
    Gen.choose(1, 4).flatMap(g =>
      Gen.listOfN(g, Gen.choose(0, 30).flatMap(Gen.listOfN(_, markerGen))))

  private val schema = StructType(Seq(
    StructField("g", IntegerType), StructField("o", IntegerType),
    StructField("marker", StringType)))

  private def df(groups: List[List[String]]) = {
    val rows = for ((ms, g) <- groups.zipWithIndex; (m, o) <- ms.zipWithIndex)
      yield Row(g, o, m)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  private def collect(d: org.apache.spark.sql.DataFrame): Map[(Int, Int), Int] =
    d.collect().map(r =>
      (r.getInt(0), r.getInt(1)) -> r.getAs[Number]("iids").intValue).toMap

  for {
    rt <- Seq(ResultType.Raw, ResultType.Valid, ResultType.Enumerated)
    (su, eu) <- Seq((false, true), (true, true), (false, false), (true, false))
  } test(s"single-pass == window impl for $rt su=$su eu=$eu") {
    (1 to 12).foreach { i =>
      groupsGen(Gen.Parameters.default, Seed(i.toLong)).foreach { groups =>
        val in = df(groups)
        val window = new IntervalIdentifier("marker", "s", Some("e"), su, eu,
          Seq("o"), Seq("g"), resultType = rt)
        val onepass = new IntervalIdentifierSinglePass("marker", "s",
          Some("e"), su, eu, Seq("o"), Seq("g"), resultType = rt)
        assert(collect(onepass.transform(in)) == collect(window.transform(in)),
          s"seed $i groups $groups")
      }
    }
  }

  test("single-pass identical-marker path matches window impl") {
    (1 to 8).foreach { i =>
      groupsGen(Gen.Parameters.default, Seed(100L + i)).foreach { groups =>
        val in = df(groups)
        val window = new IntervalIdentifier("marker", "s", None,
          orderbyColumns = Seq("o"), groupbyColumns = Seq("g"))
        val onepass = new IntervalIdentifierSinglePass("marker", "s", None,
          orderbyColumns = Seq("o"), groupbyColumns = Seq("g"))
        assert(collect(onepass.transform(in)) == collect(window.transform(in)))
      }
    }
  }

  test("single-pass descending order matches window impl") {
    groupsGen(Gen.Parameters.default, Seed(999L)).foreach { groups =>
      val in = df(groups)
      val window = new IntervalIdentifier("marker", "s", Some("e"),
        orderbyColumns = Seq("o"), groupbyColumns = Seq("g"),
        ascending = Seq(false))
      val onepass = new IntervalIdentifierSinglePass("marker", "s", Some("e"),
        orderbyColumns = Seq("o"), groupbyColumns = Seq("g"),
        ascending = Seq(false))
      assert(collect(onepass.transform(in)) == collect(window.transform(in)))
    }
  }
}
