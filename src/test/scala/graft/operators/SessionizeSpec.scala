package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("gap-based session ids per entity, ties broken deterministically") {
    val df = Seq(
      ("u1", 0L, 1L), ("u1", 5L, 2L), ("u1", 30L, 3L), ("u1", 32L, 4L),
      ("u2", 0L, 5L), ("u2", 100L, 6L))
      .toDF("user", "ts", "id")
    val out = Sessionize("ts", maxGap = 10L, Seq("user"), Seq("id"))
      .transform(df)
      .select("user", "id", "session_id")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("u1", 1L, 1L), ("u1", 2L, 1L),   // gap 5 <= 10
      ("u1", 3L, 2L), ("u1", 4L, 2L),   // gap 25 > 10 opens session 2
      ("u2", 5L, 1L), ("u2", 6L, 2L)))  // independent entity
  }

  test("no groupby: global window requires explicit opt-in") {
    val df = Seq((0L, 1L), (100L, 2L)).toDF("ts", "id")
    // the accidental single-task path is an error...
    val e = intercept[IllegalArgumentException](
      Sessionize("ts", 10L, Nil, Seq("id")).transform(df))
    assert(e.getMessage.contains("allowGlobalWindow"))
    // ...and the opted-in global sequence still works
    val out = Sessionize("ts", 10L, Nil, Seq("id"),
      allowGlobalWindow = true).transform(df)
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
    intercept[IllegalArgumentException](
      Sessionize("nope", 10L, Seq("id")).transform(df))
  }
}
