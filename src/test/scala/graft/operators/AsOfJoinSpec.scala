package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L), (2L, 5L), (3L, 7L))
    .toDF("k", "t")
  private def right = Seq(
    (1L, 10L, Some(1.5)), (1L, 25L, Some(2.5)), (2L, 6L, Some(9.0)),
    (3L, 3L, None))
    .toDF("k", "rt", "v")

  test("matches the greatest right time <= left time per key") {
    val got = AsOfJoin.join(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, 10L, Some(10L), Some(1.5)), // tie: rt == t matches (>=)
      (1L, 20L, Some(10L), Some(1.5)),
      (1L, 30L, Some(25L), Some(2.5)),
      (2L, 5L, None, None),            // right row is later — no match
      (3L, 7L, Some(3L), None)))       // matched row's NULL payload stays
  }

  test("NULL right times never match") {
    val r = Seq((1L, Option.empty[Long], Some(99.0)),
      (1L, Some(5L), Some(1.0))).toDF("k", "rt", "v")
    val got = AsOfJoin.join(left.filter($"k" === 1), r, Seq("k"), "t", "rt",
      Seq("v")).orderBy("t").collect()
    assert(got.forall(_.getAs[Double]("asof_v") == 1.0))
  }

  test("column naming and extra left columns survive") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val got = AsOfJoin.join(l, right, Seq("k"), "t", "rt", Seq("v"))
    assert(got.columns.toSeq == Seq("k", "t", "tag", "asof_rt", "asof_v"))
    val row = got.collect().head
    assert(row.getString(2) == "a" && row.getLong(3) == 10L)
  }

  test("wrangler wrapper splits one frame into both sides") {
    val ev = Seq((1L, 1L, "click", 0.0), (1L, 2L, "purchase", 5.0),
      (1L, 3L, "click", 0.0)).toDF("k", "t", "typ", "v")
    val got = AsOfJoin.AsOfJoinOp(
      _.filter($"typ" === "click").select("k", "t"),
      _.filter($"typ" === "purchase").select("k", "t", "v"),
      Seq("k"), "t", "t", Seq("v"))
      .transform(ev).orderBy("t").collect()
    assert(Option(got(0).get(2)).isEmpty)
    assert(got(1).getLong(2) == 2L && got(1).getDouble(3) == 5.0)
  }
}
