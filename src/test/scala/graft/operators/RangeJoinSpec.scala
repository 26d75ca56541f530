package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Properties of the binned range join: exact agreement with the naive
  * range predicate (the spec), bin-width invariance, no duplicate
  * matches, no nested-loop plan, and the fail-loud guards. Value-level
  * correctness at fixture scale is pinned by the DuckDB oracle on
  * `range_join`.
  */
class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random points and ranges over 3 keys
  private def points = (0 until 200).map { i =>
    (i.toLong % 3L, i.toLong, (i * 48271L) % 1000L)
  }.toDF("k", "pid", "t")
  private def ranges = (0 until 40).map { i =>
    val lo = (i * 69621L) % 900L
    (i.toLong % 3L, 1000L + i, lo, lo + (i * 7L) % 150L)
  }.toDF("k", "rid", "lo", "hi")

  private def naive = points.as("p").join(ranges.as("r"),
      col("p.k") === col("r.k") && col("p.t") >= col("r.lo") &&
        col("p.t") <= col("r.hi"))
    .select(col("p.pid"), col("r.rid"))
    .as[(Long, Long)].collect().sorted.toSeq

  private def binned(w: Long) = RangeJoin.join(points, ranges, Seq("k"),
      "t", "lo", "hi", binWidth = w, rangePayload = Seq("rid"))
    .select("pid", "rid").as[(Long, Long)].collect().sorted.toSeq

  test("matches the naive range predicate exactly; no duplicates") {
    val expect = naive
    assert(expect.nonEmpty && expect.size == expect.distinct.size)
    assert(binned(64L) == expect)
  }

  test("bin width does not change the result") {
    val expect = naive
    for (w <- Seq(1L, 7L, 100L, 10000L)) assert(binned(w) == expect, s"w=$w")
  }

  test("inverted and too-wide ranges fail loudly") {
    val bad = Seq((0L, 1L, 50L, 40L)).toDF("k", "rid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.join(points, bad, Seq("k"), "t", "lo", "hi", 10L).collect()
    }
    assert(e.getMessage.contains("non-null required"), e.getMessage)
    val wide = Seq((0L, 1L, 0L, 1000000L)).toDF("k", "rid", "lo", "hi")
    val e2 = intercept[Exception] {
      RangeJoin.join(points, wide, Seq("k"), "t", "lo", "hi", 10L,
        maxBinsPerRange = 100L).collect()
    }
    assert(e2.getMessage.contains("maxBinsPerRange"), e2.getMessage)
  }

  test("plans as an equi-join — never a nested loop / cartesian") {
    val plan = RangeJoin.join(points, ranges, Seq("k"), "t", "lo", "hi",
      64L, Seq("rid")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
