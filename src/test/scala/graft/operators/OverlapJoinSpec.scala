package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Properties of the binned interval-overlap join: exact agreement with
  * the naive overlap predicate (the spec), bin-width invariance,
  * exactly-once matches without any distinct pass, fail-loud guards and
  * no nested-loop plan. Value-level correctness at fixture scale is
  * pinned by the DuckDB oracle on `overlap_join`.
  */
class OverlapJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random interval sets over 3 keys; widths vary
  // from degenerate (lo == hi) to ~150 so pairs straddle bin borders
  private def lhs = (0 until 120).map { i =>
    val lo = (i * 48271L) % 900L
    (i.toLong % 3L, i.toLong, lo, lo + (i * 11L) % 120L)
  }.toDF("k", "lid", "l_lo", "l_hi")
  private def rhs = (0 until 80).map { i =>
    val lo = (i * 69621L) % 950L
    (i.toLong % 3L, 1000L + i, lo, lo + (i * 7L) % 150L)
  }.toDF("k", "rid", "r_lo", "r_hi")

  private def naive = lhs.as("l").join(rhs.as("r"),
      col("l.k") === col("r.k") && col("l.l_lo") <= col("r.r_hi") &&
        col("r.r_lo") <= col("l.l_hi"))
    .select(col("l.lid"), col("r.rid"))
    .as[(Long, Long)].collect().sorted.toSeq

  private def binned(w: Long) = RangeJoin.overlapJoin(lhs, rhs, Seq("k"),
      "l_lo", "l_hi", "r_lo", "r_hi", binWidth = w)
    .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq

  test("matches the naive overlap predicate exactly; exactly-once") {
    val expect = naive
    assert(expect.nonEmpty && expect.size == expect.distinct.size)
    assert(binned(64L) == expect)
  }

  test("bin width does not change the result") {
    val expect = naive
    for (w <- Seq(1L, 7L, 100L, 10000L)) assert(binned(w) == expect, s"w=$w")
  }

  test("inverted and too-wide intervals fail loudly") {
    val bad = Seq((0L, 1L, 50L, 40L)).toDF("k", "rid", "r_lo", "r_hi")
    val e = intercept[Exception] {
      RangeJoin.overlapJoin(lhs, bad, Seq("k"), "l_lo", "l_hi",
        "r_lo", "r_hi", 10L).collect()
    }
    assert(e.getMessage.contains("non-null required"), e.getMessage)
    val wide = Seq((0L, 1L, 0L, 1000000L)).toDF("k", "rid", "r_lo", "r_hi")
    val e2 = intercept[Exception] {
      RangeJoin.overlapJoin(lhs, wide, Seq("k"), "l_lo", "l_hi",
        "r_lo", "r_hi", 10L, maxBinsPerRange = 100L).collect()
    }
    assert(e2.getMessage.contains("maxBinsPerRange"), e2.getMessage)
  }

  test("shared non-key column names are rejected") {
    val clash = rhs.withColumnRenamed("r_lo", "l_lo")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(lhs, clash, Seq("k"), "l_lo", "l_hi",
        "l_lo", "r_hi", 10L)
    }
    assert(e.getMessage.contains("share non-key column"), e.getMessage)
  }

  test("reserved __oj_* working names are rejected, any case, either " +
    "side (round-9 ADVICE: withColumn would silently overwrite them)") {
    for (name <- Seq("__oj_bin", "__OJ_LLO_B", "__oj_guard")) {
      val e = intercept[IllegalArgumentException] {
        RangeJoin.overlapJoin(lhs.withColumn(name, lit(1L)), rhs,
          Seq("k"), "l_lo", "l_hi", "r_lo", "r_hi", 10L)
      }
      assert(e.getMessage.contains("reserved"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        RangeJoin.overlapJoin(lhs, rhs.withColumn(name, lit(1L)),
          Seq("k"), "l_lo", "l_hi", "r_lo", "r_hi", 10L)
      }
      assert(e2.getMessage.contains("reserved"), e2.getMessage)
    }
  }

  test("plans as an equi-join — never a nested loop / cartesian") {
    val plan = RangeJoin.overlapJoin(lhs, rhs, Seq("k"), "l_lo", "l_hi",
      "r_lo", "r_hi", 64L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
