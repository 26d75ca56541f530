package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.testing._

/** PercentileRank: golden+mutation protocol, a brute-force randomized
  * cross-check (tie-heavy), bucket-count invariance, and the
  * no-whole-group-window plan pin. Value-level correctness at fixture
  * scale is pinned by the DuckDB oracle on `pct_rank`.
  */
class RankSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pct_rank golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      PercentileRank(Seq("g"), "v", idColumn = "id").transform(df)
        .select("id", "g", "v", "value_rank", "pct_rank")
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq("a", 1L, 10L), Seq("a", 2L, 20L), Seq("a", 3L, 20L),
          Seq("a", 4L, 30L),
          Seq("b", 5L, 5L), Seq("b", 6L, 5L)),
        Seq("g:s", "id:i", "v:i"))
      // a: ranks 1, 3, 3 (ties share), 4; b: both 2/2
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq[Any](1L, "a", 10L, 1L, 0.25),
          Seq[Any](2L, "a", 20L, 3L, 0.75),
          Seq[Any](3L, "a", 20L, 3L, 0.75),
          Seq[Any](4L, "a", 30L, 4L, 1.0),
          Seq[Any](5L, "b", 5L, 2L, 1.0),
          Seq[Any](6L, "b", 5L, 2L, 1.0)),
        Seq("id:i", "g:s", "v:i", "value_rank:i", "pct_rank:f"))
      override def mutants = Seq(
        ValueMutant("v", 0, 100L), // id1 jumps the group: every rank moves
        ValueMutant("g", 3, "b"),  // group move changes BOTH groups' n
        ValueMutant("v", 4, 6L))   // b's tie breaks: ranks 1 and 2
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("matches the brute force on random tie-heavy values; " +
    "valueBuckets never changes the result") {
    val rnd = new Random(424242L)
    for (round <- 1 to 8) {
      val rows = (0L until 120L).map { i =>
        (i, s"g${rnd.nextInt(3)}", rnd.nextInt(12).toLong)
      }
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val vs = rs.map(_._3)
        rs.map { case (id, _, v) =>
          id -> (vs.count(_ <= v).toLong,
            BigDecimal(vs.count(_ <= v).toDouble / vs.size)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      val df = rows.toDF("id", "g", "v")
      for (vb <- Seq(1, 7, 256)) {
        val got = PercentileRank(Seq("g"), "v", idColumn = "id",
            valueBuckets = vb).transform(df)
          .select("id", "value_rank", "pct_rank")
          .as[(Long, Long, Double)].collect()
        assert(got.length == rows.size, s"round $round vb=$vb")
        got.foreach { case (id, r, p) =>
          val (wr, wp) = want(id)
          assert(r == wr && math.abs(p - wp) < 1e-9,
            s"round $round vb=$vb id $id: got ($r,$p) want ($wr,$wp)")
        }
      }
    }
  }

  test("plan: every rank window is (group, bucket)-partitioned; " +
    "offsets broadcast") {
    val d = (0L until 80L).map(i => (i, s"g${i % 2}", (i * 17L) % 97L))
      .toDF("id", "g", "v")
    val out = PercentileRank(Seq("g"), "v", idColumn = "id").transform(d)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the equi-depth bucket id must come from the codegen'd
    // binary-search expression, not a nested-when tree (which blows
    // HotSpot's huge-method JIT threshold at 256 buckets). The plan
    // STRING truncates long expressions and a LocalRelation input gets
    // constant-folded by ConvertToLocalRelation, so: non-local input,
    // walk the expression trees
    val ranged = spark.range(80)
      .select(col("id"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("g"),
          org.apache.spark.sql.functions.pmod(col("id"),
            org.apache.spark.sql.functions.lit(2L))).as("g"),
        (col("id") * 17L % 97L).as("v"))
    val rangedOut = PercentileRank(Seq("g"), "v", idColumn = "id")
      .transform(ranged)
    val hasBucketSearch = rangedOut.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.graftshim.BucketSearch]))
    assert(hasBucketSearch, "no BucketSearch expression in the plan")
    plan.linesIterator.filter(_.contains("windowspecdefinition"))
      .filter(_.contains("value_rank"))
      .foreach(l => assert(l.contains("__b"), l))
  }
}
