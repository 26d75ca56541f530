package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.testing._

/** The ordered-funnel operator: golden+mutation protocol (step-order
  * semantics, same-instant ties, partial funnels) plus the one-shuffle
  * plan pin. Value-level correctness at fixture scale is pinned by the
  * DuckDB oracle on `funnel_steps`.
  */
class FunnelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def run(df: DataFrame): DataFrame =
    Funnel(Seq("signup", "view", "purchase"), typeColumn = "event_type",
      tsColumn = "ts", keyColumns = Seq("user_id")).transform(df)

  test("funnel golden: killed mutants + repartition invariance") {
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 10L, "signup"),
          Seq(1L, 5L, "view"),      // BEFORE the signup: must not count
          Seq(1L, 20L, "view"),
          Seq(1L, 15L, "purchase"), // before the counted view: ignored
          Seq(1L, 30L, "purchase"),
          Seq(2L, 10L, "signup"),
          Seq(2L, 5L, "purchase"),
          Seq(2L, 4L, "view"),      // both before signup: funnel stops at 1
          Seq(3L, 1L, "view"),      // no signup at all: 0 steps
          Seq(3L, 2L, "purchase"),
          Seq(4L, 10L, "signup"),   // same-instant chain: ties count
          Seq(4L, 10L, "view"),
          Seq(4L, 10L, "purchase")),
        Seq("user_id:i", "ts:i", "event_type:s"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq[Any](1L, 10L, 20L, 30L, 3L),
          Seq[Any](2L, 10L, null, null, 1L),
          Seq[Any](3L, null, null, null, 0L),
          Seq[Any](4L, 10L, 10L, 10L, 3L)),
        Seq("user_id:i", "t_signup:i", "t_view:i", "t_purchase:i",
          "steps_completed:i"))
      override def mutants = Seq(
        // u1's counted view slides past its purchase: funnel stops at 2
        ValueMutant("ts", 2, 40L),
        // u2's early view moves after the signup: funnel reaches 2
        ValueMutant("ts", 7, 14L),
        // u3 gains a signup: funnel starts
        ValueMutant("event_type", 8, "signup"))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("one keyed shuffle for the whole window chain + agg") {
    import spark.implicits._
    val ev = (0 until 60).map { i =>
      (i.toLong % 5L, i.toLong, Seq("signup", "view", "purchase",
        "click")(i % 4))
    }.toDF("user_id", "ts", "event_type")
    val plan = run(ev).queryExecution.executedPlan.toString
    val n = "Exchange (hash|range)partitioning".r.findAllIn(plan).size
    assert(n == 1, plan)
  }

  test("funnel_report: per-step reach + conversion from the previous " +
    "step; empty-previous steps report null, not a division error") {
    import spark.implicits._
    // users: 1 completes all 3; 2 stops after signup; 3 never signs up
    val ev = Seq(
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "purchase"),
      (2L, 10L, "signup"), (2L, 5L, "view"),
      (3L, 1L, "view")).toDF("user_id", "ts", "event_type")
    val got = FunnelReport(Seq("signup", "view", "purchase"))
      .transform(ev).orderBy("step_index")
      .as[(Long, String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, "signup", 2L, Some(2.0 / 3)),     // rounded below
      (2L, "view", 1L, Some(0.5)),
      (3L, "purchase", 1L, Some(1.0))).map {
        case (i, s, n, c) =>
          (i, s, n, c.map(x => BigDecimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }, got)
    // nobody produces any event of the first step: step 2's previous
    // count is 0 -> conversion null (never a divide-by-zero)
    val none = Seq((1L, 1L, "click")).toDF("user_id", "ts", "event_type")
    val empty = FunnelReport(Seq("signup", "view", "purchase"))
      .transform(none).orderBy("step_index")
      .as[(Long, String, Long, Option[Double])].collect().toSeq
    assert(empty == Seq((1L, "signup", 0L, Some(0.0)),
      (2L, "view", 0L, None), (3L, "purchase", 0L, None)), empty)
    // a fully empty input: zero reached (NOT null — sum() over an
    // empty frame is null and must be coalesced like the oracle's
    // COUNT), conversion null throughout
    val zero = Seq.empty[(Long, Long, String)]
      .toDF("user_id", "ts", "event_type")
    val z = FunnelReport(Seq("signup", "view", "purchase"))
      .transform(zero).orderBy("step_index")
      .as[(Long, String, Long, Option[Double])].collect().toSeq
    assert(z == Seq((1L, "signup", 0L, None), (2L, "view", 0L, None),
      (3L, "purchase", 0L, None)), z)
  }

  test("funnel_report: still exactly one keyed shuffle (the 1-row " +
    "pivot adds only the global-aggregate exchange)") {
    import spark.implicits._
    val ev = (0 until 60).map { i =>
      (i.toLong % 5L, i.toLong, Seq("signup", "view", "purchase",
        "click")(i % 4))
    }.toDF("user_id", "ts", "event_type")
    val plan = FunnelReport(Seq("signup", "view", "purchase"))
      .transform(ev).queryExecution.executedPlan.toString
    val keyed = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).size
    assert(keyed == 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("step guards: short, duplicate and colliding funnels rejected") {
    intercept[IllegalArgumentException](Funnel(Seq("signup")))
    intercept[IllegalArgumentException](
      Funnel(Seq("signup", "signup")))
    import spark.implicits._
    val bad = Seq((1L, 1L, "signup", 0L))
      .toDF("user_id", "ts", "event_type", "t_view")
    val e = intercept[IllegalArgumentException](
      run(bad.drop("t_view").withColumn("t_view",
        org.apache.spark.sql.functions.lit(0L))))
    assert(e.getMessage.contains("t_view"), e.getMessage)
  }
}
