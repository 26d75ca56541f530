package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.testing._

class SessionizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("session_stats golden: killed mutants + repartition invariance") {
    def run(df: org.apache.spark.sql.DataFrame) =
      SessionStats("ts", maxGap = 10L, Seq("user"), Seq("id"))
        .transform(df)
        .select("user", "session_id", "n_events", "session_start",
          "session_end", "duration")
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq("u1", 0L, 1L), Seq("u1", 5L, 2L), Seq("u1", 30L, 3L),
          Seq("u2", 0L, 4L)),
        Seq("user:s", "ts:i", "id:i"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq[Any]("u1", 1L, 2L, 0L, 5L, 5L),
          Seq[Any]("u1", 2L, 1L, 30L, 30L, 0L),
          Seq[Any]("u2", 1L, 1L, 0L, 0L, 0L)),
        Seq("user:s", "session_id:i", "n_events:i", "session_start:i",
          "session_end:i", "duration:i"))
      override def mutants = Seq(
        // ts 5 -> 20: the gap to 0 exceeds maxGap, u1 splits into 3
        // sessions and every rollup row changes
        ValueMutant("ts", 1, 20L),
        // ts 30 -> 12: u1 collapses into ONE session
        ValueMutant("ts", 2, 12L),
        // entity move: both users' rollups change
        ValueMutant("user", 3, "u1"))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("timestamp tsColumn: gaps and duration in MICROSECONDS as longs, " +
    "not a silent DayTimeInterval schema change") {
    import java.sql.Timestamp
    val df = Seq(
      ("u1", Timestamp.valueOf("2026-01-01 00:00:00"), 1L),
      ("u1", Timestamp.valueOf("2026-01-01 00:00:05"), 2L),   // gap 5 s
      ("u1", Timestamp.valueOf("2026-01-01 00:01:00"), 3L))   // gap 55 s
      .toDF("user", "ts", "id")
    // maxGap 10 s in MICROS: the 55 s gap opens session 2
    val out = SessionStats("ts", maxGap = 10L * 1000000L,
        Seq("user"), Seq("id"))
      .transform(df).orderBy("session_id")
    val schema = out.schema("duration").dataType
    assert(schema == org.apache.spark.sql.types.LongType, schema)
    val rows = out.select("session_id", "n_events", "duration")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 2L, 5000000L), (2L, 1L, 0L)))
    // session_start/end keep the native timestamp type
    assert(out.schema("session_start").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("non-temporal tsColumn fails loud up front (strings would " +
    "subtract as implicit doubles)") {
    val df = Seq(("u1", "2026-01-01", 1L)).toDF("user", "ts", "id")
    val e = intercept[IllegalArgumentException] {
      SessionStats("ts", maxGap = 10L, Seq("user"), Seq("id")).transform(df)
    }
    assert(e.getMessage.contains("timestamp"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Sessionize("ts", maxGap = 10L, Seq("user"), Seq("id")).transform(df)
    }
    assert(e2.getMessage.contains("timestamp"), e2.getMessage)
  }

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

  test("session_stats: per-session rollup matches the hand computation; " +
    "reserved output columns rejected") {
    val df = Seq(
      ("u1", 0L, 1L), ("u1", 5L, 2L), ("u1", 30L, 3L), ("u1", 32L, 4L),
      ("u2", 0L, 5L), ("u2", 100L, 6L))
      .toDF("user", "ts", "id")
    val out = SessionStats("ts", maxGap = 10L, Seq("user"), Seq("id"))
      .transform(df)
      .select("user", "session_id", "n_events", "session_start",
        "session_end", "duration")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("u1", 1L, 2L, 0L, 5L, 5L),
      ("u1", 2L, 2L, 30L, 32L, 2L),
      ("u2", 1L, 1L, 0L, 0L, 0L),
      ("u2", 2L, 1L, 100L, 100L, 0L)), out)
    val bad = df.withColumnRenamed("id", "n_events")
    val e = intercept[IllegalArgumentException](
      SessionStats("ts", 10L, Seq("user")).transform(bad))
    assert(e.getMessage.contains("n_events"), e.getMessage)
  }

  test("session_stats plan: the rollup reuses the session window's " +
    "entity partitioning — exactly ONE keyed exchange") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(60)
      .select((col("id") % 5L).as("user"), col("id").as("ts"),
        col("id").as("id"))
    val plan = SessionStats("ts", 10L, Seq("user"), Seq("id"))
      .transform(df).queryExecution.executedPlan.toString
    val n = "Exchange (hash|range)partitioning".r.findAllIn(plan).size
    assert(n == 1, plan)
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
