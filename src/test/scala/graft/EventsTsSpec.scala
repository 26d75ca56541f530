package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events-loader's timestamp-unit adaptivity (round-8
  * correctness regression): the driver's generator switched events.ts
  * from INT64 TIMESTAMP(NANOS) to TIMESTAMP(MICROS), and the old forced
  * `ts LONG` read silently delivered MICROsecond values where the
  * sessionize gap threshold (and DuckDB's `epoch_ns` oracle) expect
  * NANOseconds — every gap compared 1000x too small, so sessions never
  * split. `SparkEntry.events` now learns the unit from the parquet
  * footer and normalizes to epoch-ns LongType in either world.
  */
class EventsTsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def writeMicrosFixture(): String = {
    val dir = Files.createTempDirectory("graft-events-us").toString
    // gaps: u1 has a 2000 s gap (> the 1000 s session threshold below)
    // between events 2 and 3; u2 stays within it
    val rows = Seq(
      (1L, Timestamp.from(java.time.Instant.ofEpochSecond(1000)), 10L,
        "click", 1.0, "{}"),
      (2L, Timestamp.from(java.time.Instant.ofEpochSecond(1500)), 10L,
        "click", 1.0, "{}"),
      (3L, Timestamp.from(java.time.Instant.ofEpochSecond(3500)), 10L,
        "click", 1.0, "{}"),
      (4L, Timestamp.from(java.time.Instant.ofEpochSecond(1000)), 20L,
        "click", 1.0, "{}"),
      (5L, Timestamp.from(java.time.Instant.ofEpochSecond(1900)), 20L,
        "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // the driver's generator (pyarrow) writes INT64 TIMESTAMP(MICROS);
    // Spark's own default is legacy INT96, which would not reproduce it
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "TIMESTAMP_MICROS")
      rows.coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
    } finally spark.conf.set(key, prev)
    dir
  }

  test("micros-unit parquet is normalized to epoch nanos") {
    val dir = writeMicrosFixture()
    val ev = SparkEntry.events(spark, dir)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    val ts = ev.orderBy("event_id").select("ts").as[Long].collect()
    assert(ts.head == 1000L * 1000000000L,
      s"expected epoch-ns, got ${ts.head}")
  }

  test("sessionize splits on a ns-unit gap over a micros-unit file") {
    val dir = writeMicrosFixture()
    val sessions = graft.operators.Sessionize(
      "ts", 1000L * 1000000000L, Seq("user_id"), Seq("event_id"))
      .transform(SparkEntry.events(spark, dir))
      .select($"user_id", $"event_id", $"session_id".as[Long])
      .orderBy("user_id", "event_id")
      .collect()
    val byUser = sessions.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSeq).toMap
    assert(byUser(10L) == Seq(1L, 1L, 2L),
      s"u10 must split at the 2000s gap: ${byUser(10L)}")
    assert(byUser(20L) == Seq(1L, 1L),
      s"u20 must stay one session: ${byUser(20L)}")
  }
}
