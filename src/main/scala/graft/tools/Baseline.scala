package graft.tools

import org.apache.spark.sql.SparkSession

import graft.benchmark.SparkTimeProfiler
import graft.operators._

/** Records the BASELINE.md protocol: median of >= 5 warm runs per
  * interval-identifier variant on the sf0.1 events table, cached input,
  * local[32] (reference protocol: src/pywrangler/benchmark.py:428-531 +
  * pyspark/benchmark.py:21-75).
  */
object Baseline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = spark.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")

    val variants: Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "generic LSFE" -> (df => new IntervalIdentifier("event_type", "signup",
        Some("purchase"), orderbyColumns = Seq("event_id"),
        groupbyColumns = Seq("user_id")).transform(df)),
      "generic FSFE" -> (df => new IntervalIdentifier("event_type", "signup",
        Some("purchase"), markerStartUseFirst = true,
        orderbyColumns = Seq("event_id"),
        groupbyColumns = Seq("user_id")).transform(df)),
      "adjusted FSFE" -> (df => new IntervalIdentifierAdjusted("event_type",
        "signup", Some("purchase"), markerStartUseFirst = true,
        orderbyColumns = Seq("event_id"),
        groupbyColumns = Seq("user_id")).transform(df)),
      "generic LSLE" -> (df => new IntervalIdentifier("event_type", "signup",
        Some("purchase"), markerEndUseFirst = false,
        orderbyColumns = Seq("event_id"),
        groupbyColumns = Seq("user_id")).transform(df)),
      "adjusted LSLE" -> (df => new IntervalIdentifierAdjusted("event_type",
        "signup", Some("purchase"), markerEndUseFirst = false,
        orderbyColumns = Seq("event_id"),
        groupbyColumns = Seq("user_id")).transform(df)),
      "single-pass LSFE" -> (df => new IntervalIdentifierSinglePass(
        "event_type", "signup", Some("purchase"),
        orderbyColumns = Seq("event_id"),
        groupbyColumns = Seq("user_id")).transform(df)),
    )
    val profiler = new SparkTimeProfiler(reps = 5, warmups = 1,
      cacheInput = true)
    variants.foreach { case (name, op) =>
      val p = profiler.profile(events)(op)
      println(f"[baseline] $name%-18s $p")
    }
    spark.stop()
  }
}
