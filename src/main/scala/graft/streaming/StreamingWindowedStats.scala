package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling/sliding-window aggregation — the canonical
  * `readStream → window agg → writeStream` shape: per key and event-time
  * window, emit event count, value sum and value max once the watermark
  * passes the window end (append mode).
  *
  * This is the monitoring/throughput-stats primitive of a streaming
  * ingest pipeline (docs/sec per source, bytes per window, quality-score
  * extremes). State is one aggregate row per open (key, window) pair in
  * the state store — bounded by key cardinality × windows inside the
  * watermark horizon, independent of event volume; eviction is
  * watermark-driven and Spark-managed (no hand-rolled
  * flatMapGroupsWithState state, exactly-once under recovery for free).
  *
  * `slide` defaults to `duration` (tumbling). A sliding window emits one
  * row per overlapping window; each event contributes to
  * `duration / slide` windows.
  */
final class StreamingWindowedStats(duration: String,
                                   slide: Option[String] = None,
                                   keyColumn: String = "groupKey",
                                   tsColumn: String = "ts",
                                   valueColumn: String = "order") {

  /** `df` must be a streaming DataFrame with an event-time watermark on
    * `tsColumn`. Returns (key, window_start, window_end, n_events,
    * sum_value, max_value) per closed window.
    */
  def transform(df: DataFrame): DataFrame = {
    graft.util.SparkUtil.validateColumns(df,
      Seq(keyColumn, tsColumn, valueColumn))
    // misuse otherwise surfaces only as a late AnalysisException at
    // writeStream.start in append mode (round-5 ADVICE)
    require(df.isStreaming,
      "StreamingWindowedStats.transform needs a streaming DataFrame " +
        s"(with a watermark on `$tsColumn`); got a batch frame")
    val w = slide.fold(window(col(tsColumn), duration))(
      s => window(col(tsColumn), duration, s))
    df.groupBy(col(keyColumn), w)
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueColumn)).as("sum_value"),
        max(col(valueColumn)).as("max_value"))
      .select(col(keyColumn),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"), col("sum_value"), col("max_value"))
  }
}
