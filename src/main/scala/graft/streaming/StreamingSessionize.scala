package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization via Spark's native
  * `session_window`: events within `gap` of each other merge into one
  * session per key; a session closes (and emits, in append mode) once the
  * watermark passes its end.
  *
  * This is the streaming counterpart of the batch
  * [[graft.operators.Sessionize]]: batch enumerates session ids row-wise;
  * the stream emits one aggregate row per closed session (start, end,
  * event count) — the shape downstream feature pipelines consume. Session
  * state is Spark-managed (merging windows in the state store), so the
  * operator inherits exactly-once recovery and watermark eviction for
  * free rather than hand-rolling them in flatMapGroupsWithState.
  */
final class StreamingSessionize(gap: String,
                                keyColumn: String = "groupKey",
                                tsColumn: String = "ts") {

  /** `df` must be a streaming DataFrame with an event-time watermark on
    * `tsColumn`. Returns one row per closed session:
    * (key, session_start, session_end, n_events).
    */
  def transform(df: DataFrame): DataFrame =
    df.groupBy(col(keyColumn), session_window(col(tsColumn), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyColumn),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
