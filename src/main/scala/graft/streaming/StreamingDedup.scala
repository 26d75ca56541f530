package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication by content fingerprint — the streaming
  * counterpart of [[graft.operators.Dedup.ExactDedup]]: the first
  * document with a given whitespace-normalized md5 fingerprint passes,
  * later copies are dropped.
  *
  * Scale design: `dropDuplicatesWithinWatermark` keeps one state-store
  * entry per fingerprint only until the event-time watermark passes it,
  * so state is bounded by (ingest rate x watermark horizon) instead of
  * growing with the whole corpus — the difference between a dedup
  * stream that runs for months and one that OOMs its state store. The
  * trade is windowed semantics: a duplicate arriving after its
  * fingerprint's state is evicted passes again (downstream batch dedup
  * catches cross-horizon copies). `bounded = false` opts into global
  * `dropDuplicates` state for short-lived backfills.
  */
final class StreamingDedup(textColumn: String = "text",
                           bounded: Boolean = true) {

  /** `df` must be a streaming DataFrame; with `bounded = true` it must
    * carry an event-time watermark. Passes rows through with the
    * `content_fp` fingerprint column appended.
    */
  def transform(df: DataFrame): DataFrame = {
    require(!df.columns.exists(_.equalsIgnoreCase("content_fp")),
      "Output column `content_fp` already exists in the input; rename it " +
        "first (matching the batch ExactDedup contract)")
    val norm = regexp_replace(trim(lower(col(textColumn))), "\\s+", " ")
    val keyed = df.withColumn("content_fp", md5(norm))
    if (bounded) keyed.dropDuplicatesWithinWatermark("content_fp")
    else keyed.dropDuplicates("content_fp")
  }
}
