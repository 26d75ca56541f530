package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest dedup against a STATIC corpus fingerprint index —
  * the stream-static face of
  * [[graft.operators.Dedup.IncrementalExactDedup]]: documents arriving
  * on a stream are fingerprinted (same whitespace-normalized md5 as the
  * whole exact-dedup family) and probed against the persisted
  * `(content_fp, canonical_id)` index via Structured Streaming's
  * stream-static left join. Corpus text is never read, only the ~40
  * bytes/doc index.
  *
  * Output appends `content_fp`, `is_known` (the content already exists
  * in the corpus) and `canonical_id` (the corpus doc that owns it; null
  * for new content) to every surviving row. With `withinStream = true`
  * (default) in-flight copies inside the stream are first collapsed by
  * [[StreamingDedup]]'s watermark-bounded state, so the join sees each
  * new fingerprint once per horizon.
  *
  * Scale shape: the static side re-executes per micro-batch — persist
  * the index (or read it from a bucketed table so the per-batch probe
  * is a co-located join) and it amortizes to an in-memory hash lookup;
  * state is [[StreamingDedup]]'s watermark-bounded store, never the
  * corpus. Folding admitted output back into the index is a BATCH-side
  * `IncrementalExactDedup.updatedIndex` at a compaction cadence (the
  * static side of a stream-static join is fixed for the lifetime of the
  * query); until a restart picks the updated index up, cross-batch
  * copies inside the stream are caught by the within-stream state, not
  * the index — the documented horizon trade of the streaming family.
  *
  * Reference streaming surface: none (pywrangler is batch-only); this
  * extends the incremental-ingest family to streams.
  */
final class StreamingIncrementalDedup(index: DataFrame,
                                      textColumn: String = "text",
                                      withinStream: Boolean = true) {

  /** `df` must be a streaming DataFrame; with `withinStream = true` it
    * must carry an event-time watermark (the within-stream state bound).
    */
  def transform(df: DataFrame): DataFrame = {
    graft.util.SparkUtil.validateColumns(index,
      Seq("content_fp", "canonical_id"))
    Seq("is_known", "canonical_id", "__ifp").foreach { c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"Output/working column `$c` already exists in the input; " +
          "rename it first (matching the batch IncrementalExactDedup " +
          "contract)")
    }
    val deduped =
      if (withinStream)
        new StreamingDedup(textColumn).transform(df)
      else {
        require(!df.columns.exists(_.equalsIgnoreCase("content_fp")),
          "Output column `content_fp` already exists in the input; " +
            "rename it first")
        df.withColumn("content_fp", md5(
          regexp_replace(trim(lower(col(textColumn))), "\\s+", " ")))
      }
    // null-safe probe: a null-text fingerprint (null) is one content
    // class, matching the batch family's null-safe joins — a plain ===
    // would leave null-text rows permanently "new"
    deduped.join(
        index.select(col("content_fp").as("__ifp"), col("canonical_id")),
        col("content_fp") <=> col("__ifp"), "left_outer")
      .drop("__ifp")
      .withColumn("is_known", col("canonical_id").isNotNull)
  }
}
