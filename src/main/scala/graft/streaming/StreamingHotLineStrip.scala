package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.SparkUtil

/** Streaming line-level dedup against a STATIC persisted line index —
  * the stream face of [[graft.operators.Corpus.IncrementalHotLineStrip]]
  * (the [[StreamingBpeEncode]] pattern: a stateless per-doc transform
  * against a broadcast fit artifact): documents arriving on a stream
  * have their corpus-hot lines stripped, with hotness decided by the
  * INDEX frequencies alone — `countBatch = false` semantics, the only
  * contract an unbounded stream can honor (it cannot see its own
  * future mass; the spec pins stream == that batch face bit-for-bit).
  * Fold admitted documents back into the index batch-side
  * ([[graft.operators.Corpus.IncrementalHotLines.foldBatch]]) at a
  * compaction cadence — the streaming family's documented horizon
  * trade.
  *
  * The hot set (index lines with `doc_freq > maxDocFreq`) is collected
  * ONCE, driver-bounded by `maxHotLines` with a fail-loud cap (the
  * BpeEncode `maxVocab` convention — a hot set is small by definition:
  * its size is at most corpus-lines / maxDocFreq), and broadcast; each
  * document then strips in ONE map pass — fully STATELESS, no
  * watermark, no state store, per-micro-batch cost O(doc lines).
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingHotLineStrip(lineIndex: DataFrame,
                                  idColumn: String = "doc_id",
                                  textColumn: String = "text",
                                  maxDocFreq: Long = 100L,
                                  maxHotLines: Int = 1 << 22) {
  require(maxDocFreq >= 1, "`maxDocFreq` must be >= 1")
  require(maxHotLines >= 1, "`maxHotLines` must be positive")

  /** `df` must be a streaming DataFrame. Output per input doc:
    * `(doc_id, n_lines, n_kept_lines, clean_text)` — the
    * [[graft.operators.Corpus.HotLineStrip]] schema.
    */
  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
    SparkUtil.validateColumns(lineIndex, Seq("line", "doc_freq"))
    require(df.isStreaming,
      "StreamingHotLineStrip.transform needs a streaming DataFrame; " +
        "use Corpus.IncrementalHotLineStrip(countBatch = false) for " +
        "batch input")
    val spark = df.sparkSession
    import spark.implicits._
    // shared bounded collect ([[Curation.collectHotSet]]): the hot set
    // broadcasts as sorted 64-bit line fingerprints (8 bytes/line —
    // ~32 MB at the 4M cap where raw strings would be multi-GB; the
    // documented membership false-positive bound is ~m/2^64 per line)
    val bcHot = spark.sparkContext.broadcast(
      graft.operators.Curation.collectHotSet(lineIndex, maxDocFreq,
        maxHotLines, "StreamingHotLineStrip"))
    df.select(col(idColumn).cast("long"),
        col(textColumn).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val hot = bcHot.value
        it.map { case (docId, text) =>
          if (text == null) (docId, 0L, 0L, "")
          else {
            val ls = text.split("\n", -1)
            val kept = ls.filterNot(hot.contains)
            (docId, ls.length.toLong, kept.length.toLong,
              kept.mkString("\n"))
          }
        }
      }
      .toDF("doc_id", "n_lines", "n_kept_lines", "clean_text")
  }
}
