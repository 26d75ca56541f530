package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Tokenize

/** Streaming subword encode against a STATIC (persisted,
  * self-describing) vocab — the tokenize leg of the streaming ingest
  * family ([[StreamingDsir]] / [[StreamingIncrementalDedup]]
  * convention: the fit artifact is batch-built, the stream consumes
  * it). Documents arriving on a stream encode to the SAME token ids
  * the batch encoder produces, bit-identically, because the operator
  * IS [[Tokenize.BpeEncode]]: a stateless typed map pass, legal on a
  * streaming Dataset as-is.
  *
  * Cost shape per micro-batch: the vocab is collected and validated
  * ONCE at plan-build time (here, not per batch — including the
  * self-describing fit-param check, so a lowercase/prefix drift
  * against the persisted vocab raises before the stream starts) and
  * broadcast; what repeats per batch is only the per-partition TRIE
  * COMPILE from the broadcast arrays. That is O(vocab chars) of local
  * hashmap inserts — microseconds at the 10^4-piece scale, low
  * milliseconds at 10^5 (measured by the `streaming bpe encode` stress
  * row against a 113k-piece vocab) — beside which a micro-batch's own
  * fixed cost (offset commit, task scheduling) dominates by orders of
  * magnitude. Caching compiled tries across batches would buy nothing
  * measurable and would pin executor memory for the cache's lifetime,
  * so the tries stay batch-local by design.
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingBpeEncode(vocab: DataFrame,
                               textColumn: String = "text",
                               idColumn: String = "doc_id",
                               continuationPrefix: String = "##",
                               unkId: Option[Long] = None,
                               lowercase: Boolean = true,
                               emitPieces: Boolean = false,
                               byteLevel: Boolean = false) {

  /** `df` must be a streaming DataFrame; output appends one row per
    * input row (`doc_id`, `n_bpe_tokens`, `bpe_ids`[, `bpe_pieces`]) —
    * stateless, so every sink mode works and no watermark is needed.
    */
  def transform(df: DataFrame): DataFrame = {
    require(df.isStreaming,
      "StreamingBpeEncode.transform needs a streaming DataFrame; use " +
        "Tokenize.BpeEncode for batch corpora")
    Tokenize.BpeEncode(vocab, textColumn = textColumn,
      idColumn = idColumn, continuationPrefix = continuationPrefix,
      unkId = unkId, lowercase = lowercase, emitPieces = emitPieces,
      byteLevel = byteLevel)
      .transform(df)
  }
}

/** Streaming subword DECODE against the same static self-describing
  * vocab — the inverse leg on the stream ([[Tokenize.BpeDecode]] is a
  * stateless typed map pass, so it is legal on a streaming Dataset
  * as-is, with the vocab collected/validated once at plan-build time
  * exactly like the encode; fit-param drift — prefix, char/byte level —
  * raises before the stream starts). With both legs streaming, the
  * decode identity holds per micro-batch: encode → decode on a stream
  * reproduces the canonical text bit-identically (spec-pinned).
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingBpeDecode(vocab: DataFrame,
                               idsColumn: String = "bpe_ids",
                               idColumn: String = "doc_id",
                               continuationPrefix: String = "##",
                               byteLevel: Boolean = false) {

  /** `df` must be a streaming DataFrame carrying the id-array column;
    * output is one `(doc_id, text)` row per input row — stateless, no
    * watermark.
    */
  def transform(df: DataFrame): DataFrame = {
    require(df.isStreaming,
      "StreamingBpeDecode.transform needs a streaming DataFrame; use " +
        "Tokenize.BpeDecode for batch input")
    Tokenize.BpeDecode(vocab, idsColumn = idsColumn, idColumn = idColumn,
      continuationPrefix = continuationPrefix, byteLevel = byteLevel)
      .transform(df)
  }
}

/** Streaming Unigram-LM (Viterbi) encode against a STATIC persisted
  * [[Tokenize.UnigramScores]] table — the max-likelihood sibling of
  * [[StreamingBpeEncode]], same duality: the operator IS
  * [[Tokenize.UnigramEncode]], a stateless typed map pass, legal on a
  * streaming Dataset as-is. The score table is collected, validated
  * (the shared encode-vocab contract plus the score layer) and
  * broadcast ONCE at plan-build time — fit-param drift raises before
  * the stream starts; what repeats per micro-batch is only the local
  * trie/score-map compile, the [[StreamingBpeEncode]] cost envelope.
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingUnigramEncode(scores: DataFrame,
                                   textColumn: String = "text",
                                   idColumn: String = "doc_id",
                                   continuationPrefix: String = "##",
                                   unkId: Option[Long] = None,
                                   lowercase: Boolean = true,
                                   emitPieces: Boolean = false,
                                   byteLevel: Boolean = false) {

  /** `df` must be a streaming DataFrame; output appends one row per
    * input row (`doc_id`, `n_bpe_tokens`, `bpe_ids`[, `bpe_pieces`]) —
    * stateless, so every sink mode works and no watermark is needed.
    */
  def transform(df: DataFrame): DataFrame = {
    require(df.isStreaming,
      "StreamingUnigramEncode.transform needs a streaming DataFrame; " +
        "use Tokenize.UnigramEncode for batch corpora")
    Tokenize.UnigramEncode(scores, textColumn = textColumn,
      idColumn = idColumn, continuationPrefix = continuationPrefix,
      unkId = unkId, lowercase = lowercase, emitPieces = emitPieces,
      byteLevel = byteLevel)
      .transform(df)
  }
}
