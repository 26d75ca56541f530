package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.functions.Portable._
import graft.util.SparkUtil

/** Document chunking for retrieval / pretraining pipelines: split each
  * document's whitespace-token stream into fixed-size windows of
  * `chunkTokens` tokens that overlap by `overlapTokens` (stride =
  * `chunkTokens - overlapTokens`), the standard context-window prep for
  * embedding or training long documents.
  *
  * Chunk starts are the stride multiples below `max(n - overlap, 1)`:
  * every token is covered (the last start is >= n - chunkTokens by
  * construction), no chunk is a strict suffix-duplicate of its
  * predecessor, and every document yields at least one chunk (the token
  * convention of [[graft.functions.Portable.tokens]] gives even an empty
  * document one empty token, matching the DuckDB oracle's
  * `string_split_regex`).
  *
  * Scale shape: pure narrow map-side expression — tokenize, generate the
  * start list with `sequence`, `posexplode`, `slice` + `array_join`; all
  * codegen'd built-ins, zero shuffle, no UDF. Output size is a bounded
  * multiple of the input (one row per chunk, text length / stride), so
  * the operator scales with input splits exactly like the text-analysis
  * family. Beyond-reference surface (the reference has no text layer);
  * framework contract per src/pywrangler/base.py:12-131.
  *
  * Tokenization is the whitespace convention by default; real context
  * windows are measured in TOKENIZER tokens, so `tokenArrayColumn`
  * switches the source to an externally-computed `array<string>` token
  * column (a real BPE tokenizer's output, a regex tokenization, ...) —
  * the window/stride algebra and the output schema are unchanged,
  * `textColumn` is then unread, and a null array fails loud. Note the
  * empty-document convention differs by source: the whitespace path
  * gives an empty document ONE empty token; an external empty array is
  * taken as-is (zero tokens) — both still yield exactly one (empty)
  * chunk.
  *
  * @param chunkTokens   tokens per chunk window (>= 1)
  * @param overlapTokens tokens shared between consecutive chunks
  *                      (in [0, chunkTokens))
  */
final case class ChunkSplit(chunkTokens: Int = 64,
                            overlapTokens: Int = 16,
                            idColumn: String = "doc_id",
                            textColumn: String = "text",
                            tokenArrayColumn: String = "")
    extends Wrangler {
  require(chunkTokens >= 1, "chunkTokens must be >= 1")
  require(overlapTokens >= 0 && overlapTokens < chunkTokens,
    "overlapTokens must be in [0, chunkTokens)")
  override def preservesSampleSize: Boolean = false

  private val stride = chunkTokens - overlapTokens

  def transform(df: DataFrame): DataFrame = {
    val external = tokenArrayColumn.nonEmpty
    SparkUtil.validateColumns(df, Seq(idColumn,
      if (external) tokenArrayColumn else textColumn))
    if (external) {
      val t = SparkUtil.fieldType(df, tokenArrayColumn)
      require(t == org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType) ||
          t == org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, containsNull = false),
        s"ChunkSplit: `$tokenArrayColumn` must be array<string>, got " +
          t.simpleString)
    }
    // fail-loudly (curation convention): null text would make
    // size(tokens) = -1 and sequence() a negative range — a null
    // external array likewise
    val tkSource =
      if (external)
        when(col(tokenArrayColumn).isNull,
          raise_error(lit(
            s"ChunkSplit: `$tokenArrayColumn` must be non-null"))
            .cast("array<string>"))
          // null ELEMENTS would desync the counts from the text:
          // size() counts them but array_join silently drops them, so
          // n_chunk_tokens would exceed the emitted chunk_text's
          // tokens (array_compact is a codegen'd collection op — no
          // interpreted lambda on this hot path)
          .when(size(array_compact(col(tokenArrayColumn))) =!=
              size(col(tokenArrayColumn)),
            raise_error(lit(s"ChunkSplit: `$tokenArrayColumn` must " +
              "not contain null elements — they count in " +
              "n_chunk_tokens but vanish from chunk_text"))
              .cast("array<string>"))
          .otherwise(col(tokenArrayColumn))
      else
        when(col(textColumn).isNull,
          raise_error(lit(s"ChunkSplit: `$textColumn` must be non-null"))
            .cast("array<string>"))
          .otherwise(tokens(col(textColumn)))
    val toks = df
      .select(col(idColumn), tkSource.as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("long"))
    // inclusive-stop sequence over the stride multiples < max(n-overlap,1)
    val starts = sequence(lit(0L),
      greatest(col("__n") - overlapTokens - 1L, lit(0L)), lit(stride.toLong))
    toks
      .select(col(idColumn), col("__tk"), col("__n"),
        posexplode(starts).as(Seq("chunk_idx", "chunk_start")))
      .select(col(idColumn),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start"),
        least(lit(chunkTokens.toLong), col("__n") - col("chunk_start"))
          .as("n_chunk_tokens"),
        array_join(slice(col("__tk"),
            (col("chunk_start") + 1L).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"))
  }
}
