package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.TextAnalysis

/** Streaming C4 cleaning gate — the ingest-stream face of
  * [[TextAnalysis.C4Clean]]: documents arriving on a stream get the
  * same line retention (terminal punctuation, word minimum, the
  * javascript word), document rules and the EDITED `clean_text`
  * bit-identically to the batch pass, because the operator IS the
  * batch operator — a stateless typed map with no fit artifact (the
  * rules are closed-form), legal on a streaming Dataset as-is.
  * Runs beside [[StreamingGopherGate]] at the head of the ingest
  * chain: C4 EDITS the document (drops boilerplate lines), Gopher
  * REJECTS documents — a pipeline typically runs C4 first so the
  * Gopher counters see the cleaned text.
  *
  * `admitOnly = true` emits only admitted rows — the gate composed,
  * not just the audit columns.
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingC4Gate(textColumn: String = "text",
                            minLineWords: Long = 5L,
                            minSentences: Long = 3L,
                            blockWords: Seq[String] = Seq.empty,
                            admitOnly: Boolean = false) {

  /** `df` must be a streaming DataFrame; output appends one row per
    * input row (or per ADMITTED row with `admitOnly`). */
  def transform(df: DataFrame): DataFrame = {
    require(df.isStreaming,
      "StreamingC4Gate.transform needs a streaming DataFrame; " +
        "use TextAnalysis.C4Clean for batch corpora (the same pass)")
    val cleaned = TextAnalysis.C4Clean(textColumn = textColumn,
      minLineWords = minLineWords, minSentences = minSentences,
      blockWords = blockWords).transform(df)
    if (admitOnly) cleaned.filter(col("admit")) else cleaned
  }
}
