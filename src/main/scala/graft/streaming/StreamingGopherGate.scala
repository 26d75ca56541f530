package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.TextAnalysis

/** Streaming Gopher rule gate — the ingest-stream face of
  * [[TextAnalysis.GopherRules]]: documents arriving on a stream get the
  * same integer rule counters, per-rule verdicts and conjunction
  * `admit` bit-identically to the batch pass, because the operator IS
  * the batch operator — a stateless typed map with no fit artifact at
  * all (the rules are closed-form), legal on a streaming Dataset as-is
  * (no watermark, no state store). The cheapest gate in the ingest
  * chain: it runs FIRST, before any artifact-backed stage
  * ([[StreamingQualityGate]], [[StreamingHotLineStrip]]), killing
  * obvious junk before those spend broadcast lookups on it.
  *
  * `admitOnly = true` emits only admitted rows — the gate composed,
  * not just the audit columns.
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingGopherGate(textColumn: String = "text",
                                minWords: Long = 50L,
                                maxWords: Long = 100000L,
                                stopwords: Seq[String] =
                                  TextAnalysis.GopherStops,
                                admitOnly: Boolean = false) {

  /** `df` must be a streaming DataFrame; output appends one row per
    * input row (or per ADMITTED row with `admitOnly`). */
  def transform(df: DataFrame): DataFrame = {
    require(df.isStreaming,
      "StreamingGopherGate.transform needs a streaming DataFrame; " +
        "use TextAnalysis.GopherRules for batch corpora (the same pass)")
    val ruled = TextAnalysis.GopherRules(textColumn = textColumn,
      minWords = minWords, maxWords = maxWords, stopwords = stopwords)
      .transform(df)
    if (admitOnly)
      ruled.filter(org.apache.spark.sql.functions.col("admit"))
    else ruled
  }
}
