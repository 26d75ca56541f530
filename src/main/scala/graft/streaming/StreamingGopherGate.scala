package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.TextAnalysis

/** Streaming Gopher gate — the ingest-stream face of the COMPLETE
  * batch gate ([[TextAnalysis.GopherRules]] outlier rules AND
  * [[TextAnalysis.GopherRepetition]] structural + n-gram repetition
  * rules): documents arriving on a stream get the same integer rule
  * counters, per-rule verdicts and the composed conjunction `admit`
  * bit-identically to the batch pass, because the operators ARE the
  * batch operators — two stateless typed maps with no fit artifact at
  * all (every rule is closed-form), legal on a streaming Dataset as-is
  * (no watermark, no state store). The cheapest gate in the ingest
  * chain: it runs FIRST, before any artifact-backed stage
  * ([[StreamingQualityGate]], [[StreamingHotLineStrip]]), killing
  * obvious junk before those spend broadcast lookups on it.
  *
  * Output: every [[TextAnalysis.GopherRules]] column with its `admit`
  * renamed `rules_admit` and its `n_lines` renamed `gate_n_lines`
  * (the repetition pass emits its own `n_lines` over the
  * CRLF-normalized split), then every [[TextAnalysis.GopherRepetition]]
  * column with its `admit` renamed `rep_admit`, then the composed
  * `admit = rules_admit AND rep_admit`. `admitOnly = true` emits only
  * admitted rows — the gate composed, not just the audit columns.
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
        "compose TextAnalysis.GopherRules + GopherRepetition for " +
        "batch corpora (the same two passes)")
    val ruled = TextAnalysis.GopherRules(textColumn = textColumn,
      minWords = minWords, maxWords = maxWords, stopwords = stopwords)
      .transform(df)
      .withColumnRenamed("admit", "rules_admit")
      .withColumnRenamed("n_lines", "gate_n_lines")
    val full = TextAnalysis.GopherRepetition(textColumn = textColumn)
      .transform(ruled)
      .withColumnRenamed("admit", "rep_admit")
      .withColumn("admit", col("rules_admit") && col("rep_admit"))
    if (admitOnly) full.filter(col("admit")) else full
  }
}
