package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Classifier

/** Streaming TRAINED quality gate — the deployable face of
  * [[Classifier.QualityClassifier]] on the ingest stream
  * ([[StreamingDsir]]'s convention: the fit artifact is batch-built,
  * the stream consumes it): documents arriving on a stream score
  * against a PERSISTED [[Classifier.weightsTable]] bit-identically to
  * the batch scorer, because the operator IS [[Classifier.Score]] — a
  * stateless map pass over the broadcast weight array, legal on a
  * streaming Dataset as-is (no watermark, no state store). Fit drift
  * (numFeatures, ngram) raises before the stream starts; retrain and
  * re-deploy the weights at compaction cadence, like every persisted
  * index in the loop.
  *
  * `admitOnly = true` emits only the `quality_keep` rows — the gate
  * composed, not just the score.
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingQualityGate(weights: DataFrame,
                                 idColumn: String = "doc_id",
                                 textColumn: String = "text",
                                 numFeatures: Int = 1024,
                                 ngram: Int = 1,
                                 admitOnly: Boolean = false) {

  /** `df` must be a streaming DataFrame; output appends one row per
    * input row (or per ADMITTED row with `admitOnly`). */
  def transform(df: DataFrame): DataFrame = {
    require(df.isStreaming,
      "StreamingQualityGate.transform needs a streaming DataFrame; " +
        "use Classifier.Score for batch corpora (the same pass)")
    val scored = Classifier.Score(weights, idColumn = idColumn,
      textColumn = textColumn, numFeatures = numFeatures, ngram = ngram)
      .transform(df)
    if (admitOnly)
      scored.filter(org.apache.spark.sql.functions.col("quality_keep"))
    else scored
  }
}
