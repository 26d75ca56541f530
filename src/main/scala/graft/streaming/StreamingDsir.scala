package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.operators.Dsir

/** Streaming DSIR admission gate — the stream-static face of
  * [[graft.operators.Dsir.IncrementalResample]], completing the
  * streaming ingest loop (exact / near / semantic dedup siblings:
  * [[StreamingIncrementalDedup]], [[StreamingIncrementalMinHash]]):
  * documents arriving on a stream are importance-scored against the
  * persisted corpus feature-count table
  * ([[graft.operators.Dsir.featureCounts]]) and admitted iff
  * `dsir_score >= minScore`. Corpus text is never read — only the
  * <= `numFeatures`-row table.
  *
  * A stream cannot rank (top-`fraction` needs the batch's total
  * count), so admission is by THRESHOLD: take `minScore` from the
  * batch selection's own cut — e.g. `min(dsir_score)` over
  * [[graft.operators.Dsir.ImportanceResample]]'s kept rows, which
  * admits a stream document exactly iff it scores at or above the
  * corpus cut (ties admit, like the cut class itself). Scores are the
  * family's scaled-long lattice, BIT-IDENTICAL to the batch scorer
  * (spec-pinned): the count table collapses to a driver-held
  * `Array[Long]` log-ratio table
  * ([[graft.operators.Dsir.ratioTable]] — same double arithmetic,
  * same HALF_UP rounding, zero-count ratio in absent cells), and each
  * document scores in ONE compiled pass over its tokens
  * ([[Portable.tokensLocal]] / [[Portable.tokenHashLocal]], the exact
  * local mirrors of the batch expressions) — the
  * [[StreamingIncrementalMinHash]] per-row-local move, since a
  * streaming per-doc aggregation would be stateful and watermark-gated
  * while one document's tokens always fit memory.
  *
  * The gate is fully STATELESS: a map + filter per micro-batch, no
  * state store, no watermark requirement (spec-pinned via empty
  * `stateOperators`). Folding admitted documents back into the count
  * table is a batch-side [[graft.operators.Dsir.foldBatch]] at
  * compaction cadence, like the dedup siblings — until a restart picks
  * the updated table up, the gate scores against the fit as of query
  * start (the documented horizon trade of the streaming family).
  *
  * Reference streaming surface: none (pywrangler is batch-only); this
  * extends the incremental-ingest family to streams.
  */
final class StreamingDsir(counts: DataFrame,
                          minScore: Long,
                          idColumn: String = "doc_id",
                          textColumn: String = "text",
                          tsColumn: String = "ts",
                          numFeatures: Int = 4096) {
  require(numFeatures >= 1 && numFeatures <= (1 << 20),
    "`numFeatures` must be in [1, 2^20] — the ratio table is " +
      s"driver-held; got $numFeatures")

  /** `df` must be a streaming DataFrame. Emits the admitted rows as
    * `(idColumn, tsColumn, textColumn, dsir_score)`; null-text rows
    * score exactly 0 (the batch contract) and pass iff `0 >= minScore`.
    */
  def transform(df: DataFrame): DataFrame = {
    graft.util.SparkUtil.validateColumns(df,
      Seq(idColumn, textColumn, tsColumn))
    require(!df.columns.exists(_.equalsIgnoreCase("dsir_score")),
      "Output column `dsir_score` already exists in the input; " +
        "rename it first (matching the batch Dsir contract)")
    // one driver action against the static table at wiring time; the
    // array rides task serialization to every micro-batch
    val lr = Dsir.ratioTable(counts, numFeatures, "StreamingDsir")
    val nf = numFeatures
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idColumn).cast("long"),
        col(tsColumn).cast("timestamp"), col(textColumn).cast("string"))
      .as[(Long, java.sql.Timestamp, String)]
      .map { case (id, ts, text) =>
        val toks = Portable.tokensLocal(text)
        var s = 0L
        if (toks != null) {
          var i = 0
          while (i < toks.length) {
            s += lr((Portable.tokenHashLocal(toks(i)) % nf).toInt)
            i += 1
          }
        }
        (id, ts, text, s)
      }
      .toDF(idColumn, tsColumn, textColumn, "dsir_score")
      .filter(col("dsir_score") >= minScore)
  }
}
