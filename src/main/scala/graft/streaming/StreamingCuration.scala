package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.Curation

/** The streaming ingest recipe END-TO-END — the documented curation
  * loop as one composition over the persisted fit artifacts:
  * canonicalize → gate (DSIR count table) → strip (line index) →
  * encode (self-describing vocab), all fused into
  * [[Curation.Recipe]]'s single stateless typed pass (zero shuffles
  * and zero state store per micro-batch; artifacts broadcast once at
  * plan-build time, every drift direction raising before the stream
  * starts) — plus the dedup PROBE leg ([[dupPairs]]): the admitted,
  * stripped text probed against the persisted MinHash band/signature
  * indexes through [[StreamingIncrementalMinHash]]'s stream-static
  * joins, emitting `(corpus doc, stream doc, est_jaccard)` pairs for
  * admission control. The probe shares the EXACT gate/strip legs
  * (one broadcast [[Curation.Legs]] bundle), so the two faces can
  * never drift on what counts as admitted.
  *
  * Index maintenance (the loop's other half, deliberately outside the
  * stream plan): at compaction cadence, fold each processed batch
  * into EACH persisted index exactly once —
  * [[graft.operators.Dsir.foldBatch]] for the count table,
  * [[graft.operators.Corpus.IncrementalHotLines.foldBatch]] for the
  * line index, [[graft.operators.Dedup.IncrementalMinHashLSH]]'s
  * index folds — then rebuild the stream against the updated
  * artifacts. StreamingCurationSpec walks this loop across
  * micro-batch boundaries and pins stream == batch bit-identity at
  * every step, with exactly ONE fold per batch per index.
  *
  * Reference streaming surface: none (pywrangler is batch-only).
  */
final class StreamingCuration(lineIndex: DataFrame,
                              counts: DataFrame,
                              vocab: DataFrame,
                              minScore: Long,
                              idColumn: String = "doc_id",
                              textColumn: String = "text",
                              urlColumn: Option[String] = None,
                              tsColumn: String = "ts",
                              maxDocFreq: Long = 100L,
                              numFeatures: Int = 4096,
                              maxHotLines: Int = 1 << 22,
                              byteLevel: Boolean = false,
                              classifierWeights:
                                Option[DataFrame] = None,
                              clfNumFeatures: Int = 1024,
                              clfNgram: Int = 1) {

  /** The curated, encoded document stream — one row per admitted doc
    * (`doc_id[, url_canonical], dsir_score, n_lines, n_kept_lines,
    * clean_text, n_bpe_tokens, bpe_ids`). `df` must be streaming; the
    * pass is stateless (append mode, no watermark needed).
    */
  def transform(df: DataFrame): DataFrame = {
    require(df.isStreaming,
      "StreamingCuration.transform needs a streaming DataFrame; use " +
        "Curation.Recipe directly for batch corpora (the same pass)")
    Curation.Recipe(lineIndex, counts, vocab, minScore,
      idColumn = idColumn, textColumn = textColumn,
      urlColumn = urlColumn, maxDocFreq = maxDocFreq,
      numFeatures = numFeatures, maxHotLines = maxHotLines,
      byteLevel = byteLevel, classifierWeights = classifierWeights,
      clfNumFeatures = clfNumFeatures, clfNgram = clfNgram)
      .transform(df)
  }

  /** The PROBE leg: near-duplicate pairs of the ADMITTED, STRIPPED
    * stream docs against the persisted corpus indexes — gate and
    * strip run first (the loop order: only curated text is probed,
    * through the same broadcast legs as [[transform]]), then
    * [[StreamingIncrementalMinHash]] on the clean text. Needs the
    * event-time `tsColumn` (the pair-dedup watermark anchor).
    */
  def dupPairs(df: DataFrame, bandIndex: DataFrame,
               signatureIndex: DataFrame, n: Int = 3, k: Int = 32,
               bands: Int = 8, threshold: Double = 0.25,
               watermarkDelay: String = "10 seconds"): DataFrame = {
    require(df.isStreaming,
      "StreamingCuration.dupPairs needs a streaming DataFrame; use " +
        "Dedup.IncrementalMinHashLSH for batch probes")
    graft.util.SparkUtil.validateColumns(df,
      Seq(idColumn, textColumn, tsColumn))
    val spark = df.sparkSession
    import spark.implicits._
    val legs = Curation.buildLegs(lineIndex, counts, numFeatures,
      minScore, maxDocFreq, maxHotLines,
      "StreamingCuration.dupPairs", classifierWeights,
      clfNumFeatures, clfNgram)
    val bcLegs = spark.sparkContext.broadcast(legs)
    val cleaned = df.select(col(idColumn).cast("long"),
        col(tsColumn).cast("timestamp"),
        col(textColumn).cast("string"))
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions { it =>
        val lg = bcLegs.value
        it.flatMap { case (id, ts, text) =>
          if (!lg.admits(lg.score(text)) ||
              (lg.hasClassifier && lg.clfMargin(text) <= 0L)) None
          else Some((id, ts, lg.strip(text)._3))
        }
      }
      .toDF(idColumn, tsColumn, "clean_text")
    new StreamingIncrementalMinHash(bandIndex, signatureIndex,
      idColumn = idColumn, textColumn = "clean_text",
      tsColumn = tsColumn, n = n, k = k, bands = bands,
      threshold = threshold, watermarkDelay = watermarkDelay)
      .transform(cleaned)
  }
}
