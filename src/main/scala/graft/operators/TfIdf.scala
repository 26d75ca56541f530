package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.functions.Portable
import graft.util.SparkUtil

/** Per-document top-k TF-IDF terms — the keyword/fingerprint signal for
  * corpus exploration and topic balancing in a training mix.
  *
  * tfidf(term, doc) = tf * (ln((N + 1) / (df + 1)) + 1), rounded to 6
  * decimals (smoothed idf; the rounding keeps cross-engine doubles
  * hash-identical, same convention as the ANN cosine scores).
  *
  * Plan shape (three keyed shuffles, each on a fine-grained key — no
  * global state, no driver action):
  *   1. explode(tokens) -> groupBy(doc, term) count        [tf]
  *   2. groupBy(term) count + equi-join back               [df]
  *      (an agg + join, NOT `count().over(Window.partitionBy(term))`:
  *      a whole-partition window frame needs every (doc, term) row of a
  *      term in ONE task, and Zipf says the hottest term occurs in
  *      ~every document — at 100 TB that one task holds the corpus. The
  *      aggregation does map-side partial combine (skew-immune), the
  *      join back is a vocabulary-sized narrow equi-join AQE can
  *      broadcast, and both branches hang off the SAME tf plan so
  *      ReuseExchange serves the (doc, term) shuffle once.)
  *   3. row_number over Window.partitionBy(doc)            [top-k]
  * N (corpus size) joins in as a broadcast 1-row aggregate, not a
  * driver-side count. Ranking orders by the ROUNDED score then term, so
  * rank ties resolve identically in any engine.
  */
final case class TfIdf(k: Int = 3,
                       textColumn: String = "text",
                       idColumn: String = "doc_id") extends Wrangler {
  require(k > 0, s"k must be positive, got $k")
  override def preservesSampleSize: Boolean = false

  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
    val n = df.agg(count(lit(1)).as("__n"))
    val tf = df
      .select(col(idColumn), explode(Portable.tokens(col(textColumn))).as("term"))
      .groupBy(col(idColumn), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val withDf = tf.join(docFreq, Seq("term"))
    val scored = withDf.crossJoin(broadcast(n))
      .withColumn("tfidf", round(
        col("tf") * (log((col("__n") + lit(1.0)) / (col("df") + lit(1.0)))
          + lit(1.0)), 6))
    val rank = row_number().over(
      Window.partitionBy(idColumn).orderBy(col("tfidf").desc, col("term").asc))
    scored.withColumn("rank", rank.cast("long"))
      .filter(col("rank") <= k)
      .select(col(idColumn), col("rank"), col("term"),
        col("tf").cast("long").as("tf"), col("df").cast("long").as("df"),
        col("tfidf"))
  }
}

/** BM25 ranked retrieval over the corpus for one query term set — the
  * lexical search face of the keyword layer ([[TfIdf]] characterizes
  * documents; this RANKS them against a query), the workhorse for
  * mining a 100 TB corpus for benchmark-relevant / topic-relevant
  * documents before a curation decision.
  *
  * Per matching (doc, term): the Robertson/Lucene BM25 component
  *   idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
  * with `idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`, `dl` the
  * document's token count and `avgdl` the corpus mean. Every per-term
  * component is rounded to the 1e-6 lattice and held as a scaled LONG;
  * the per-doc score is the exact integer sum (`score_x1e6`) — float
  * summation order can never flip a rank, the [[Corpus.UnigramLogProb]]
  * determinism discipline. Ties break by ascending id.
  *
  * Plan shape (two keyed shuffles + two broadcasts, no driver loop):
  * the token posting filters to the query's terms MAP-SIDE before the
  * (doc, term) aggregation, so the tf table is query-sized, not
  * corpus-sized; dl RIDES the posting (constant per doc), so no
  * corpus-wide doc join ever plans; df comes from a |Q|-row aggregate
  * of the tf table (joined back broadcast); N/avgdl ride one broadcast
  * 1-row aggregate. The final top-k
  * is orderBy+limit — `TakeOrdered` per-partition heaps, never a
  * single-partition rank window. A Zipf-hot query term concentrates
  * into the (doc, term) HASH aggregation (map-side partial combine,
  * skew-immune), not a window.
  */
final case class Bm25Search(queryTerms: Seq[String],
                            k: Int = 10,
                            k1: Double = 1.2,
                            b: Double = 0.75,
                            textColumn: String = "text",
                            idColumn: String = "doc_id") extends Wrangler {
  require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
    "`queryTerms` must be non-empty and duplicate-free")
  require(queryTerms.forall(t => t.nonEmpty && t == t.trim &&
      t == t.toLowerCase(java.util.Locale.ROOT)),
    "`queryTerms` must be lower-case and trimmed — corpus tokens are " +
      "lower-cased whitespace splits, so an uppercase or padded term " +
      "would silently match nothing")
  require(k > 0, s"k must be positive, got $k")
  require(k1 >= 0 && b >= 0 && b <= 1, "need k1 >= 0 and b in [0, 1]")
  override def preservesSampleSize: Boolean = false

  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
    val base = df.select(col(idColumn).cast("long").as("doc_id"),
      Portable.tokens(col(textColumn)).as("tk"))
    // corpus stats: one broadcast row — size(null tokens) = -1 never
    // arises here (tokens of null text is null; sum skips nulls, so a
    // null-text row contributes 0 length and 1 to N, like an empty doc)
    val stats = base.agg(count(lit(1)).as("__n"),
      sum(size(col("tk"))).as("__len"))
    // dl RIDES the posting map-side (constant per doc, min == the
    // value) — never a corpus-wide (doc_id) join: at 100 TB the doc
    // length table is corpus-sized and joining it back would shuffle
    // the whole corpus for a query-sized left side
    val tf = base
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .filter(col("term").isin(queryTerms: _*)) // map-side, pre-shuffle
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), min("dl").as("dl"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("__len").cast("double") / col("__n").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("comp", col("idf") * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") / col("avgdl"))))
      .withColumn("comp_x1e6", round(col("comp") * 1e6).cast("long"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_match"),
        sum("comp_x1e6").as("score_x1e6"))
      .orderBy(col("score_x1e6").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_match"), col("score_x1e6"))
  }
}

/** The PERSISTED face of [[Bm25Search]] — the family's ingest-loop
  * symmetry (the `dsir_incr` pattern): fit the corpus ONCE into a
  * self-describing posting artifact, then probe any query batch
  * without ever re-scanning or re-tokenizing corpus text, and fold
  * newly ingested batches in additively.
  *
  * Artifact schema `(term, doc_id, tf, dl)`:
  *   - posting rows — one per (doc, term) with its term frequency and
  *     the doc's token count (dl rides the posting, the [[Bm25Search]]
  *     discipline: no corpus-wide doc join ever plans);
  *   - exactly ONE stats row — `term IS NULL`, carrying
  *     `(tf = n_docs, dl = total_len)`. Everything BM25 needs beyond
  *     the postings is these two sums, and sums FOLD: the fold's new
  *     stats row is the sum of the old and the batch's.
  * `k1`/`b` (scaled 1e6 longs) ride column metadata on `term`
  * (parquet-round-trip safe) so a probe with drifted parameters fails
  * loud instead of silently ranking under a different model.
  *
  * Probe == [[Bm25Search]] bit-for-bit: tf/df/N/avgdl all reconstruct
  * exactly (integer counts), and the scoring runs the same 1e-6
  * integer lattice, so rank order is engine- and path-independent.
  *
  * 100 TB shape: the index is narrow longs + a term string; a probe
  * filters `term IN (query)` AT THE SCAN (parquet predicate pushdown —
  * no tokenization, no text), then runs two query-sized aggregations.
  * The fit is [[Bm25Search]]'s posting aggregation, once. Folds union
  * postings (disjoint docs by the fail-loud guard) and add the stats
  * row — no reshuffle of the standing index.
  */
object Bm25Index {

  private def params(k1: Double, b: Double): Map[String, Long] =
    Map("k1_x1e6" -> math.round(k1 * 1e6), "b_x1e6" -> math.round(b * 1e6))

  private def postingOf(df: DataFrame, textColumn: String,
                        idColumn: String): DataFrame =
    df.select(col(idColumn).cast("long").as("doc_id"),
        Portable.tokens(col(textColumn)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), min("dl").as("dl"))
      .select("term", "doc_id", "tf", "dl")

  private def statsOf(df: DataFrame, textColumn: String,
                      idColumn: String): DataFrame =
    df.select(col(idColumn).cast("long").as("doc_id"),
        Portable.tokens(col(textColumn)).as("tk"))
      .agg(count(lit(1)).as("tf"), sum(size(col("tk"))).as("dl"))
      .select(lit(null).cast("string").as("term"),
        lit(null).cast("long").as("doc_id"),
        col("tf"), coalesce(col("dl"), lit(0L)).as("dl"))

  /** Fit the posting index over a corpus. Persist the result; feed
    * [[probe]] and [[foldBatch]]. */
  def fit(corpus: DataFrame, textColumn: String = "text",
          idColumn: String = "doc_id", k1: Double = 1.2,
          b: Double = 0.75): DataFrame = {
    SparkUtil.validateColumns(corpus, Seq(idColumn, textColumn))
    require(k1 >= 0 && b >= 0 && b <= 1, "need k1 >= 0 and b in [0, 1]")
    SparkUtil.withFitParams(
      postingOf(corpus, textColumn, idColumn)
        .unionByName(statsOf(corpus, textColumn, idColumn)),
      "term", params(k1, b))
  }

  /** Fold an ingested batch into a fitted index: batch postings append
    * (docs must be NEW — a duplicate doc_id would double-count its
    * terms, so it raises), the stats rows sum. `fold == refit` exactly
    * (spec-pinned): postings of disjoint doc sets are disjoint rows,
    * and N / total_len are plain sums. */
  def foldBatch(index: DataFrame, batch: DataFrame,
                textColumn: String = "text",
                idColumn: String = "doc_id", k1: Double = 1.2,
                b: Double = 0.75): DataFrame = {
    SparkUtil.validateColumns(index, Seq("term", "doc_id", "tf", "dl"))
    SparkUtil.validateColumns(batch, Seq(idColumn, textColumn))
    params(k1, b).foreach { case (key, v) =>
      SparkUtil.requireFitParam(index, "term", key, v, "Bm25Index.foldBatch")
    }
    val batchDocs = batch
      .select(col(idColumn).cast("long").as("doc_id")).distinct()
    val dup = index.filter(col("term").isNotNull)
      .select("doc_id").join(broadcast(batchDocs), Seq("doc_id"),
        "left_semi").limit(1).count()
    require(dup == 0L,
      "Bm25Index.foldBatch: the batch re-ingests doc_id(s) already in " +
        "the index — folding would double-count their terms; dedup " +
        "the batch or re-fit on the merged corpus")
    val mergedStats = index.filter(col("term").isNull)
      .unionByName(statsOf(batch, textColumn, idColumn))
      .groupBy()
      .agg(sum("tf").as("tf"), sum("dl").as("dl"))
      .select(lit(null).cast("string").as("term"),
        lit(null).cast("long").as("doc_id"), col("tf"), col("dl"))
    SparkUtil.withFitParams(
      index.filter(col("term").isNotNull)
        .unionByName(postingOf(batch, textColumn, idColumn))
        .unionByName(mergedStats),
      "term", params(k1, b))
  }

  /** Rank the indexed corpus against a query — [[Bm25Search]]'s exact
    * output `(doc_id, n_match, score_x1e6)` without touching corpus
    * text. `k1`/`b` must match the fit (they ride the artifact). */
  def probe(index: DataFrame, queryTerms: Seq[String], k: Int = 10,
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    SparkUtil.validateColumns(index, Seq("term", "doc_id", "tf", "dl"))
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "`queryTerms` must be non-empty and duplicate-free")
    require(queryTerms.forall(t => t.nonEmpty && t == t.trim &&
        t == t.toLowerCase(java.util.Locale.ROOT)),
      "`queryTerms` must be lower-case and trimmed — corpus tokens " +
        "are lower-cased whitespace splits, so an uppercase or padded " +
        "term would silently match nothing")
    require(k > 0, s"k must be positive, got $k")
    params(k1, b).foreach { case (key, v) =>
      SparkUtil.requireFitParam(index, "term", key, v, "Bm25Index.probe")
    }
    // exactly one stats row — a fit/fold artifact has it by
    // construction; a hand-built or truncated table fails loud (the
    // check scans only the term-null slice, parquet-pushdown cheap)
    val statsRows = index.filter(col("term").isNull)
      .select(col("tf").as("__n"), col("dl").as("__len"))
    require(statsRows.limit(2).count() == 1L,
      "Bm25Index.probe: the index must carry exactly one stats row " +
        "(term IS NULL) — build it with Bm25Index.fit / foldBatch")
    val tf = index.filter(col("term").isin(queryTerms: _*))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(statsRows))
      .withColumn("avgdl",
        col("__len").cast("double") / col("__n").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("comp", col("idf") * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") / col("avgdl"))))
      .withColumn("comp_x1e6", round(col("comp") * 1e6).cast("long"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_match"),
        sum("comp_x1e6").as("score_x1e6"))
      .orderBy(col("score_x1e6").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_match"), col("score_x1e6"))
  }
}
