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
