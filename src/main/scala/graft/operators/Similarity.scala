package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.functions.Portable._
import graft.util.SparkUtil

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two strategies over the same integer-quantized cosine:
  *   - [[CosineTopK]] — brute force: broadcast the (small) query set
  *     against the corpus; exact, one pass over the data, no corpus
  *     shuffle. The right baseline whenever |queries| is broadcastable.
  *   - [[LshCosineTopK]] — random-hyperplane buckets: corpus and queries
  *     are bucketed by sign bits and equi-joined on the bucket key, so
  *     each query only scores its bucket — the scale path when the query
  *     set itself is large. Recall is the usual LSH trade-off.
  *
  * Quantization (round(x*1e4) longs) keeps dot products and norms in
  * exact integer arithmetic; the final cosine is a single IEEE div/sqrt
  * of identical integers, making results bit-deterministic across
  * engines (see [[graft.functions.Portable]]).
  */
object Similarity {

  private def ranked(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id").as("neighbor_id"), col("cosine"))

  /** Exact top-k cosine neighbors for each query vector. The query set is
    * broadcast; the corpus is scanned once map-side and only the per-query
    * top-k shuffle to rank (W window over query_id).
    */
  final case class CosineTopK(queries: DataFrame => DataFrame,
                              idColumn: String = "vec_id",
                              vecColumn: String = "embedding",
                              k: Int = 5)
      extends Wrangler {
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, vecColumn))
      val corpus = quantizedRows(df.select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, Array.empty, 0)
        .select("id", "q", "nrm")
      val qs = quantizedRows(queries(df).select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, Array.empty, 0)
        .select(col("id").as("query_id"), col("q").as("qq"),
          col("nrm").as("qnrm"))
      val scored = corpus.crossJoin(broadcast(qs))
        .filter(col("id") =!= col("query_id"))
        .withColumn("cosine", round(qCosine(
          qDot(col("q"), col("qq")), col("nrm"), col("qnrm")), 6))
      ranked(scored, k)
    }
  }

  /** LSH top-k: single `planes`-bit random-hyperplane table; each query
    * scores only the corpus vectors in its bucket (exact re-rank inside
    * the bucket). Returns up to k neighbors per query — fewer when the
    * bucket is sparse, the standard ANN recall trade-off.
    */
  final case class LshCosineTopK(queries: DataFrame => DataFrame,
                                 idColumn: String = "vec_id",
                                 vecColumn: String = "embedding",
                                 dim: Int = 64,
                                 planes: Int = 8,
                                 k: Int = 5)
      extends Wrangler {

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, vecColumn))
      val mat = hyperplaneMatrix(0, planes, dim)
      val corpus = quantizedRows(df.select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, mat, planes)
        .select(col("id"), col("q"), col("nrm"),
          element_at(col("buckets"), 1).as("bucket"))
      val qs = quantizedRows(queries(df).select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, mat, planes)
        .select(col("id").as("query_id"), col("q").as("qq"),
          col("nrm").as("qnrm"), element_at(col("buckets"), 1).as("bucket"))
      val scored = corpus.join(qs, Seq("bucket"))
        .filter(col("id") =!= col("query_id"))
        .withColumn("cosine", round(qCosine(
          qDot(col("q"), col("qq")), col("nrm"), col("qnrm")), 6))
      ranked(scored, k)
    }
  }
}
