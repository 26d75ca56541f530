package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.functions.Portable._
import graft.util.SparkUtil

/** Signed random projection (SRP) — Johnson–Lindenstrauss-style
  * dimensionality reduction with a DETERMINISTIC ±1 matrix (the sign of
  * the [[graft.functions.Portable.hyperplane]] constant family, so any
  * engine regenerates the same matrix from the same literals — public
  * knowledge: Achlioptas 2003's database-friendly ±1 projections, and
  * Charikar 2002's SimHash is the 1-bit special case this engine
  * already ships for dedup).
  *
  * At 100 TB the point is the reduce-then-search architecture: a
  * `dim=1536` embedding column is ~6 KB/row to scan, shuffle and score;
  * its `rdim=16` projection is 128 bytes. Projected dot products are
  * 100x cheaper, so the SCAN runs entirely in projected space and only
  * a `queries x k x refine` shortlist ever touches the full vectors
  * again (exact re-rank, the same refine contract as
  * [[SimilarityPq.IvfPqTopK]]). Projection preserves angles in
  * expectation (JL), so `refine` is the recall knob.
  *
  * Arithmetic stays exact-integer end to end: quantized components are
  * |q_i| <= ~1e4-scale longs, a ±1 row sum is bounded by dim * 1e4, and
  * the rdim-wide projected dot by rdim * (dim * 1e4)^2 — far inside
  * Long for any real embedding width; the single IEEE div/sqrt at the
  * end is the family's bit-deterministic step.
  */
object Projection {

  /** Entry (j, i) of the deterministic ±1 projection matrix. */
  private[operators] def signPlane(j: Int, i: Int): Long =
    if (hyperplane(j, i) >= 0) 1L else -1L

  /** SRP top-k with exact refine: project corpus and queries to `rdim`
    * signed sums, brute-force the top `k * refine` shortlist in
    * PROJECTED space (cheap, broadcast queries), then re-rank the
    * shortlist EXACTLY on the full vectors — output cosines exact,
    * schema matches the ANN family (`query_id, rank, neighbor_id,
    * cosine`).
    *
    * Scale shape: projection is an embarrassingly parallel typed map;
    * the projected scan scores `rdim`-wide integer dots through the
    * shared codegen'd [[graft.functions.Portable.qDot]]; the map-side
    * top-k prune ([[Similarity.ranked]]) bounds the rank shuffle at
    * partitions x queries x k*refine narrow rows; and the full-vector
    * table is only touched by the broadcast shortlist re-rank.
    * Complementary to [[SimilarityPq.IvfPqTopK]]: SRP needs no
    * clustering or codebooks (nothing to fit or persist) and scans the
    * whole reduced corpus; IVF-PQ prunes the scan itself via inverted
    * lists — compose them (project, then IVF-PQ the projections) when
    * both matter.
    */
  final case class SrpTopK(queries: DataFrame => DataFrame,
                           idColumn: String = "vec_id",
                           vecColumn: String = "embedding",
                           rdim: Int = 16,
                           k: Int = 5,
                           refine: Int = 4,
                           planeOffset: Int = 0)
      extends Wrangler {
    require(rdim >= 1, "rdim must be >= 1")
    require(k >= 1, "k must be >= 1")
    require(refine >= 1, "refine must be >= 1")
    require(planeOffset >= 0, "planeOffset must be >= 0")
    override def preservesSampleSize: Boolean = false

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, vecColumn))
      val spark = df.sparkSession
      import spark.implicits._
      val quant = quantizedRows(df.select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, Array.empty, 0)
        .select("id", "q", "nrm")
      val (rd, off) = (rdim, planeOffset)
      def project(src: DataFrame): DataFrame =
        src.as[(Long, Array[Long], Long)].map { case (id, q, _) =>
          val rp = Array.tabulate(rd) { j =>
            var s = 0L
            var i = 0
            while (i < q.length) { s += q(i) * signPlane(off + j, i); i += 1 }
            s
          }
          var n2 = 0L
          rp.foreach(v => n2 += v * v)
          (id, rp, n2)
        }.toDF("id", "rp", "rpnrm")

      val proj = project(quant)
      val projQ = project(quantizedRows(
        queries(df).select(col(idColumn).as("id"), col(vecColumn)),
        "id", vecColumn, Array.empty, 0).select("id", "q", "nrm"))
        .select(col("id").as("query_id"), col("rp").as("qrp"),
          col("rpnrm").as("qrpnrm"))

      // projected-space scan: rdim-wide integer dots, codegen'd
      val scored = proj.crossJoin(broadcast(projQ))
        .filter(col("id") =!= col("query_id"))
        .withColumn("cosine", qCosine(
          qDot(col("rp"), col("qrp")), col("rpnrm"), col("qrpnrm")))
      val short = Similarity.ranked(scored, k * refine)
        .select(col("query_id"), col("neighbor_id"))

      // exact re-rank on the full vectors — only the shortlist touches
      // them (the shared [[SimilarityPq.exactRerank]] refine contract)
      val qside = quantizedRows(
        queries(df).select(col(idColumn).as("id"), col(vecColumn)),
        "id", vecColumn, Array.empty, 0)
        .select(col("id").as("query_id"), col("q").as("qq"),
          col("nrm").as("qnrm"))
      SimilarityPq.exactRerank(quant, short, qside, k)
    }
  }
}
