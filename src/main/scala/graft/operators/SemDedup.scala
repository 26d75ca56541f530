package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.functions.Portable._
import graft.util.SparkUtil

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): spherical k-means over the embedding column, then
  * within-cluster cosine-similarity pruning — a document is a semantic
  * duplicate when a lower-id document in the SAME cluster has cosine at
  * or above `threshold`. The clustering is what makes semantic dedup
  * tractable at corpus scale: candidate pairs are confined to clusters,
  * so the quadratic pair search runs on `n/k`-sized cells instead of the
  * corpus (choose `nClusters ≈ corpus / targetClusterSize`; the
  * published recipe uses ~`n / 10k` clusters).
  *
  * Every step is bit-deterministic across engines (the DuckDB oracle
  * replays the full clustering):
  *   - vectors are integer-quantized ([[graft.functions.Portable]]);
  *   - init centers = the `nClusters` corpus vectors with the smallest
  *     `(md5-hash(id), id)` — the same reproducible pick as
  *     [[Similarity.IvfTopK]], no RNG;
  *   - spherical assignment maximizes `dot(x, c) / sqrt(|c|²)` (the
  *     `1/sqrt(|x|²)` factor is constant per row and cannot change the
  *     argmax), ties → smallest cluster index, zero-norm centers are
  *     never selected; all-integer dot, one IEEE div + sqrt;
  *   - recomputed centers are ROUNDED-MEAN quantized vectors:
  *     `c_i = (2·s_i + sign(s_i)·n) / (2·n)` in truncating 64-bit
  *     division (identical in Scala `/` and DuckDB `//`), so centers
  *     stay in quantized range — no float accumulation order anywhere,
  *     and no overflow: `|c_i| ≤ max|q_i| ~ 1e4` regardless of cluster
  *     size, sums bounded by `1e4 · n`;
  *   - an empty cluster keeps a zero-norm (dead) center.
  *
  * Scale shape: each Lloyd iteration is one map-side assignment
  * (centers are a driver-held `nClusters × dim` long matrix, broadcast
  * via closure) plus one partial-aggregated `groupBy(cluster)` of
  * per-dimension sums — the shuffle carries at most
  * `partitions × nClusters` rows of `dim` longs, and the driver holds
  * only the `nClusters × dim` result. The pair join shuffles on the
  * cluster key; its parallelism IS `nClusters`, so a corpus-scale run
  * wants thousands of clusters (which the paper wants anyway for
  * quality). [[clusterGuard]] turns an over-`maxClusterSize` cell into
  * an in-plan error instead of a silent quadratic task.
  *
  * Output: input rows (row-preserving) + `cluster`, `is_dup`, `dup_of`
  * (smallest same-cluster id at/above threshold; null when kept).
  */
final case class SemDedup(idColumn: String = "vec_id",
                          vecColumn: String = "embedding",
                          nClusters: Int = 8,
                          iterations: Int = 2,
                          threshold: Double = 0.35,
                          maxClusterSize: Long = 4000000L,
                          cacheCorpus: Boolean = true)
    extends Wrangler {
  require(nClusters >= 1, "nClusters must be positive")
  require(iterations >= 0, "iterations must be >= 0")
  require(maxClusterSize >= 1, "maxClusterSize must be positive")
  override def preservesSampleSize: Boolean = true

  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, Seq(idColumn, vecColumn))
    Seq("cluster", "is_dup", "dup_of").foreach { c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"Output column `$c` already exists in the input; rename it first")
    }
    val spark = df.sparkSession
    import spark.implicits._

    val quantLazy = quantizedRows(df.select(col(idColumn).as("id"),
      col(vecColumn)), "id", vecColumn, Array.empty, 0)
      .select("id", "q", "nrm")
    // consumed (iterations + 1) assignment passes + both pair-join sides:
    // cut the lineage once by default (same trade as IvfTopK.cacheCorpus)
    val quant = if (cacheCorpus) quantLazy.localCheckpoint() else quantLazy

    // init: nClusters smallest (md5-hash, id) — driver-held, bounded
    val init = quant
      .withColumn("hh", tokenHash(col("id").cast("string")))
      .orderBy("hh", "id").limit(nClusters)
      .select("q", "nrm")
      .as[(Array[Long], Long)].collect()
    if (init.isEmpty)
      return df.withColumn("cluster", lit(null).cast("long"))
        .withColumn("is_dup", lit(null).cast("boolean"))
        .withColumn("dup_of", lit(null).cast("long"))
        .filter(lit(false))
    val dim = init.head._1.length

    def assign(centers: Array[(Array[Long], Long)]): DataFrame =
      quant.as[(Long, Array[Long], Long)].map { case (id, q, nrm) =>
        require(q.length == dim,
          s"embedding id=$id has ${q.length} dims, clustering expects $dim")
        // first strict max wins == ORDER BY score DESC NULLS LAST, j ASC
        // (scores are never NaN: cnrm > 0 and integer dot are finite;
        // 0.0 > -0.0 is false in IEEE, so ±0 ties also keep smallest j)
        var best = -1
        var bestScore = 0.0
        var j = 0
        while (j < centers.length) {
          val (c, cnrm) = centers(j)
          if (cnrm > 0L) {
            var dot = 0L
            var i = 0
            while (i < dim) { dot += q(i) * c(i); i += 1 }
            val score = dot.toDouble / math.sqrt(cnrm.toDouble)
            if (best < 0 || score > bestScore) { best = j; bestScore = score }
          }
          j += 1
        }
        (id, (if (best < 0) 0 else best).toLong, q, nrm)
      }.toDF("id", "cluster", "q", "nrm")

    def recompute(assigned: DataFrame): Array[(Array[Long], Long)] = {
      val sumCols = (0 until dim).map(i =>
        sum(element_at(col("q"), i + 1)).as(s"s$i"))
      val rows = assigned.groupBy("cluster")
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect()
      val centers = Array.fill(nClusters)((new Array[Long](dim), 0L))
      rows.foreach { r =>
        val j = r.getLong(0).toInt
        val n = r.getLong(1)
        val c = new Array[Long](dim)
        var cnrm = 0L
        var i = 0
        while (i < dim) {
          val s = r.getLong(2 + i)
          // rounded mean, half away from zero, in truncating integer
          // division — replayable exactly as DuckDB's `//`
          val v = (2L * s + java.lang.Long.signum(s) * n) / (2L * n)
          c(i) = v; cnrm += v * v; i += 1
        }
        centers(j) = (c, cnrm)
      }
      centers
    }

    var centers = init
    var it = 0
    while (it < iterations) {
      centers = recompute(assign(centers))
      it += 1
    }
    val assigned = assign(centers)

    // in-plan cluster-size guard wrapping the join key itself, so it
    // cannot be pruned: an over-limit cell means the quadratic pair cell
    // no longer fits a task — fail loud with remediation, never a silent
    // straggler (the ValueBucketing.populationGuard pattern)
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("__csz"))
    val guarded = assigned.join(broadcast(sizes), "cluster")
      .withColumn("cluster", when(col("__csz") > maxClusterSize,
          raise_error(concat(
            lit(s"SemDedup: cluster holds "), col("__csz").cast("string"),
            lit(s" vectors (> maxClusterSize=$maxClusterSize) — the " +
              "within-cluster pair search would be quadratic in that " +
              "cell; raise `nClusters` (target corpus/nClusters ≈ " +
              "thousands) or `maxClusterSize` explicitly")))
          .cast("long"))
        .otherwise(col("cluster")))
      .drop("__csz")

    val left = guarded.select(col("cluster"), col("id").as("id_a"),
      col("q").as("q_a"), col("nrm").as("nrm_a"))
    val right = guarded.select(col("cluster"), col("id").as("id_b"),
      col("q").as("q_b"), col("nrm").as("nrm_b"))
    val dups = left.join(right,
        left("cluster") === right("cluster") && col("id_a") < col("id_b"))
      .withColumn("cosine", round(qCosine(
        qDot(col("q_a"), col("q_b")), col("nrm_a"), col("nrm_b")), 6))
      .filter(col("cosine") >= threshold)
      .groupBy("id_b").agg(min("id_a").as("dup_of"))
      .withColumnRenamed("id_b", "__did")

    val flags = assigned.select(col("id").as("__sid"), col("cluster"))
      .join(dups, col("__sid") === col("__did"), "left")
      .select(col("__sid"), col("cluster"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))

    df.join(flags, col(idColumn).cast("long") === col("__sid"))
      .drop("__sid")
  }
}
