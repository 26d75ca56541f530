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

    val assignedOpt = SemDedup.clusterAssignments(df, idColumn, vecColumn,
      nClusters, iterations, cacheCorpus)
    if (assignedOpt.isEmpty)
      return df.withColumn("cluster", lit(null).cast("long"))
        .withColumn("is_dup", lit(null).cast("boolean"))
        .withColumn("dup_of", lit(null).cast("long"))
        .filter(lit(false))
    val assigned = assignedOpt.get

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

    // id integrity raised in-plan (the family's exact-output lens): a
    // duplicate id would fan out the final flag join past row
    // preservation — and identical ids can never pair (the
    // `id_a < id_b` rule excludes them), so their duplication would
    // also go UNFLAGGED. The ids-only count agg doubles as the flag
    // base; `first(cluster)` is THE cluster whenever no raise fires
    val flags = assigned.groupBy(col("id"))
      .agg(count(lit(1)).as("__c"), first(col("cluster")).as("cluster"))
      .select(when(col("__c") > 1, raise_error(lit(
          s"SemDedup: id column `$idColumn` must be unique — " +
            "duplicate ids would fan out the flag join past row " +
            "preservation, and their own pairs are excluded by the " +
            "id_a < id_b rule")).cast("long"))
          .otherwise(col("id")).as("__sid"),
        col("cluster"))
      .join(dups, col("__sid") === col("__did"), "left")
      .select(col("__sid"), col("cluster"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))

    df.join(flags, col(idColumn).cast("long") === col("__sid"))
      .drop("__sid")
  }
}

object SemDedup {

  /** The Lloyd machinery extracted so [[IncrementalSemDedup]]'s index
    * builder shares it verbatim: quantize, hash-pick init, `iterations`
    * rounds of map-side assignment (driver-held centers) + rounded-mean
    * recompute, then the final assignment. Returns None on empty input.
    * Output: `(id, cluster, q, nrm)` — the corpus member index schema.
    */
  private[operators] def clusterAssignments(df: DataFrame,
      idColumn: String, vecColumn: String, nClusters: Int,
      iterations: Int, cacheCorpus: Boolean,
      stabilizeRounds: Int = 0): Option[DataFrame] = {
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
    if (init.isEmpty) return None
    val dim = init.head._1.length

    def assign(centers: Array[(Array[Long], Long)]): DataFrame =
      assignToCenters(quant, centers, dim)

    def recompute(assigned: DataFrame): Array[(Array[Long], Long)] =
      roundedMeanCenters(assigned, nClusters, dim)

    var centers = init
    var it = 0
    while (it < iterations) {
      centers = recompute(assign(centers))
      it += 1
    }
    if (stabilizeRounds == 0) return Some(assign(centers))

    // FIXPOINT stabilization (IncrementalSemDedup's index contract): keep
    // assigning against centers re-derived from the last assignment until
    // the assignment stops changing. At the fixpoint,
    // `assign(roundedMeanCenters(index)) == index`, so any later vector
    // identical to an indexed one provably lands in its twin's cluster —
    // the property that makes incremental known-dup detection exact for
    // identical vectors instead of subject to boundary drift between the
    // clustering's own centers and the re-derived ones
    var a = assign(centers).localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < stabilizeRounds) {
      val a2 = assign(roundedMeanCenters(a, nClusters, dim))
        .localCheckpoint()
      val changed = a.select(col("id"), col("cluster").as("__c1"))
        .join(a2.select(col("id"), col("cluster").as("__c2")), "id")
        .filter(col("__c1") =!= col("__c2")).count()
      a = a2
      round += 1
      if (changed == 0L) converged = true
    }
    require(converged,
      s"SemDedup.clusterAssignments: assignment did not reach a " +
        s"fixpoint within stabilizeRounds=$stabilizeRounds — raise the " +
        "cap (point-mass corpora converge in a few rounds; heavily " +
        "overlapping data may oscillate under rounded-mean centers)")
    Some(a)
  }

  /** Map-side spherical assignment of `(id, q, nrm)` rows to the
    * driver-held centers: first strict max wins == `ORDER BY score DESC
    * NULLS LAST, j ASC` (scores are never NaN: cnrm > 0 and integer dot
    * are finite; 0.0 > -0.0 is false in IEEE, so ±0 ties also keep the
    * smallest j). Zero-norm (dead) centers are never selected.
    */
  private[operators] def assignToCenters(quant: DataFrame,
      centers: Array[(Array[Long], Long)], dim: Int): DataFrame = {
    val spark = quant.sparkSession
    import spark.implicits._
    quant.as[(Long, Array[Long], Long)].map { case (id, q, nrm) =>
      require(q.length == dim,
        s"embedding id=$id has ${q.length} dims, clustering expects $dim")
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
  }

  /** Rounded-mean centers of an `(id, cluster, q, nrm)` assignment:
    * `c_i = (2·s_i + sign(s_i)·n) / (2·n)` in truncating 64-bit
    * division — replayable exactly as DuckDB's `//`. One
    * partial-aggregated `groupBy(cluster)`; the driver holds only the
    * `nClusters × dim` result. Empty clusters keep zero-norm (dead)
    * centers.
    */
  private[operators] def roundedMeanCenters(assigned: DataFrame,
      nClusters: Int, dim: Int): Array[(Array[Long], Long)] = {
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
        val v = (2L * s + java.lang.Long.signum(s) * n) / (2L * n)
        c(i) = v; cnrm += v * v; i += 1
      }
      centers(j) = (c, cnrm)
    }
    centers
  }
}

/** Incremental SemDeDup: score a new batch of embeddings against an
  * already-clustered corpus represented ONLY by its member index
  * `(vec_id, cluster, q, nrm)` — the semantic-dedup counterpart of
  * [[Dedup.IncrementalMinHashLSH]], closing the incremental-ingest
  * family: admitting a batch must never re-cluster or re-score the
  * corpus.
  *
  * The centers are NOT persisted: they derive deterministically from
  * the index as the rounded-mean of each cluster's members (exactly
  * [[SemDedup]]'s recompute step over the final assignment), so the
  * index alone is the corpus representation — one partial-aggregated
  * pass over the index (~`8·dim` bytes/vec, never the raw embeddings)
  * rebuilds the `nClusters × dim` driver matrix per ingest.
  *
  * Per batch: quantize (one compiled pass), assign map-side against
  * the derived centers, then two cluster-keyed joins —
  * batch × corpus-members (linear in the batch: each batch row meets
  * one corpus cell, cells caped by `maxClusterSize`) and the
  * batch × batch self-join (quadratic per batch cell, guarded).
  * Output is row-preserving over the batch: `cluster`, `is_known` (a
  * corpus member in the cluster is at/above `threshold`), `is_dup`
  * (a corpus member OR a smaller-id batch vec matches), `dup_of` (the
  * smallest matching id across both populations; null when kept) —
  * [[SemDedup]]'s min-id rule applied to the corpus ∪ batch
  * population with corpus rows never re-emitted.
  *
  * To fold an admitted batch in, union the batch's `(id, cluster, q,
  * nrm)` rows into the index (re-derived centers then reflect them);
  * re-cluster from scratch at a compaction cadence when drift
  * accumulates — the same trade documented on
  * [[Dedup.IncrementalMinHashLSH.foldBatch]].
  *
  * Recall note: the batch assigns against the RE-DERIVED centers while
  * the index records assignments against the clustering's own final
  * centers — a vector near a cluster boundary can land one cluster
  * over from its corpus twin and miss that pair. This is the same
  * cluster-confinement recall trade SemDeDup itself makes (cross-
  * cluster near-dups are invisible by design); identical and
  * tightly-grouped vectors assign identically because the argmax is a
  * pure function of the vector and the shared center matrix.
  */
final case class IncrementalSemDedup(memberIndex: DataFrame,
                                     idColumn: String = "vec_id",
                                     vecColumn: String = "embedding",
                                     threshold: Double = 0.35,
                                     maxClusterSize: Long = 4000000L)
    extends Wrangler {
  require(maxClusterSize >= 1, "maxClusterSize must be positive")
  override def preservesSampleSize: Boolean = true
  // the index frame is structural input, not a tunable (same contract
  // as IncrementalExactDedup.index / IncrementalMinHashLSH's indexes)
  override def getParams: Seq[(String, Any)] = Seq(
    "idColumn" -> idColumn, "vecColumn" -> vecColumn,
    "threshold" -> threshold, "maxClusterSize" -> maxClusterSize)

  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, Seq(idColumn, vecColumn))
    SparkUtil.validateColumns(memberIndex,
      Seq("vec_id", "cluster", "q", "nrm"))
    Seq("cluster", "is_known", "is_dup", "dup_of").foreach { c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"Output column `$c` already exists in the input; rename it first")
    }
    val spark = df.sparkSession
    import spark.implicits._

    val index = memberIndex.select(col("vec_id").cast("long").as("id"),
      col("cluster").cast("long"), col("q"), col("nrm").cast("long"))

    // derive the centers (and the per-cell corpus populations) from the
    // index: one bounded driver result. Fail loud on an over-cap corpus
    // cell BEFORE any batch work — the batch × members join would hand
    // one task that whole cell
    val meta = index.agg(max("cluster"), count(lit(1)),
      max(size(col("q")))).collect()(0)
    // an empty member index cannot assign the batch to any cluster —
    // silently dropping the batch would violate preservesSampleSize
    // (round-11 ADVICE); same contract as Dsir.IncrementalResample's
    // empty feature-count table
    require(!meta.isNullAt(0),
      "IncrementalSemDedup: empty member index — build memberIndex on a " +
        "non-empty corpus first")
    // prefer the fit's RECORDED k (self-describing index). Behavioral
    // note: this cannot change assignments — clusters absent from the
    // index derive zero-norm centers that assignToCenters skips either
    // way — the recorded k is here for the INTEGRITY check: a recorded
    // k below the observed labels is an edited/corrupt index, raised
    // loud instead of silently truncating the center table
    val maxLabel = meta.getLong(0).toInt
    val nClusters =
      graft.util.SparkUtil.fitParam(memberIndex, "cluster", "nClusters")
        .map { k =>
          require(k > maxLabel,
            s"IncrementalSemDedup: index records fit nClusters=$k but " +
              s"holds a cluster label $maxLabel — the index is corrupt " +
              "or was edited; re-fit memberIndex")
          k.toInt
        }
        .getOrElse(maxLabel + 1)
    val dim = meta.getInt(2)
    val cellSizes = index.groupBy("cluster").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    cellSizes.find(_._2 > maxClusterSize).foreach { case (j, n) =>
      throw new IllegalArgumentException(
        s"IncrementalSemDedup: corpus cluster $j holds $n vectors " +
          s"(> maxClusterSize=$maxClusterSize) — re-cluster the corpus " +
          "with more clusters before incremental ingest")
    }
    val centers = SemDedup.roundedMeanCenters(index, nClusters, dim)

    val quantBatch = quantizedRows(df.select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, Array.empty, 0)
      .select("id", "q", "nrm")
    val assigned = SemDedup.assignToCenters(quantBatch, centers, dim)
      .localCheckpoint() // consumed by both pair joins + the flag build

    // in-plan batch-cell guard (the SemDedup pattern): the batch
    // self-join is quadratic per batch cell
    val bSizes = assigned.groupBy("cluster").agg(count(lit(1)).as("__csz"))
    val guarded = assigned.join(broadcast(bSizes), "cluster")
      .withColumn("cluster", when(col("__csz") > maxClusterSize,
          raise_error(concat(
            lit("IncrementalSemDedup: batch cluster holds "),
            col("__csz").cast("string"),
            lit(s" vectors (> maxClusterSize=$maxClusterSize) — split " +
              "the ingest batch or re-cluster with more clusters")))
          .cast("long"))
        .otherwise(col("cluster")))
      .drop("__csz")

    // corpus matches: min matching corpus id per batch vec
    val mc = guarded.select(col("cluster"), col("id").as("id_b"),
        col("q").as("q_b"), col("nrm").as("nrm_b"))
      .join(index.select(col("cluster"), col("id").as("id_a"),
        col("q").as("q_a"), col("nrm").as("nrm_a")), Seq("cluster"))
      .withColumn("cosine", round(qCosine(
        qDot(col("q_a"), col("q_b")), col("nrm_a"), col("nrm_b")), 6))
      .filter(col("cosine") >= threshold)
      .groupBy("id_b").agg(min("id_a").as("__mc"))
    // batch-internal matches: SemDedup's min smaller-id rule
    val mb = guarded.select(col("cluster"), col("id").as("id_a"),
        col("q").as("q_a"), col("nrm").as("nrm_a")).as("a")
      .join(guarded.select(col("cluster"), col("id").as("id_b"),
        col("q").as("q_b"), col("nrm").as("nrm_b")).as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("id_a") < col("id_b"))
      .withColumn("cosine", round(qCosine(
        qDot(col("q_a"), col("q_b")), col("nrm_a"), col("nrm_b")), 6))
      .filter(col("cosine") >= threshold)
      .groupBy("id_b").agg(min("id_a").as("__mb"))

    // id integrity raised in-plan — the SemDedup lens applied to the
    // batch: duplicate batch ids would fan out the flag join past row
    // preservation and their own batch-internal pairs are excluded by
    // the id_a < id_b rule
    val flags = assigned.groupBy(col("id"))
      .agg(count(lit(1)).as("__c"), first(col("cluster")).as("cluster"))
      .select(when(col("__c") > 1, raise_error(lit(
          s"IncrementalSemDedup: id column `$idColumn` must be " +
            "unique — duplicate batch ids would fan out the flag " +
            "join past row preservation")).cast("long"))
          .otherwise(col("id")).as("__sid"),
        col("cluster"))
      .join(mc.withColumnRenamed("id_b", "__cid"),
        col("__sid") === col("__cid"), "left")
      .join(mb.withColumnRenamed("id_b", "__bid"),
        col("__sid") === col("__bid"), "left")
      .select(col("__sid"), col("cluster"),
        col("__mc").isNotNull.as("is_known"),
        (col("__mc").isNotNull || col("__mb").isNotNull).as("is_dup"),
        coalesce(least(col("__mc"), col("__mb")), col("__mc"),
          col("__mb")).as("dup_of"))

    df.join(flags, col(idColumn).cast("long") === col("__sid"))
      .drop("__sid")
  }
}

object IncrementalSemDedup {
  /** Build the corpus member index `(vec_id, cluster, q, nrm)` by
    * running [[SemDedup]]'s clustering once — WITHOUT the within-cluster
    * pair search (an index build has no use for it). Persist bucketed by
    * `cluster` so the per-ingest batch × members join co-locates.
    */
  /** With `stabilizeRounds > 0` the build iterates past the Lloyd
    * rounds until the assignment is a FIXPOINT of its own re-derived
    * centers (fail-loud if the cap is hit): the persisted index then
    * satisfies `assign(derivedCenters(index)) == index`, closing the
    * boundary-drift recall gap for vectors identical to corpus members.
    * The oracle-gated query keeps `stabilizeRounds = 0` (a dynamic loop
    * is not SQL-replayable); scale runs want stabilization on.
    */
  def memberIndex(corpus: DataFrame, idColumn: String = "vec_id",
                  vecColumn: String = "embedding", nClusters: Int = 8,
                  iterations: Int = 2,
                  cacheCorpus: Boolean = true,
                  stabilizeRounds: Int = 0): DataFrame = {
    SparkUtil.validateColumns(corpus, Seq(idColumn, vecColumn))
    // the fit's k rides the index in column metadata. NOTE the honest
    // scope: empty fit clusters derive zero-norm DEAD centers that
    // assignToCenters skips, so k-from-metadata vs max(label)+1 cannot
    // change any assignment — the metadata exists for the integrity
    // check (a recorded k BELOW an observed label = edited/corrupt
    // index, raised at probe time) and for self-description
    SemDedup.clusterAssignments(corpus, idColumn, vecColumn, nClusters,
        iterations, cacheCorpus, stabilizeRounds)
      .map(a => SparkUtil.withFitParams(
        a.select(col("id").as("vec_id"), col("cluster"), col("q"),
          col("nrm")),
        "cluster", Map("nClusters" -> nClusters.toLong)))
      .getOrElse(corpus.sparkSession.emptyDataFrame)
  }
}
