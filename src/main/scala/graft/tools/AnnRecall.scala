package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Recall instrumentation for the ANN family: top-k of each approximate
  * strategy compared against the exact brute-force top-k over the same
  * embeddings table and query set as the bench queries (vec_id < 8,
  * k = 5). Prints mean recall@k per strategy so the recall/cost knobs
  * (tables, planes, nlist, nprobe) are comparable in one table —
  * COVERAGE.md records the numbers.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = (df: DataFrame) => df.filter(col("vec_id") < 8)

    def topSets(out: DataFrame): Map[Long, Set[Long]] = out
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

    val truth = topSets(Similarity.CosineTopK(queries, k = k).transform(embs))

    def recall(label: String, out: DataFrame): Unit = {
      val approx = topSets(out)
      // queries with NO approximate hits (empty buckets) count as recall 0
      val r = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
      println(f"[ann-recall] $label%-34s recall@$k = $r%.3f")
    }

    recall("lsh 1x8 (bench ann_lsh)",
      Similarity.LshCosineTopK(queries, k = k).transform(embs))
    recall("lsh 4x6 (bench ann_lsh_multi)",
      Similarity.LshCosineTopK(queries, planes = 6, tables = 4, k = k)
        .transform(embs))
    recall("lsh 8x6",
      Similarity.LshCosineTopK(queries, planes = 6, tables = 8, k = k)
        .transform(embs))
    recall("ivf nlist=16 nprobe=4 (bench ann_ivf)",
      Similarity.IvfTopK(queries, k = k).transform(embs))
    recall("ivf nlist=16 nprobe=8",
      Similarity.IvfTopK(queries, nprobe = 8, k = k).transform(embs))
    recall("ivf-pq m=8 ksub=16 refine=4 (bench ann_ivf_pq)",
      graft.operators.SimilarityPq.IvfPqTopK(queries, k = k)
        .transform(embs))
    recall("ivf-pq refine=16",
      graft.operators.SimilarityPq.IvfPqTopK(queries, refine = 16, k = k)
        .transform(embs))
    recall("ivf-pq TRAINED 2 rounds refine=4 (ann_ivf_pq_t)",
      graft.operators.SimilarityPq.IvfPqTopK(queries, train = 2, k = k,
        cacheCorpus = true).transform(embs))
    recall("ivf-pq TRAINED 2 rounds refine=16",
      graft.operators.SimilarityPq.IvfPqTopK(queries, train = 2,
        refine = 16, k = k, cacheCorpus = true).transform(embs))
    recall("ivf-pq RESIDUAL refine=4 (ann_ivf_pq_res)",
      graft.operators.SimilarityPq.IvfPqTopK(queries, k = k,
        residual = true).transform(embs))
    recall("ivf-pq RESIDUAL refine=16",
      graft.operators.SimilarityPq.IvfPqTopK(queries, refine = 16, k = k,
        residual = true).transform(embs))
    recall("ivf-pq RESIDUAL TRAINED 2 rounds refine=4",
      graft.operators.SimilarityPq.IvfPqTopK(queries, train = 2, k = k,
        residual = true, cacheCorpus = true).transform(embs))
    recall("ivf-pq RESIDUAL TRAINED 2 rounds refine=16",
      graft.operators.SimilarityPq.IvfPqTopK(queries, train = 2,
        refine = 16, k = k, residual = true, cacheCorpus = true)
        .transform(embs))
    // OPQ-lite probe (r15 verdict #8): a fixed deterministic dimension
    // permutation — the transpose interleave, subspace s gets source
    // dims {s, m+s, 2m+s, ...} — applied identically to the whole
    // corpus (queries included) before PQ. Cosine is
    // permutation-invariant, so the exact truth is unchanged; only the
    // SUBSPACE COMPOSITION differs. If consecutive dims carried
    // correlated structure, scattering them would rebalance
    // per-subspace variance (the effect full OPQ learns a rotation
    // for); on isotropic embeddings it should be a wash.
    locally {
      val dim = embs.select(org.apache.spark.sql.functions.size(
        col("embedding"))).as[Int].head()
      val m = 8
      val perm = (0 until dim).map(i => (i % m) * (dim / m) + i / m)
      val embsPerm = embs.withColumn("embedding",
        org.apache.spark.sql.functions.array(
          perm.map(j => col("embedding").getItem(j)): _*))
      recall("ivf-pq PERMUTED refine=4 (OPQ-lite probe)",
        graft.operators.SimilarityPq.IvfPqTopK(queries, k = k)
          .transform(embsPerm))
      recall("ivf-pq PERMUTED refine=16",
        graft.operators.SimilarityPq.IvfPqTopK(queries, refine = 16,
          k = k).transform(embsPerm))
      recall("ivf-pq RESIDUAL PERMUTED refine=4",
        graft.operators.SimilarityPq.IvfPqTopK(queries, k = k,
          residual = true).transform(embsPerm))
      recall("ivf-pq RES TRAINED PERMUTED refine=4",
        graft.operators.SimilarityPq.IvfPqTopK(queries, train = 2, k = k,
          residual = true, cacheCorpus = true).transform(embsPerm))
    }

    recall("srp rdim=16 refine=4 (bench ann_srp)",
      graft.operators.Projection.SrpTopK(queries, k = k).transform(embs))
    recall("srp rdim=16 refine=16",
      graft.operators.Projection.SrpTopK(queries, refine = 16, k = k)
        .transform(embs))

    // incremental probe: the bench split (corpus = vec_id >= 8 fitted
    // into the member index, batch = vec_id < 8 probing it) has its own
    // exact truth — brute force over the SAME disjoint corpus
    val corpus = embs.filter(col("vec_id") >= 8)
    val batch = embs.filter(col("vec_id") < 8)
    // CosineTopK scores transform's input (the corpus) against the
    // queries frame — exactly the split truth, batch-vs-batch excluded
    // by construction
    val incrTruth = topSets(
      Similarity.CosineTopK(_ => batch, k = k).transform(corpus))
    val incrOut = topSets(Similarity.IncrementalIvfTopK(
        Similarity.IncrementalIvf.memberIndex(corpus), k = k)
      .transform(batch))
    val ri = incrTruth.map { case (q, t) =>
      incrOut.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / incrTruth.size
    println(f"[ann-recall] ivf incr nlist=16 nprobe=4 (ann_ivf_incr)  " +
      f"recall@$k = $ri%.3f")
    val pqIncrRes = topSets(graft.operators.SimilarityPq
      .IncrementalIvfPqTopK(
        graft.operators.SimilarityPq.IncrementalIvfPq.memberIndex(
          corpus, residual = true),
        refineWith = Some(corpus), k = k, residual = true)
      .transform(batch))
    val rr = incrTruth.map { case (q, t) =>
      pqIncrRes.getOrElse(q, Set.empty).intersect(t).size.toDouble /
        t.size
    }.sum / incrTruth.size
    println(f"[ann-recall] ivf-pq incr RESIDUAL (ann_pq_incr_res)    " +
      f"recall@$k = $rr%.3f")

    // ---- fold-drift (round-12 verdict #7): recall@5 BEFORE vs AFTER
    // several foldBatch ingests WITHOUT refit. Folds cannot displace
    // centroids (enforced in-plan), but they bloat the fit's inverted
    // lists unevenly — a folded vector near a cell boundary lands in a
    // list the probe may not visit. Protocol: hold out ~25% of the
    // corpus as 3 ingest batches (the nlist smallest-hash ids stay in
    // the fit so no fold displaces), measure probe recall against the
    // exact truth over WHATEVER the index holds at each step.
    {
      val allIds = corpus.select(col("vec_id")).as[Long].collect().sorted
      val mustFit = allIds
        .sortBy(id => (graft.functions.Portable.tokenHashLocal(
          id.toString), id))
        .take(16).toSet
      val foldIds = allIds.filter(id => id % 4 == 3 && !mustFit(id))
      // tiny corpora can leave nothing to fold (grouped(0) would throw)
      val foldBatches =
        if (foldIds.isEmpty) Seq.empty
        else foldIds.grouped(math.max(1, (foldIds.length + 2) / 3)).toSeq
      val fit0 = corpus.filter(!col("vec_id").isInCollection(foldIds))

      def recallAt(index: DataFrame, held: DataFrame): Double = {
        val t = topSets(Similarity.CosineTopK(_ => batch, k = k)
          .transform(held))
        val o = topSets(Similarity.IncrementalIvfTopK(index, k = k)
          .transform(batch))
        t.map { case (q, s) =>
          o.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
        }.sum / t.size
      }

      var idx = Similarity.IncrementalIvf.memberIndex(fit0)
        .localCheckpoint()
      println(f"[ann-recall] ivf incr FOLD-DRIFT fit(${allIds.length -
        foldIds.length}) recall@$k = ${recallAt(idx, fit0)}%.3f")
      var held = fit0
      foldBatches.zipWithIndex.foreach { case (ids, i) =>
        val b = corpus.filter(col("vec_id").isInCollection(ids))
        idx = Similarity.IncrementalIvf.foldBatch(idx, b)
          .localCheckpoint()
        held = held.unionByName(b)
        println(f"[ann-recall] ivf incr FOLD-DRIFT after fold ${i + 1} " +
          f"(+${ids.length}) recall@$k = ${recallAt(idx, held)}%.3f")
      }
      // the compaction move: a full refit over the same grown corpus —
      // the number the folded index should be compared against
      val refit = Similarity.IncrementalIvf.memberIndex(held)
      println(f"[ann-recall] ivf incr FOLD-DRIFT refit(${allIds.length}) " +
        f"recall@$k = ${recallAt(refit, held)}%.3f")
    }

    // ---- the SAME fold-drift protocol for the COMPRESSED index: PQ
    // folds additionally encode new vectors against the FIT's
    // codebooks (fit-time slices), so drift here measures list bloat
    // AND stale-codebook distortion together; the displacement guard
    // covers max(nlist, ksub), so the held-in pick is wider
    {
      import graft.operators.SimilarityPq
      val allIds = corpus.select(col("vec_id")).as[Long].collect().sorted
      val mustFit = allIds
        .sortBy(id => (graft.functions.Portable.tokenHashLocal(
          id.toString), id))
        .take(16).toSet // max(nlist, ksub) at the bench config
      val foldIds = allIds.filter(id => id % 4 == 3 && !mustFit(id))
      val foldBatches =
        if (foldIds.isEmpty) Seq.empty
        else foldIds.grouped(math.max(1, (foldIds.length + 2) / 3)).toSeq
      val fit0 = corpus.filter(!col("vec_id").isInCollection(foldIds))

      def recallAt(index: DataFrame, held: DataFrame): Double = {
        val t = topSets(Similarity.CosineTopK(_ => batch, k = k)
          .transform(held))
        val o = topSets(SimilarityPq.IncrementalIvfPqTopK(index,
          refineWith = Some(held), k = k).transform(batch))
        t.map { case (q, s) =>
          o.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
        }.sum / t.size
      }

      var idx = SimilarityPq.IncrementalIvfPq.memberIndex(fit0)
        .localCheckpoint()
      println(f"[ann-recall] ivf-pq incr FOLD-DRIFT fit(${allIds.length -
        foldIds.length}) recall@$k = ${recallAt(idx, fit0)}%.3f")
      var held = fit0
      foldBatches.zipWithIndex.foreach { case (ids, i) =>
        val b = corpus.filter(col("vec_id").isInCollection(ids))
        idx = SimilarityPq.IncrementalIvfPq.foldBatch(idx, b)
          .localCheckpoint()
        held = held.unionByName(b)
        println(f"[ann-recall] ivf-pq incr FOLD-DRIFT after fold " +
          f"${i + 1} (+${ids.length}) recall@$k = ${recallAt(idx, held)}%.3f")
      }
      val refit = SimilarityPq.IncrementalIvfPq.memberIndex(held)
      println(f"[ann-recall] ivf-pq incr FOLD-DRIFT " +
        f"refit(${allIds.length}) recall@$k = ${recallAt(refit, held)}%.3f")
    }
    spark.stop()
  }
}
