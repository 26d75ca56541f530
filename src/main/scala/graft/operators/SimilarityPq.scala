package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.functions.Portable._
import graft.util.SparkUtil

/** Product-quantized IVF ANN — the IVFADC architecture (Jégou, Douze,
  * Schmid 2011, "Product Quantization for Nearest Neighbor Search" —
  * public knowledge; FAISS's `IndexIVFPQ` is the reference
  * implementation shape): the corpus member index stores, per vector,
  * only its coarse cluster, `m` sub-quantizer codes and the exact
  * squared norm — the full embedding is DROPPED. At 100 TB this is the
  * difference between an index of `m` small ints per vector (e.g. 8)
  * and one of `dim` longs (e.g. 64): ~30x less index to scan, shuffle
  * and cache, which is why IVF-PQ (not IVF-flat) is what actually runs
  * at billion-vector scale.
  *
  * Search is ADC (asymmetric distance computation): each query builds
  * ONE `m x ksub` lookup table of sub-space dot products against the
  * codebooks, then every candidate scores in `m` table lookups instead
  * of a `dim`-wide dot. The approximate top `k * refine` shortlist is
  * then re-ranked EXACTLY against the full vectors (FAISS's
  * `IndexRefineFlat` composition), so the output cosines are exact and
  * the PQ approximation only affects which candidates reach the
  * shortlist (recall), never the reported scores.
  *
  * Determinism (the cross-engine oracle contract): both quantizers are
  * trainless — the coarse centroids are [[Similarity.pickCentroids]]'s
  * `(md5(id), id)`-smallest corpus vectors, and the per-subspace
  * codebooks are SLICES of the `ksub` vectors under the same pick — so
  * codebook entry `j` of subspace `s` is `picked(j).q[s*dsub ..
  * (s+1)*dsub)`. Code assignment is argmin integer L2 (ties to the
  * smallest entry id), ADC sums are exact integer dots, and the only
  * floating step is the final single divide/sqrt — bit-deterministic in
  * any engine (the [[graft.functions.Portable]] argument).
  */
object SimilarityPq {

  /** Per-subspace PQ codebooks derived from `quant` (columns `id`, `q`,
    * `nrm`): the `ksub` corpus vectors with the smallest `(md5(id), id)`
    * — [[Similarity.pickCentroids]], the same trainless pick as the
    * coarse quantizer — sliced into `m` equal sub-vectors. Returns
    * `[sub](entry)(component)`; entries are 0-based here, stored codes
    * are 1-based (the centroid-id convention, and what the SQL oracle
    * numbers). Empty corpus => empty array. Fails loud when the vector
    * width does not split into `m` equal subspaces.
    */
  private[graft] def codebooks(quant: DataFrame, m: Int, ksub: Int)
      : Array[Array[Array[Long]]] = {
    val picked = Similarity.pickCentroids(quant, ksub)
    if (picked.isEmpty) return Array.empty
    val dim = picked.head._2.length
    require(dim % m == 0,
      s"SimilarityPq: embedding dim=$dim does not split into m=$m equal " +
        "subspaces — configure m to a divisor of the vector width")
    val dsub = dim / m
    picked.foreach { case (j, q, _) =>
      require(q.length == dim,
        s"SimilarityPq: codebook source vector $j has ${q.length} dims, " +
          s"expected $dim — mixed vector widths in the corpus")
    }
    Array.tabulate(m) { s =>
      picked.map { case (_, q, _) => q.slice(s * dsub, (s + 1) * dsub) }
    }
  }

  /** PQ-encode one quantized vector: per subspace, the 1-based index of
    * the codebook entry with the smallest integer L2 distance (ties to
    * the smallest entry).
    */
  private[graft] def encodeCodes(cb: Array[Array[Array[Long]]],
                                     q: Array[Long]): Array[Int] = {
    val m = cb.length
    val dsub = cb(0)(0).length
    require(q.length == m * dsub,
      s"SimilarityPq: vector has ${q.length} dims, the codebooks were " +
        s"derived at ${m * dsub} — mixed vector widths in the corpus")
    Array.tabulate(m) { s =>
      val entries = cb(s)
      var bestJ = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < entries.length) {
        val e = entries(j)
        var d = 0L
        var i = 0
        while (i < dsub) {
          val t = q(s * dsub + i) - e(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      bestJ + 1
    }
  }

  /** The integer scale the projection coefficient α̂ is held at (the
    * [[graft.functions.Portable]] quantization scale). */
  private[graft] val AlphaScale = 10000L

  /** Half-away-from-zero rounding of `num / den` (den > 0) in
    * truncating integer division — the SemDedup lattice convention,
    * bit-identical in any engine. */
  private[graft] def halfAway(num: Long, den: Long): Long =
    (2L * num + (if (num < 0) -den else if (num > 0) den else 0L)) /
      (2L * den)

  /** PROJECTION residual w.r.t. the assigned coarse centroid — the
    * IVFADC decomposition (Jégou et al. 2011 §III quantizes
    * `x − c(x)`) adapted to this family's COSINE geometry: the coarse
    * assignment is by cosine, so the plain difference `x − c` carries
    * the magnitude mismatch between x and an arbitrary corpus-vector
    * centroid — on weakly clustered data it is LARGER than x itself
    * (E‖x−c‖² ≈ E‖x‖² + E‖c‖²; measured: plain-residual recall@5
    * 0.200 vs raw 0.325). Projecting first fixes both regimes:
    *
    *   α̂ = round(S · dot(x, c) / ‖c‖²)     (scaled integer, S = 10⁴)
    *   r  = x − round(α̂ · c / S)           (component-wise, exact)
    *
    * α̂ → 0 on unclustered data recovers raw PQ; α̂ → S on tight
    * clusters is classic IVFADC. Both roundings are half-away-from-
    * zero truncating integer division, so the whole derivation is
    * bit-replayable in SQL. Returns `(α̂, r)`; a zero-norm centroid
    * gets α̂ = 0 (r = x, the raw fallback).
    */
  private[graft] def residualOf(cents: Array[(Int, Array[Long], Long)],
                                q: Array[Long], nrm: Long)
      : (Long, Array[Long]) = {
    val cid = Similarity.rankedClusterIds(cents, q, nrm).head
    val cq = cents(cid - 1)._2
    val cn = cents(cid - 1)._3
    val alpha =
      if (cn == 0L) 0L
      else halfAway(AlphaScale * Similarity.localDot(q, cq), cn)
    (alpha,
      Array.tabulate(q.length)(i => q(i) - halfAway(alpha * cq(i),
        AlphaScale)))
  }

  /** RESIDUAL per-subspace PQ codebooks: derivation stays trainless
    * and integer-exact — but the codebook source rows are the `ksub`
    * hash-pick rows AFTER skipping the first `nlist`: the first
    * `nlist` rows ARE the coarse centroids, and a centroid's residual
    * w.r.t. itself is the zero vector, so reusing them (the raw-PQ
    * pick) would derive a degenerate all-zero codebook (measured:
    * recall@5 0.125 before the skip). Each source row is replaced by
    * its PROJECTION residual ([[residualOf]]) before slicing. Fails
    * loud when the corpus has no rows beyond the centroid pick.
    */
  private[graft] def residualCodebooks(quant: DataFrame,
      cents: Array[(Int, Array[Long], Long)], m: Int, ksub: Int)
      : Array[Array[Array[Long]]] = {
    val picked = Similarity.pickCentroids(quant, cents.length + ksub)
      .drop(cents.length)
    require(picked.nonEmpty,
      s"SimilarityPq: residual codebooks need corpus rows beyond the " +
        s"nlist=${cents.length} centroid pick (a centroid's residual " +
        "is zero — the codebook would be degenerate); use a smaller " +
        "nlist or residual = false on a corpus this small")
    val dim = picked.head._2.length
    require(dim % m == 0,
      s"SimilarityPq: embedding dim=$dim does not split into m=$m equal " +
        "subspaces — configure m to a divisor of the vector width")
    val dsub = dim / m
    val res = picked.map { case (j, q, nrm) =>
      require(q.length == dim,
        s"SimilarityPq: codebook source vector $j has ${q.length} dims, " +
          s"expected $dim — mixed vector widths in the corpus")
      (j, residualOf(cents, q, nrm)._2, nrm)
    }
    Array.tabulate(m) { s =>
      res.map { case (_, r, _) => r.slice(s * dsub, (s + 1) * dsub) }
    }
  }

  /** Lloyd-TRAINED per-subspace codebooks — k-means on the integer
    * lattice, the quality step up from the trainless pick (what FAISS
    * calls training the PQ): init = [[codebooks]]' hash-pick slices;
    * each iteration is ONE corpus pass (typed per-partition partial
    * sums per (subspace, entry, component), merged driver-side — the
    * codebooks are driver-held like any PQ quantizer) followed by a
    * rounded-mean recompute — half away from zero in truncating
    * integer division, the [[SemDedup]] lattice convention, so the SQL
    * oracle replays TRAINING itself exactly. An entry whose cell goes
    * empty keeps its previous value (deterministic, never a 0/0).
    * Iteration cost is linear in corpus size with a `m * ksub * dsub`
    * = dim * ksub driver state — pass `cacheCorpus` upstream so the
    * passes share one materialization.
    */
  private[graft] def trainedCodebooks(quant: DataFrame, m: Int,
                                      ksub: Int, iters: Int,
                                      residualCents:
                                        Option[Array[(Int, Array[Long],
                                          Long)]] = None)
      : Array[Array[Array[Long]]] = {
    // residual mode: init from the residual pick slices and run every
    // Lloyd round over residual vectors — the trained codebooks then
    // live in the same space the member codes are assigned in
    var cb = residualCents match {
      case Some(cents) => residualCodebooks(quant, cents, m, ksub)
      case None => codebooks(quant, m, ksub)
    }
    if (cb.isEmpty || iters == 0) return cb
    val spark = quant.sparkSession
    import spark.implicits._
    val dsub = cb(0)(0).length
    val kk = cb(0).length
    val mm = m
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(cb)
      val (sums, counts) = quant.select("q", "nrm")
        .as[(Array[Long], Long)]
        .mapPartitions { it =>
          val cbv = bc.value
          val s = new Array[Long](mm * kk * dsub)
          val c = new Array[Long](mm * kk)
          it.foreach { case (q0, nrm) =>
            val q = residualCents match {
              case Some(cents) => residualOf(cents, q0, nrm)._2
              case None => q0
            }
            val codes = encodeCodes(cbv, q)
            var ss = 0
            while (ss < mm) {
              val cell = ss * kk + (codes(ss) - 1)
              c(cell) += 1
              var i = 0
              while (i < dsub) {
                s(cell * dsub + i) += q(ss * dsub + i); i += 1
              }
              ss += 1
            }
          }
          Iterator.single((s, c))
        }
        .reduce { (a, b) =>
          var i = 0
          while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
          i = 0
          while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
          a
        }
      val prev = cb
      cb = Array.tabulate(mm) { ss =>
        Array.tabulate(kk) { j =>
          val cell = ss * kk + j
          val cnt = counts(cell)
          if (cnt == 0L) prev(ss)(j)
          else Array.tabulate(dsub) { i =>
            val sv = sums(cell * dsub + i)
            (2 * sv + (if (sv < 0) -cnt else if (sv > 0) cnt else 0L)) /
              (2 * cnt)
          }
        }
      }
    }
    cb
  }

  /** The per-query ADC lookup table, flat `[s * ksubActual + (j-1)]` =
    * exact integer dot of codebook entry `j` of subspace `s` with the
    * query's sub-vector `s`.
    */
  private[graft] def adcTable(cb: Array[Array[Array[Long]]],
                                  qq: Array[Long]): Array[Long] = {
    val m = cb.length
    val kk = cb(0).length
    val dsub = cb(0)(0).length
    val t = new Array[Long](m * kk)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < kk) {
        val e = cb(s)(j)
        var d = 0L
        var i = 0
        while (i < dsub) { d += e(i) * qq(s * dsub + i); i += 1 }
        t(s * kk + j) = d
        j += 1
      }
      s += 1
    }
    t
  }

  /** Shared ADC scan over probe-joined candidate rows (`query_id, id,
    * codes, nrm, qq, qnrm`): one lookup table per (partition, query) —
    * fail-loud past `maxQ` distinct queries, the [[Similarity.ranked]]
    * bounded-queries contract — then `m` table lookups per candidate.
    * Emits `(query_id, id, cosine)` with the deterministic approximate
    * cosine (NaN for zero norms, the qCosine convention).
    */
  private[graft] def adcScan(joined: DataFrame,
      bcCb: org.apache.spark.broadcast
        .Broadcast[Array[Array[Array[Long]]]],
      maxQ: Long, residual: Boolean = false): DataFrame = {
    val spark = joined.sparkSession
    import spark.implicits._
    // residual mode (IVFADC, projection form): codes quantize the
    // projection residual r = x − round(α̂c/S), so the approximate dot
    // decomposes as (α̂/S)·dot(q, c) + dot(q, r^). The centroid term
    // `cdot` is exact, computed once per (query, probed list) on the
    // probe row, and rides the join to every candidate of that list;
    // the per-member α̂ rides the index row; only the residual part
    // goes through the lookup table. Arithmetic stays exact-integer
    // at scale S (α̂·cdot + S·Σtable) until the one final div/sqrt.
    val (cdotCol, alphaCol) =
      if (residual) (col("cdot"), col("alpha"))
      else (lit(0L).as("cdot"), lit(0L).as("alpha"))
    joined.select(col("query_id"), col("id"), col("codes"), col("nrm"),
        col("qq"), col("qnrm"), cdotCol, alphaCol)
      .as[(Long, Long, Array[Int], Long, Array[Long], Long, Long, Long)]
      .mapPartitions { it =>
        val cbv = bcCb.value
        val kk = cbv(0).length
        val res = residual
        val tables = scala.collection.mutable.HashMap.empty[Long, Array[Long]]
        it.map { case (qid, id, codes, nrm, qq, qnrm, cdot, alpha) =>
          if (!tables.contains(qid) && tables.size >= maxQ)
            throw new IllegalStateException(
              s"SimilarityPq: partition saw more than $maxQ distinct " +
                "query ids — the ADC scan holds one lookup table per " +
                "query; raise maxQueriesPerPartition explicitly if a " +
                "query set this large is intended")
          val t = tables.getOrElseUpdate(qid, adcTable(cbv, qq))
          var tsum = 0L
          var s = 0
          while (s < codes.length) {
            tsum += t(s * kk + (codes(s) - 1)); s += 1
          }
          val c =
            if (nrm > 0 && qnrm > 0) {
              if (res)
                (alpha * cdot + AlphaScale * tsum).toDouble /
                  (AlphaScale *
                    math.sqrt(nrm.toDouble * qnrm.toDouble))
              else tsum.toDouble / math.sqrt(nrm.toDouble * qnrm.toDouble)
            } else Double.NaN
          (qid, id, c)
        }
      }.toDF("query_id", "id", "cosine")
  }

  /** Shared exact re-rank of a broadcastable shortlist (`query_id,
    * neighbor_id`) against a full-vector table (`id, q, nrm`) and the
    * query side (`query_id, qq, qnrm`): exact rounded cosines, top-`k`
    * per query, the ANN-family output schema. Only these
    * `queries x k x refine` rows ever touch full vectors.
    *
    * Fail-loud refine-corpus drift guard: a shortlisted `neighbor_id`
    * ABSENT from the full-vector table raises naming the id and query.
    * For the PQ index this misuse class is real — the index
    * deliberately holds no full vectors, so a stale or subset
    * source-of-truth table would otherwise silently drop neighbors
    * (fewer than `k` rows, wrong ranks). Shape: the shortlist is the
    * guard's SPINE — every shortlisted pair must come back from the
    * full-vector join, so the full scan's result (shortlist-sized) is
    * broadcast back under the OUTER-PRESERVED shortlist and an
    * unmatched pair is a concrete null row the plan raises on. The
    * shortlist feeds both sides of that match, so it is cut eagerly
    * once (`localCheckpoint` — shortlist-sized by construction,
    * queries x k x refine; the DSIR/CC-loop eager-builder convention)
    * rather than recomputing the whole upstream ADC/projection scan
    * twice. The corpus is still scanned exactly once, all joins stay
    * BroadcastHashJoin.
    */
  private[graft] def exactRerank(full: DataFrame, short0: DataFrame,
                                 qside: DataFrame, k: Int): DataFrame = {
    val short = short0.localCheckpoint()
    val matched = full
      .join(broadcast(short), col("id") === col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("q"), col("nrm"),
        lit(true).as("__hit"))
    short
      .join(broadcast(matched), Seq("query_id", "neighbor_id"), "left")
      // the guard rides the `nrm` column: nrm feeds the cosine, the
      // cosine is the rank window's ORDER key — evaluated for every
      // row, so the raise can never be pruned away
      .withColumn("nrm", when(col("__hit").isNull,
        raise_error(concat(
          lit("SimilarityPq.exactRerank: shortlisted vec_id "),
          col("neighbor_id").cast("string"),
          lit(" (query "), col("query_id").cast("string"),
          lit(") is absent from the refine table — the full-vector " +
            "source of truth is stale or a subset of the corpus the " +
            "index was fit from; refine against the fit corpus")))
          .cast("long"))
        .otherwise(col("nrm")))
      .join(broadcast(qside), Seq("query_id"))
      .withColumn("cosine", round(qCosine(
        qDot(col("q"), col("qq")), col("nrm"), col("qnrm")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** The first `n` index rows in the shared `(md5(id), id)` pick order,
    * as `(id, q, nrm)` — the rows centroids AND codebooks re-derive
    * from. `src` must carry `id`, `q`, `nrm` (q possibly null off-pick).
    */
  private[graft] def pickRows(src: DataFrame, n: Int)
      : Array[(Long, Array[Long], Long)] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.withColumn("hh", tokenHash(col("id").cast("string")))
      .orderBy("hh", "id").limit(n)
      .select("id", "q", "nrm")
      .as[(Long, Array[Long], Long)].collect()
  }

  /** Centroids (first `nlist` of the pick) and codebooks (slices of the
    * first `ksub`) from one collected pick — EXACTLY the arithmetic
    * [[IvfPqTopK]] uses inline, shared so fit, probe and fold can never
    * drift. Fails loud when a pick row lost its vector (a hand-mangled
    * index) — that row is the index's own self-description.
    */
  private[graft] def derive(picked: Array[(Long, Array[Long], Long)],
                     nlist: Int, m: Int, ksub: Int, who: String)
      : (Array[(Int, Array[Long], Long)], Array[Array[Array[Long]]]) = {
    picked.foreach { case (id, q, _) =>
      require(q != null,
        s"$who: index pick row vec_id=$id carries no vector — the " +
          "hash-smallest max(nlist, ksub) rows are the index's " +
          "self-description (centroids and codebooks re-derive from " +
          "them); a pick row without `q` means the index was built by " +
          "something other than IncrementalIvfPq.memberIndex or was " +
          "mangled in storage")
    }
    val cents = picked.take(nlist).zipWithIndex.map {
      case ((_, q, nrm), i) => (i + 1, q, nrm)
    }
    val cbSrc = picked.take(ksub)
    val dim = cbSrc.head._2.length
    require(dim % m == 0,
      s"$who: embedding dim=$dim does not split into m=$m equal " +
        "subspaces — configure m to a divisor of the vector width")
    val dsub = dim / m
    val cb = Array.tabulate(m) { s =>
      cbSrc.map { case (_, q, _) => q.slice(s * dsub, (s + 1) * dsub) }
    }
    (cents, cb)
  }

  /** [[derive]] for a RESIDUAL index: centroids from the first `nlist`
    * pick rows, codebooks from the PROJECTION RESIDUALS of pick rows
    * `nlist+1 .. nlist+ksub` (a centroid's own residual is zero — the
    * [[residualCodebooks]] degenerate-pick argument), so a residual
    * index keeps `q` on `nlist + ksub` rows instead of
    * `max(nlist, ksub)`.
    */
  private[graft] def deriveRes(picked: Array[(Long, Array[Long], Long)],
                     nlist: Int, m: Int, ksub: Int, who: String)
      : (Array[(Int, Array[Long], Long)], Array[Array[Array[Long]]]) = {
    picked.foreach { case (id, q, _) =>
      require(q != null,
        s"$who: index pick row vec_id=$id carries no vector — a " +
          "residual index self-describes through its nlist + ksub " +
          "hash-smallest rows; a pick row without `q` means the index " +
          "was built by something other than IncrementalIvfPq" +
          ".memberIndex(residual = true) or was mangled in storage")
    }
    val cents = picked.take(nlist).zipWithIndex.map {
      case ((_, q, nrm), i) => (i + 1, q, nrm)
    }
    val cbSrc = picked.slice(nlist, nlist + ksub)
    require(cbSrc.nonEmpty,
      s"$who: residual codebooks need corpus rows beyond the " +
        s"nlist=$nlist centroid pick (a centroid's residual is zero — " +
        "the codebook would be degenerate); use a smaller nlist or a " +
        "raw index on a corpus this small")
    val dim = cbSrc.head._2.length
    require(dim % m == 0,
      s"$who: embedding dim=$dim does not split into m=$m equal " +
        "subspaces — configure m to a divisor of the vector width")
    val dsub = dim / m
    val cb = Array.tabulate(m) { s =>
      cbSrc.map { case (_, q, nrm) =>
        residualOf(cents, q, nrm)._2.slice(s * dsub, (s + 1) * dsub)
      }
    }
    (cents, cb)
  }

  /** Persisted-index IVF-PQ for the ingest loop — the compressed sibling
    * of [[Similarity.IncrementalIvf]]: fit once into a member index of
    * `(vec_id, cluster, codes, nrm, q)` where `q` (the full vector) is
    * kept ONLY for the `max(nlist, ksub)` hash-smallest rows — the rows
    * the coarse centroids and PQ codebooks re-derive from — and is NULL
    * everywhere else. The index is thus still ONE self-describing frame
    * (fit params ride column metadata; the quantizers ride the pick
    * rows), while its bulk is `m` codes + a norm per vector instead of
    * the full embedding — the shape that actually persists at
    * billion-vector scale.
    *
    * Probes never re-read or re-encode the corpus; folds append
    * PQ-encoded batch rows (q = NULL — the displacement guard proves
    * they cannot enter the pick, so self-description is preserved by
    * construction).
    */
  object IncrementalIvfPq {

    /** The pick width an index self-describes through: a residual
      * index needs the `ksub` codebook-source rows BEYOND the `nlist`
      * centroids (their own residuals are zero). */
    private[graft] def pickCount(nlist: Int, ksub: Int,
                                 residual: Boolean): Int =
      if (residual) nlist + ksub else math.max(nlist, ksub)

    private def fitParams(nlist: Int, m: Int, ksub: Int,
                          residual: Boolean): Map[String, Long] =
      Map("nlist" -> nlist.toLong, "m" -> m.toLong, "ksub" -> ksub.toLong,
        "residual" -> (if (residual) 1L else 0L))

    /** Raw (pre-residual) indexes carry no `alpha` column; synthesize
      * the zero coefficient so folds/unions stay schema-stable. A
      * RESIDUAL probe of an alpha-less index is a wiring bug. */
    private[graft] def withAlpha(index: DataFrame, residual: Boolean,
                                 who: String): DataFrame =
      if (index.columns.exists(_.equalsIgnoreCase("alpha"))) index
      else {
        require(!residual,
          s"$who: residual = true but the index carries no `alpha` " +
            "column — it was fit raw (or predates residual encoding); " +
            "re-fit memberIndex(residual = true)")
        index.withColumn("alpha", lit(0L))
      }

    private def emptyIndex(spark: org.apache.spark.sql.SparkSession,
                           nlist: Int, m: Int, ksub: Int,
                           residual: Boolean): DataFrame = {
      import spark.implicits._
      SparkUtil.withFitParams(
        spark.emptyDataset[(Long, Long, Array[Int], Long, Long,
            Array[Long])]
          .toDF("vec_id", "cluster", "codes", "nrm", "alpha", "q"),
        "cluster", fitParams(nlist, m, ksub, residual))
    }

    /** Fit: coarse-assign + PQ-encode every corpus vector; keep `q`
      * only on the pick rows. Returns the index to persist.
      * `residual = true` is the IVFADC projection form ([[residualOf]]):
      * codes quantize `x − round(α̂c/S)`, the per-member α̂ rides the
      * index (`alpha`), and the pick widens to `nlist + ksub`.
      */
    def memberIndex(corpus: DataFrame, idColumn: String = "vec_id",
                    vecColumn: String = "embedding", nlist: Int = 16,
                    m: Int = 8, ksub: Int = 16,
                    cacheCorpus: Boolean = false,
                    residual: Boolean = false): DataFrame = {
      SparkUtil.validateColumns(corpus, Seq(idColumn, vecColumn))
      val spark = corpus.sparkSession
      import spark.implicits._
      val quantLazy = quantizedRows(corpus.select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, Array.empty, 0)
        .select("id", "q", "nrm")
      val quant = if (cacheCorpus) quantLazy.localCheckpoint() else quantLazy
      val picked = pickRows(quant, pickCount(nlist, ksub, residual))
      if (picked.isEmpty)
        return emptyIndex(spark, nlist, m, ksub, residual)
      val (cents, cb) =
        if (residual)
          deriveRes(picked, nlist, m, ksub, "IncrementalIvfPq.memberIndex")
        else derive(picked, nlist, m, ksub, "IncrementalIvfPq.memberIndex")
      val keep = picked.map(_._1).toSet
      val bcCb = spark.sparkContext.broadcast(cb)
      val bcKeep = spark.sparkContext.broadcast(keep)
      val res = residual
      SparkUtil.withFitParams(
        quant.as[(Long, Array[Long], Long)].map { case (id, q, nrm) =>
          val (alpha, enc) =
            if (res) residualOf(cents, q, nrm) else (0L, q)
          (id, Similarity.rankedClusterIds(cents, q, nrm).head.toLong,
            encodeCodes(bcCb.value, enc), nrm, alpha,
            if (bcKeep.value(id)) q else null)
        }.toDF("vec_id", "cluster", "codes", "nrm", "alpha", "q"),
        "cluster", fitParams(nlist, m, ksub, residual))
    }

    /** Ingest new corpus vectors into a fitted PQ index: PQ-encode and
      * coarse-assign them against the RE-DERIVED quantizers and append
      * with `q = NULL`. The same two fold guards as
      * [[Similarity.IncrementalIvf.foldBatch]], with the displacement
      * guard widened to the index's [[pickCount]] (either pick changing
      * would silently re-derive DIFFERENT quantizers than the stored
      * codes were encoded with): duplicate ids raise; a batch id whose
      * hash enters the pick raises (re-fit on the merged corpus
      * instead). `residual` must match the fit (rides the fit params).
      */
    def foldBatch(index0: DataFrame, batch: DataFrame,
                  idColumn: String = "vec_id",
                  vecColumn: String = "embedding",
                  nlist: Int = 16, m: Int = 8,
                  ksub: Int = 16, residual: Boolean = false): DataFrame = {
      SparkUtil.validateColumns(index0,
        Seq("vec_id", "cluster", "codes", "nrm", "q"))
      SparkUtil.validateColumns(batch, Seq(idColumn, vecColumn))
      SparkUtil.requireFitParam(index0, "cluster", "nlist", nlist.toLong,
        "IncrementalIvfPq.foldBatch")
      SparkUtil.requireFitParam(index0, "cluster", "m", m.toLong,
        "IncrementalIvfPq.foldBatch")
      SparkUtil.requireFitParam(index0, "cluster", "ksub", ksub.toLong,
        "IncrementalIvfPq.foldBatch")
      SparkUtil.requireFitParam(index0, "cluster", "residual",
        if (residual) 1L else 0L, "IncrementalIvfPq.foldBatch")
      val index = withAlpha(index0, residual, "IncrementalIvfPq.foldBatch")
      val spark = index.sparkSession
      import spark.implicits._
      val slim = index.select(col("vec_id").as("id"), col("q"), col("nrm"))
      val nPick = pickCount(nlist, ksub, residual)
      val picked = pickRows(slim, nPick)
      require(picked.nonEmpty,
        "IncrementalIvfPq.foldBatch: empty member index — fit " +
          "memberIndex on a non-empty corpus first")
      val (cents, cb) =
        if (residual)
          deriveRes(picked, nlist, m, ksub, "IncrementalIvfPq.foldBatch")
        else derive(picked, nlist, m, ksub, "IncrementalIvfPq.foldBatch")
      val bcCb = spark.sparkContext.broadcast(cb)
      // the pick cutoff (largest (md5, id) among the picked rows) — any
      // new id at or below it would change a pick; an index still
      // smaller than the pick means EVERY new id enters it
      val cut = slim.withColumn("hh", tokenHash(col("id").cast("string")))
        .orderBy("hh", "id").limit(nPick)
        .select("hh", "id").as[(Long, Long)].collect().last
      val underFit = picked.length < nPick
      val res = residual
      val assigned = quantizedRows(batch.select(col(idColumn).as("id"),
          col(vecColumn)), "id", vecColumn, Array.empty, 0)
        .select("id", "q", "nrm").as[(Long, Array[Long], Long)]
        .map { case (id, q, nrm) =>
          val (alpha, enc) =
            if (res) residualOf(cents, q, nrm) else (0L, q)
          (id, Similarity.rankedClusterIds(cents, q, nrm).head.toLong,
            encodeCodes(bcCb.value, enc), nrm, alpha, null: Array[Long])
        }
        .toDF("vec_id", "cluster", "codes", "nrm", "alpha", "q")
      val dup = index.select(col("vec_id")).withColumn("__dup", lit(true))
      val hh = tokenHash(col("vec_id").cast("string"))
      val displaces = lit(underFit) || hh < cut._1 ||
        (hh === cut._1 && col("vec_id") < cut._2)
      val batchN = count(lit(1)).over(
        Window.partitionBy("vec_id"))
      SparkUtil.withFitParams(index.unionByName(assigned
        .withColumn("__bn", batchN)
        .join(dup, Seq("vec_id"), "left")
        .withColumn("cluster", when(col("__dup") || col("__bn") > 1,
            raise_error(concat(
              lit("IncrementalIvfPq.foldBatch: vec_id "),
              col("vec_id").cast("string"),
              lit(" is duplicated (already in the index, or repeated " +
                "within the batch) — duplicate ids would fan out " +
                "every probe's candidate set")))
            .cast("long"))
          .when(displaces,
            raise_error(concat(
              lit("IncrementalIvfPq.foldBatch: vec_id "),
              col("vec_id").cast("string"),
              lit(" would displace the centroid/codebook pick (its " +
                s"md5 hash enters the $nPick smallest) — " +
                "the stored codes would silently mismatch the " +
                "re-derived quantizers at probe time; re-fit " +
                "memberIndex on the merged corpus instead")))
            .cast("long"))
          .otherwise(col("cluster")))
        .drop("__dup", "__bn")),
        "cluster", fitParams(nlist, m, ksub, residual))
    }
  }

  /** Probe a persisted [[IncrementalIvfPq.memberIndex]] with a batch of
    * query vectors — identical ADC arithmetic to [[IvfPqTopK]], with
    * the corpus replaced by its compressed index (centroids and
    * codebooks re-derive from the index's pick rows; the corpus is
    * never re-read or re-encoded).
    *
    * `refineWith`: the exact-re-rank side. `Some(corpus)` joins the
    * `k * refine` shortlist back to the FULL vectors (the
    * source-of-truth table the index was fit from — PQ indexes don't
    * hold full vectors, that is their point) for exact output cosines,
    * the [[IvfPqTopK]] refine contract. `None` returns the ADC scan's
    * own top-k with APPROXIMATE cosines (rounded to 6, deterministic) —
    * for when the full-vector table is genuinely out of reach at probe
    * time; rank quality is then bounded by the PQ distortion alone.
    * Output schema matches the ANN family either way.
    */
  final case class IncrementalIvfPqTopK(memberIndex: DataFrame,
                                        refineWith: Option[DataFrame] = None,
                                        idColumn: String = "vec_id",
                                        vecColumn: String = "embedding",
                                        nlist: Int = 16,
                                        m: Int = 8,
                                        ksub: Int = 16,
                                        nprobe: Int = 4,
                                        k: Int = 5,
                                        refine: Int = 4,
                                        maxQueriesPerPartition: Long =
                                          1000000L,
                                        residual: Boolean = false)
      extends Wrangler {
    require(nprobe >= 1, "nprobe must be >= 1")
    require(k >= 1, "k must be >= 1")
    require(refine >= 1, "refine must be >= 1")
    // structural inputs (index, refine corpus) are not tunables
    override def getParams: Seq[(String, Any)] = Seq(
      "idColumn" -> idColumn, "vecColumn" -> vecColumn,
      "nlist" -> nlist, "m" -> m, "ksub" -> ksub, "nprobe" -> nprobe,
      "k" -> k, "refine" -> refine,
      "maxQueriesPerPartition" -> maxQueriesPerPartition,
      "residual" -> residual)

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, vecColumn))
      SparkUtil.validateColumns(memberIndex,
        Seq("vec_id", "cluster", "codes", "nrm", "q"))
      SparkUtil.requireFitParam(memberIndex, "cluster", "nlist",
        nlist.toLong, "IncrementalIvfPqTopK")
      SparkUtil.requireFitParam(memberIndex, "cluster", "m", m.toLong,
        "IncrementalIvfPqTopK")
      SparkUtil.requireFitParam(memberIndex, "cluster", "ksub",
        ksub.toLong, "IncrementalIvfPqTopK")
      SparkUtil.requireFitParam(memberIndex, "cluster", "residual",
        if (residual) 1L else 0L, "IncrementalIvfPqTopK")
      val spark = df.sparkSession
      import spark.implicits._
      val index = IncrementalIvfPq.withAlpha(memberIndex, residual,
          "IncrementalIvfPqTopK")
        .select(col("vec_id").cast("long").as("id"),
          col("cluster").cast("long"), col("codes"),
          col("nrm").cast("long"), col("alpha").cast("long"), col("q"))
      val meta = index.agg(max("cluster"), count(lit(1))).collect()(0)
      require(!meta.isNullAt(0),
        "IncrementalIvfPqTopK: empty member index — fit memberIndex " +
          "on a non-empty corpus first")
      require(meta.getLong(0) <= nlist,
        s"IncrementalIvfPqTopK: index holds cluster id " +
          s"${meta.getLong(0)} > nlist=$nlist — the index was fit " +
          "with a different nlist")
      val picked = pickRows(
        index.select(col("id"), col("q"), col("nrm")),
        IncrementalIvfPq.pickCount(nlist, ksub, residual))
      val (cents, cb) =
        if (residual)
          deriveRes(picked, nlist, m, ksub, "IncrementalIvfPqTopK")
        else derive(picked, nlist, m, ksub, "IncrementalIvfPqTopK")
      val bcCb = spark.sparkContext.broadcast(cb)
      val res = residual

      val qs = quantizedRows(df.select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, Array.empty, 0)
        .select("id", "q", "nrm")
      val probes = qs.as[(Long, Array[Long], Long)]
        .flatMap { case (id, q, nrm) =>
          Similarity.rankedClusterIds(cents, q, nrm).take(nprobe)
            .map(c => (id, q, nrm, c.toLong,
              if (res) Similarity.localDot(q, cents(c - 1)._2) else 0L))
        }
        .toDF("query_id", "qq", "qnrm", "cluster", "cdot")

      val approx = adcScan(index.drop("q").join(probes, Seq("cluster"))
        .filter(col("id") =!= col("query_id")),
        bcCb, maxQueriesPerPartition, residual = res)

      refineWith match {
        case None =>
          // ADC-approximate top-k (rounded for the stable output
          // contract; determinism: exact integer ADC + one div/sqrt)
          Similarity.ranked(approx, k, maxQueriesPerPartition)
            .withColumn("cosine", round(col("cosine"), 6))
        case Some(corpus) =>
          SparkUtil.validateColumns(corpus, Seq(idColumn, vecColumn))
          val short = Similarity.ranked(approx, k * refine,
              maxQueriesPerPartition)
            .select(col("query_id"), col("neighbor_id"))
          val full = quantizedRows(corpus.select(col(idColumn).as("id"),
            col(vecColumn)), "id", vecColumn, Array.empty, 0)
            .select("id", "q", "nrm")
          val qside = qs.select(col("id").as("query_id"),
            col("q").as("qq"), col("nrm").as("qnrm"))
          exactRerank(full, short, qside, k)
      }
    }
  }

  /** IVF-PQ top-k with exact refine: coarse-quantize the corpus into
    * `nlist` inverted lists, PQ-encode every member to `m` codes +
    * exact norm (dropping the full vector from the index — the
    * compression the operator exists for), ADC-score each query's
    * `nprobe` probed lists, shortlist the approximate top `k * refine`,
    * and re-rank that shortlist EXACTLY against the full vectors.
    * Output schema matches the ANN family
    * (`query_id, rank, neighbor_id, cosine` — cosines exact).
    *
    * Scale shape: the centroids and codebooks are tiny and driver-held
    * (any IVF-PQ index works this way); corpus encode is an
    * embarrassingly parallel typed map; the probe join is an equi-join
    * on cluster id scanning the CODES index, never full vectors; the
    * ADC table is built once per (partition, query) and candidates
    * score in `m` lookups; and only `queries x k x refine` rows — a
    * broadcastable shortlist — ever touch the full-vector table again,
    * through a broadcast semi-join re-rank. `refine` is the recall
    * knob: at 100 TB you raise it (or `nprobe`) instead of ever scoring
    * full vectors in the scan.
    */
  final case class IvfPqTopK(queries: DataFrame => DataFrame,
                             idColumn: String = "vec_id",
                             vecColumn: String = "embedding",
                             nlist: Int = 16,
                             nprobe: Int = 4,
                             m: Int = 8,
                             ksub: Int = 16,
                             k: Int = 5,
                             refine: Int = 4,
                             cacheCorpus: Boolean = false,
                             maxQueriesPerPartition: Long = 1000000L,
                             train: Int = 0,
                             residual: Boolean = false)
      extends Wrangler {
    require(nlist >= 1, "nlist must be >= 1")
    require(nprobe >= 1, "nprobe must be >= 1")
    require(m >= 1, "m must be >= 1")
    require(ksub >= 1, "ksub must be >= 1")
    require(k >= 1, "k must be >= 1")
    require(refine >= 1, "refine must be >= 1")
    require(train >= 0, "train must be >= 0")
    override def preservesSampleSize: Boolean = false

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, vecColumn))
      val spark = df.sparkSession
      import spark.implicits._
      val quantLazy = quantizedRows(df.select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, Array.empty, 0)
        .select("id", "q", "nrm")
      val quant = if (cacheCorpus) quantLazy.localCheckpoint() else quantLazy

      val cents = Similarity.pickCentroids(quant, nlist)
      if (cents.isEmpty)
        // empty corpus: no lists to probe — empty result, same schema
        return spark.emptyDataset[(Long, Long, Long, Double)]
          .toDF("query_id", "rank", "neighbor_id", "cosine")
      // train = 0 is the trainless hash-pick; train > 0 runs that many
      // Lloyd rounds over the corpus (one pass each — use cacheCorpus).
      // residual = the IVFADC-proper decomposition: codebooks live in
      // (and training runs over) residual space `x − c(x)`
      val cb =
        if (train > 0) trainedCodebooks(quant, m, ksub, train,
          if (residual) Some(cents) else None)
        else if (residual) residualCodebooks(quant, cents, m, ksub)
        else codebooks(quant, m, ksub)
      val bcCb = spark.sparkContext.broadcast(cb)
      val res = residual

      // PQ member index: cluster + m codes + exact norm (+ the scaled
      // projection coefficient α̂ in residual mode — one extra long);
      // the full vector is DROPPED here — it is only ever seen again
      // by the shortlist re-rank below
      val index = quant.as[(Long, Array[Long], Long)]
        .map { case (id, q, nrm) =>
          val (alpha, enc) =
            if (res) {
              val (a, r) = residualOf(cents, q, nrm)
              (a, r)
            } else (0L, q)
          (id, Similarity.rankedClusterIds(cents, q, nrm).head.toLong,
            encodeCodes(bcCb.value, enc), nrm, alpha)
        }
        .toDF("id", "cluster", "codes", "nrm", "alpha")

      val qs = quantizedRows(queries(df).select(col(idColumn).as("id"),
        col(vecColumn)), "id", vecColumn, Array.empty, 0)
        .select("id", "q", "nrm")
      // residual mode: the exact centroid term dot(q, c) computes ONCE
      // per (query, probed list) here and rides the join to every
      // candidate of that list
      val probes = qs.as[(Long, Array[Long], Long)]
        .flatMap { case (id, q, nrm) =>
          Similarity.rankedClusterIds(cents, q, nrm).take(nprobe)
            .map(c => (id, q, nrm, c.toLong,
              if (res) Similarity.localDot(q, cents(c - 1)._2) else 0L))
        }
        .toDF("query_id", "qq", "qnrm", "cluster", "cdot")

      // ADC scan: the probe join carries the query vector to the
      // candidate rows; each partition lazily builds ONE lookup table
      // per distinct query (m*ksub integer dots), then every candidate
      // scores in m table lookups ([[adcScan]])
      val approx = adcScan(index.join(probes, Seq("cluster"))
        .filter(col("id") =!= col("query_id")),
        bcCb, maxQueriesPerPartition, residual = res)

      // approximate shortlist, then EXACT re-rank: only these
      // queries*k*refine ids ever touch the full-vector table again
      // (maxQueriesPerPartition threads through — the knob the adcScan
      // error names must also govern the rank prune downstream)
      val short = Similarity.ranked(approx, k * refine,
          maxQueriesPerPartition)
        .select(col("query_id"), col("neighbor_id"))
      val qside = qs.select(col("id").as("query_id"), col("q").as("qq"),
        col("nrm").as("qnrm"))
      exactRerank(quant, short, qside, k)
    }
  }
}
