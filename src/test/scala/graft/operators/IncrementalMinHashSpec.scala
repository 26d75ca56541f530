package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics pins for [[Dedup.IncrementalMinHashLSH]] — the incremental
  * near-dup probe against persisted signature/band indexes. The DuckDB
  * oracle covers the fixture-table behavior of `dedup_incr_minhash`;
  * these tests pin the class structure on engineered texts: identical
  * text => identical signature => est_jaccard 1.0 through every band,
  * token-disjoint text => no candidate at all.
  */
class IncrementalMinHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // token-disjoint corpus docs: no shared shingles anywhere
  private def corpus = Seq(
    (1L, "a1 a2 a3 a4 a5 a6"),
    (2L, "b1 b2 b3 b4 b5 b6"),
    (3L, "c1 c2 c3 c4 c5 c6")).toDF("doc_id", "text")

  private def indexes = {
    val sigs = Dedup.IncrementalMinHashLSH.signatureIndex(corpus)
    (Dedup.IncrementalMinHashLSH.bandIndex(sigs), sigs)
  }

  test("batch doc matching corpus content -> known pair with the corpus " +
    "doc as id_a at est_jaccard 1.0; unrelated batch doc -> no pair") {
    val (bandIdx, sigIdx) = indexes
    val batch = Seq(
      (10L, "a1 a2 a3 a4 a5 a6"), // exact content of corpus doc 1
      (11L, "z1 z2 z3 z4 z5 z6")) // token-disjoint from everything
      .toDF("doc_id", "text")
    val out = Dedup.IncrementalMinHashLSH(bandIdx, sigIdx)
      .transform(batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(out.toSeq == Seq((1L, 10L, 1.0, true)))
  }

  test("batch-internal near-dups keep MinHashLSHDedup's id_a < id_b " +
    "semantics and known = false") {
    val (bandIdx, sigIdx) = indexes
    val batch = Seq(
      (20L, "p1 p2 p3 p4 p5 p6"),
      (21L, "p1 p2 p3 p4 p5 p6"), // identical to 20, corpus-disjoint
      (22L, "q1 q2 q3 q4 q5 q6"))
      .toDF("doc_id", "text")
    val out = Dedup.IncrementalMinHashLSH(bandIdx, sigIdx)
      .transform(batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(out.toSeq == Seq((20L, 21L, 1.0, false)))
  }

  test("the batch-side bucket cap drops batch-hot band buckets like " +
    "MinHashLSHDedup's maxBucket; the corpus index keeps probing") {
    val (bandIdx, sigIdx) = indexes
    // 4 identical batch docs: every band bucket holds 4 > maxBucket=3,
    // so ALL batch-internal pairs vanish; the corpus probe of doc 1's
    // content rides the INDEX buckets (size 1 each) and still pairs
    val batch = (20L to 23L)
      .map(i => (i, "a1 a2 a3 a4 a5 a6")).toDF("doc_id", "text")
    val out = Dedup.IncrementalMinHashLSH(bandIdx, sigIdx, maxBucket = 3L)
      .transform(batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(out.forall(_._3), s"expected only known pairs, got ${out.toSeq}")
    assert(out.map(_._2).sorted.toSeq == Seq(20L, 21L, 22L, 23L))
    assert(out.forall(_._1 == 1L))
  }

  test("corpus-hot buckets are dropped at INDEX BUILD time: a template " +
    "shared by the whole corpus never floods the probe join") {
    val hotCorpus = (1L to 5L)
      .map(i => (i, "t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val sigs = Dedup.IncrementalMinHashLSH.signatureIndex(hotCorpus)
    val bandIdx = Dedup.IncrementalMinHashLSH.bandIndex(sigs,
      maxBucket = 4L)
    assert(bandIdx.count() == 0L) // every bucket held 5 > 4
    val out = Dedup.IncrementalMinHashLSH(bandIdx, sigs, maxBucket = 4L)
      .transform(Seq((10L, "t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text"))
    assert(out.count() == 0L)
  }

  test("fold recipe: unioning an admitted batch into both indexes makes " +
    "its content known to the next batch") {
    val (bandIdx, sigIdx) = indexes
    val batchSigs = Dedup.IncrementalMinHashLSH.signatureIndex(
      Seq((10L, "n1 n2 n3 n4 n5 n6")).toDF("doc_id", "text"))
    val sigIdx2 = sigIdx.unionByName(batchSigs)
    val bandIdx2 = Dedup.IncrementalMinHashLSH.bandIndex(sigIdx2)
    val out = Dedup.IncrementalMinHashLSH(bandIdx2, sigIdx2)
      .transform(Seq((20L, "n1 n2 n3 n4 n5 n6")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(out.toSeq == Seq((10L, 20L, true)))
  }

  test("foldBatch: both band-merge policies admit the batch; the next " +
    "ingest finds its content as known pairs") {
    val (bandIdx, sigIdx) = indexes
    val admitted = Seq((10L, "n1 n2 n3 n4 n5 n6")).toDF("doc_id", "text")
    val next = Seq((20L, "n1 n2 n3 n4 n5 n6")).toDF("doc_id", "text")
    for (rebuild <- Seq(false, true)) {
      val (sig2, band2) = Dedup.IncrementalMinHashLSH.foldBatch(
        sigIdx, bandIdx, admitted, rebuildBands = rebuild)
      // the signature index grew by exactly the batch
      assert(sig2.count() == sigIdx.count() + 1L)
      val out = Dedup.IncrementalMinHashLSH(band2, sig2)
        .transform(next)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
      assert(out.toSeq == Seq((10L, 20L, true)), s"rebuild=$rebuild")
    }
    // rebuild=true equals the manual full-rebuild recipe exactly
    val (sig2, band2) = Dedup.IncrementalMinHashLSH.foldBatch(
      sigIdx, bandIdx, admitted, rebuildBands = true)
    val manual = Dedup.IncrementalMinHashLSH.bandIndex(
      sigIdx.unionByName(
        Dedup.IncrementalMinHashLSH.signatureIndex(admitted)))
    assert(band2.collect().map(_.toString).sorted.toSeq ==
      manual.collect().map(_.toString).sorted.toSeq)
  }

  test("null and too-short batch text produce no signature rows and no " +
    "pairs — never a null-key join explosion") {
    val (bandIdx, sigIdx) = indexes
    val batch = Seq((30L, Option.empty[String]), (31L, Some("one two")))
      .toDF("doc_id", "text")
    assert(Dedup.IncrementalMinHashLSH(bandIdx, sigIdx)
      .transform(batch).count() == 0L)
  }
}
