package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Properties of the IVF-PQ ANN operator: the exact-refine contract
  * (full probe + wide shortlist == brute force exactly), recall of the
  * default config against brute force, deterministic code assignment,
  * and the fail-loud edges. Value-level correctness (codebook pick, ADC
  * arithmetic, shortlist/re-rank tie-breaks) is pinned by the DuckDB
  * oracle on `ann_ivf_pq`, which replays every step in SQL.
  */
class SimilarityPqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def embs(n: Int, dim: Int = 16) = (0 until n).map { i =>
    (i.toLong, Array.tabulate(dim)(j => math.sin(i * 31 + j).toFloat))
  }.toDF("vec_id", "embedding")

  private def collectTopK(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      .toSeq

  test("ivf-pq: full probe + shortlist wider than the corpus == brute " +
    "force exactly (the refine contract: PQ only gates the shortlist, " +
    "exact re-rank orders it)") {
    val data = embs(50)
    val qf = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(org.apache.spark.sql.functions.col("vec_id") < 4)
    val brute = collectTopK(Similarity.CosineTopK(qf, k = 5)
      .transform(data))
    val pq = collectTopK(SimilarityPq.IvfPqTopK(qf,
      nlist = 4, nprobe = 4, m = 4, ksub = 8, k = 5, refine = 20)
      .transform(data))
    assert(pq == brute)
  }

  test("ivf-pq: default-shape config reaches useful recall vs brute " +
    "force, deterministic across reruns and repartition") {
    val data = embs(200)
    val qf = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val brute = collectTopK(Similarity.CosineTopK(qf, k = 5)
      .transform(data)).map(r => (r._1, r._3)).toSet
    def run(df: org.apache.spark.sql.DataFrame) =
      collectTopK(SimilarityPq.IvfPqTopK(qf,
        nlist = 8, nprobe = 4, m = 4, ksub = 16, k = 5, refine = 4)
        .transform(df))
    val got = run(data)
    // probe covers half the lists; PQ distortion is bounded by the
    // trainless codebooks — demand a usable overlap, not exactness
    val hit = got.map(r => (r._1, r._3)).toSet
    val recall = (hit & brute).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall@5 $recall too low")
    assert(run(data) == got)
    assert(run(data.repartition(7)) == got)
  }

  test("ivf-pq: raising refine is monotone toward brute force on the " +
    "probed candidate set") {
    val data = embs(120)
    val qf = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(org.apache.spark.sql.functions.col("vec_id") < 6)
    val brute = collectTopK(Similarity.CosineTopK(qf, k = 5)
      .transform(data)).map(r => (r._1, r._3)).toSet
    def recallAt(refine: Int): Double = {
      val got = collectTopK(SimilarityPq.IvfPqTopK(qf,
        nlist = 6, nprobe = 6, m = 4, ksub = 12, k = 5, refine = refine)
        .transform(data)).map(r => (r._1, r._3)).toSet
      (got & brute).size.toDouble / brute.size
    }
    // full probe: candidates = corpus, so a wide-enough refine is exact
    assert(recallAt(60) == 1.0)
    assert(recallAt(8) >= recallAt(1))
  }

  test("ivf-pq: dim not divisible by m fails loud naming both") {
    val e = intercept[IllegalArgumentException] {
      SimilarityPq.IvfPqTopK(df => df.limit(2), m = 5)
        .transform(embs(20, dim = 16)).collect()
    }
    assert(e.getMessage.contains("dim=16"))
    assert(e.getMessage.contains("m=5"))
  }

  test("ivf-pq: empty corpus yields the empty ANN-schema result") {
    val out = SimilarityPq.IvfPqTopK(df => df.limit(0))
      .transform(embs(0))
    assert(out.columns.toSeq ==
      Seq("query_id", "rank", "neighbor_id", "cosine"))
    assert(out.count() == 0)
  }

  test("encodeCodes: argmin ties break to the smallest entry; width " +
    "mismatch fails loud") {
    // two identical entries: code must be the first (1-based)
    val cb = Array(Array(Array(1L, 2L), Array(1L, 2L), Array(9L, 9L)))
    assert(SimilarityPq.encodeCodes(cb, Array(1L, 2L)).toSeq == Seq(1))
    val e = intercept[IllegalArgumentException] {
      SimilarityPq.encodeCodes(cb, Array(1L, 2L, 3L))
    }
    assert(e.getMessage.contains("dims"))
  }

  test("ivf-pq: index members carry codes, never the full vector (the " +
    "compression invariant — codes length m, values in [1, ksub])") {
    val data = embs(40)
    val quant = graft.functions.Portable.quantizedRows(
      data.select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding")),
      "id", "embedding", Array.empty, 0).select("id", "q", "nrm")
    val cb = SimilarityPq.codebooks(quant, m = 4, ksub = 8)
    assert(cb.length == 4 && cb.forall(_.length == 8))
    val codes = quant.as[(Long, Array[Long], Long)].collect().map {
      case (_, q, _) => SimilarityPq.encodeCodes(cb, q)
    }
    assert(codes.forall(c => c.length == 4 &&
      c.forall(j => j >= 1 && j <= 8)))
  }
}
