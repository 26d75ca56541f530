package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Properties of the round's two composition rungs: the SRP
  * reduce-then-search ANN (projection prefilter + exact refine) and
  * epoch-aware upsampling. Value-level correctness is pinned by the
  * DuckDB oracles on `ann_srp` / `mix_epochs`.
  */
class ProjectionEpochSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def embs(n: Int, dim: Int = 16) = (0 until n).map { i =>
    (i.toLong, Array.tabulate(dim)(j => math.sin(i * 31 + j).toFloat))
  }.toDF("vec_id", "embedding")

  private def collectTopK(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      .toSeq

  test("srp: shortlist wider than the corpus == brute force exactly " +
    "(the refine contract — projection only gates the shortlist)") {
    val data = embs(50)
    val qf = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(org.apache.spark.sql.functions.col("vec_id") < 4)
    val brute = collectTopK(Similarity.CosineTopK(qf, k = 5)
      .transform(data))
    val srp = collectTopK(Projection.SrpTopK(qf, rdim = 8, k = 5,
      refine = 20).transform(data))
    assert(srp == brute)
  }

  test("srp: default shape reaches useful recall, deterministic across " +
    "reruns and repartition; raising refine helps") {
    val data = embs(200)
    val qf = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val brute = collectTopK(Similarity.CosineTopK(qf, k = 5)
      .transform(data)).map(r => (r._1, r._3)).toSet
    def run(df: org.apache.spark.sql.DataFrame, refine: Int) =
      collectTopK(Projection.SrpTopK(qf, rdim = 8, k = 5,
        refine = refine).transform(df))
    val got = run(data, 4)
    val recall = (got.map(r => (r._1, r._3)).toSet & brute).size.toDouble /
      brute.size
    assert(recall >= 0.5, s"recall@5 $recall too low")
    assert(run(data, 4) == got)
    assert(run(data.repartition(7), 4) == got)
    val wide = run(data, 40).map(r => (r._1, r._3)).toSet
    assert((wide & brute).size >= (got.map(r => (r._1, r._3)).toSet &
      brute).size)
  }

  test("epoch upsample: realized multiplicities — whole epochs exact, " +
    "fractional in {floor, floor+1} with the expected mass close, drop " +
    "at 0.0, and nesting (raising w only ADDS copies)") {
    val docs = (0 until 400).map { i =>
      val lang = Seq("en", "zh", "fr", "de")(i % 4)
      (i.toLong, lang)
    }.toDF("doc_id", "lang")
    def run(epochs: Map[String, Double]) =
      Sampling.EpochUpsample(epochs, defaultEpochs = 1.0)
        .transform(docs)
        .select("doc_id", "lang", "n_epochs", "epoch")
        .as[(Long, String, Long, Long)].collect().toSeq
    val out = run(Map("en" -> 1.0, "zh" -> 2.4, "fr" -> 0.0, "de" -> 3.0))
    val byLang = out.groupBy(_._2)
    // en: exactly one copy each; de: exactly three; fr: gone
    assert(byLang("en").map(_._1).distinct.length == 100)
    assert(byLang("en").length == 100)
    assert(byLang("de").length == 300)
    assert(byLang("de").forall(_._3 == 3L))
    assert(!byLang.contains("fr"))
    // zh: per-doc 2 or 3 copies, epoch numbers contiguous from 1
    val zh = byLang("zh").groupBy(_._1)
    assert(zh.values.forall(rs => rs.length == 2 || rs.length == 3))
    zh.values.foreach(rs => assert(rs.map(_._4).sorted ==
      (1L to rs.length.toLong)))
    val zhTotal = byLang("zh").length
    assert(zhTotal >= 200 && zhTotal <= 300)
    assert(math.abs(zhTotal - 240) < 40, s"zh mass $zhTotal far from 2.4x")
    // nesting: zh 2.4 -> 2.7 only ADDS (same doc/epoch pairs survive)
    val out2 = run(Map("en" -> 1.0, "zh" -> 2.7, "fr" -> 0.0,
      "de" -> 3.0))
    val zhPairs = byLang("zh").map(r => (r._1, r._4)).toSet
    val zhPairs2 = out2.filter(_._2 == "zh").map(r => (r._1, r._4)).toSet
    assert(zhPairs.subsetOf(zhPairs2))
  }

  test("epoch upsample: guards — negative, NaN, and over-cap epoch " +
    "counts fail loud at construction") {
    intercept[IllegalArgumentException] {
      Sampling.EpochUpsample(Map("en" -> -1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.EpochUpsample(Map("en" -> Double.NaN))
    }
    intercept[IllegalArgumentException] {
      Sampling.EpochUpsample(Map("en" -> 500.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.EpochUpsample(Map.empty, defaultEpochs = 101.0)
    }
    // explicit cap raise is honored
    Sampling.EpochUpsample(Map("en" -> 500.0), maxEpochs = 1000.0)
  }

  test("epoch interleave composition: each COPY gets an independent " +
    "permutation position — repeats of a doc spread across shards " +
    "instead of clustering") {
    val docs = (0 until 200).map(i => (i.toLong, "hi"))
      .toDF("doc_id", "lang")
    val up = Sampling.EpochUpsample(Map("hi" -> 3.0)).transform(docs)
      .withColumn("copy_id", org.apache.spark.sql.functions
        .col("doc_id") * 100 + org.apache.spark.sql.functions
        .col("epoch"))
    val out = InterleaveShuffle(numShards = 8, idColumn = "copy_id")
      .transform(up)
      .select("doc_id", "epoch", "global_pos", "shard")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.length == 600)
    assert(out.map(_._3).sorted == (0L until 600L)) // exact permutation
    // spread: the 3 copies of a doc land in >1 shard for nearly all
    // docs (clustered copies would share a shard); md5 makes this
    // deterministic, so the bound is a fixture fact, not a flake
    val spread = out.groupBy(_._1).values
      .count(rs => rs.map(_._4).distinct.length > 1)
    assert(spread >= 180, s"only $spread/200 docs spread shards")
  }

  test("epoch upsample: deterministic across repartition; zero-copy " +
    "rows emit NOTHING (the sequence(1,0) step-inference hazard)") {
    val docs = (0 until 60).map(i => (i.toLong, if (i % 2 == 0) "keep"
      else "drop")).toDF("doc_id", "lang")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.EpochUpsample(Map("keep" -> 2.0, "drop" -> 0.0))
        .transform(df)
        .select("doc_id", "epoch").as[(Long, Long)].collect().sorted.toSeq
    val base = run(docs)
    assert(base.length == 60) // 30 keep-docs x 2 copies
    assert(base.forall(_._1 % 2 == 0))
    assert(run(docs.repartition(7)) == base)
  }
}
