package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics pins for [[SemDedup]] over tiny literal frames; the DuckDB
  * oracle (`dedup_semantic`, a full SQL replay of the clustering) covers
  * the 500-vector fixture behavior.
  */
class SemDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  // two tight direction groups plus one outlier: k-means with k=2 must
  // separate the groups whatever the hash-picked init was, and the
  // within-cluster prune must keep exactly the smallest id per group
  private val xish = Seq(
    10L -> Seq(1.0f, 0.01f, 0f, 0f),
    11L -> Seq(0.99f, 0.02f, 0f, 0f),
    12L -> Seq(1.01f, 0.00f, 0f, 0f))
  private val yish = Seq(
    20L -> Seq(0.01f, 1.0f, 0f, 0f),
    21L -> Seq(0.02f, 0.98f, 0f, 0f))

  test("two direction groups cluster apart; within-cluster near-dups " +
    "keep the smallest id") {
    val out = SemDedup(nClusters = 2, iterations = 2, threshold = 0.9)
      .transform(vecs(xish ++ yish: _*))
      .select("vec_id", "cluster", "is_dup", "dup_of")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out.size == 5)
    // same group => same cluster, different groups => different clusters
    assert(out(10L)._1 == out(11L)._1 && out(11L)._1 == out(12L)._1)
    assert(out(20L)._1 == out(21L)._1)
    assert(out(10L)._1 != out(20L)._1)
    // keep-smallest-id: 10 and 20 survive, the rest point at them
    assert(out(10L) == (out(10L)._1, false, None))
    assert(out(20L) == (out(20L)._1, false, None))
    assert(out(11L)._2 && out(11L)._3.contains(10L))
    assert(out(12L)._2 && out(12L)._3.contains(10L))
    assert(out(21L)._2 && out(21L)._3.contains(20L))
  }

  test("row-preserving: input columns ride through, every input id " +
    "appears exactly once") {
    val df = vecs(xish: _*).withColumn("payload",
      org.apache.spark.sql.functions.lit("p"))
    val out = SemDedup(nClusters = 2, iterations = 1).transform(df)
    assert(out.columns.toSeq ==
      Seq("vec_id", "embedding", "payload", "cluster", "is_dup", "dup_of"))
    assert(out.select("vec_id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 11L, 12L))
  }

  test("duplicate ids raise in-plan instead of fanning out the flag " +
    "join (their own pairs are excluded by the id_a < id_b rule)") {
    val dup = vecs(10L -> Seq(1.0f, 0f, 0f, 0f),
      10L -> Seq(0f, 1.0f, 0f, 0f), 11L -> Seq(1.0f, 0.01f, 0f, 0f))
    val e = intercept[Exception] {
      SemDedup(nClusters = 2, iterations = 1).transform(dup).collect()
    }
    assert(e.getMessage.contains("must be unique"))
    val idx = IncrementalSemDedup.memberIndex(
      vecs(xish: _*), nClusters = 2, iterations = 1)
    val e2 = intercept[Exception] {
      IncrementalSemDedup(idx).transform(dup).collect()
    }
    assert(e2.getMessage.contains("must be unique"))
  }

  test("deterministic: two runs produce identical assignments and flags") {
    val df = vecs(xish ++ yish: _*)
    def run() = SemDedup(nClusters = 3, iterations = 2, threshold = 0.5)
      .transform(df).select("vec_id", "cluster", "is_dup")
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    assert(run() == run())
  }

  test("iterations = 0 skips Lloyd rounds but still clusters against " +
    "the deterministic init pick") {
    val out = SemDedup(nClusters = 2, iterations = 0, threshold = 0.9)
      .transform(vecs(xish ++ yish: _*))
    assert(out.count() == 5)
    assert(out.select("cluster").distinct().count() <= 2)
  }

  test("zero-norm vectors: never crash, land in a deterministic live " +
    "cluster, and their NaN cosine counts as >= threshold (Spark's and " +
    "DuckDB's shared NaN-is-largest comparison), so they read as " +
    "duplicates of every clustermate — the oracle replays this exactly") {
    // init here picks id 30 (zero, dead center) and id 11 by hash order,
    // so every vector scores only the live center: ONE cluster
    val out = SemDedup(nClusters = 2, iterations = 1, threshold = 0.9)
      .transform(vecs((xish ++ Seq(
        30L -> Seq(0f, 0f, 0f, 0f),
        31L -> Seq(0f, 0f, 0f, 0f))): _*))
      .select("vec_id", "cluster", "is_dup", "dup_of")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out.values.map(_._1).toSet.size == 1)
    // 10 is the smallest id: the sole survivor
    assert(out(10L) == (out(10L)._1, false, None))
    assert(out(30L)._2 && out(30L)._3.contains(10L))
    assert(out(31L)._2 && out(31L)._3.contains(10L))
  }

  test("maxClusterSize guard raises in-plan with remediation text") {
    val df = vecs(xish: _*)
    val e = intercept[Exception](
      SemDedup(nClusters = 1, iterations = 1, maxClusterSize = 2L)
        .transform(df).collect())
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(m => m.contains("maxClusterSize") &&
      m.contains("nClusters")), e)
  }

  test("empty corpus yields an empty frame with the full output schema") {
    val out = SemDedup().transform(
      vecs().select($"vec_id", $"embedding"))
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("vec_id", "embedding", "cluster", "is_dup", "dup_of"))
  }

  test("reserved output columns are rejected") {
    val df = vecs(xish: _*)
      .withColumn("cluster", org.apache.spark.sql.functions.lit(1))
    val e = intercept[IllegalArgumentException](SemDedup().transform(df))
    assert(e.getMessage.contains("cluster"))
  }

  // ---- IncrementalSemDedup ----

  test("incremental: corpus matches are known with the corpus id; new " +
    "directions are new; batch-internal pairs keep the smallest batch " +
    "id — and corpus members are never re-emitted") {
    val corpus = vecs(xish ++ yish: _*)
    val idx = IncrementalSemDedup.memberIndex(corpus, nClusters = 2,
      iterations = 2)
    val batch = vecs(
      100L -> Seq(1.0f, 0.015f, 0f, 0f),  // x-ish: corpus near-dup
      101L -> Seq(0f, 0f, 1.0f, 0.01f),   // z-ish: new direction
      102L -> Seq(0f, 0f, 0.99f, 0.02f))  // z-ish: pair of 101
    val out = IncrementalSemDedup(idx, threshold = 0.9)
      .transform(batch)
      .select("vec_id", "is_known", "is_dup", "dup_of")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out.size == 3) // batch rows only, row-preserving
    assert(out(100L)._1 && out(100L)._2 && out(100L)._3.contains(10L))
    assert(out(101L) == ((false, false, None)))
    // 101/102 share a cluster (whichever the derived centers give) and
    // the min-id rule keeps 101
    assert(out(102L)._2 && !out(102L)._1 && out(102L)._3.contains(101L))
  }

  test("incremental: the min-id rule spans corpus AND batch — a batch " +
    "vec matching both takes the smaller corpus id") {
    val corpus = vecs(xish: _*)
    val idx = IncrementalSemDedup.memberIndex(corpus, nClusters = 1,
      iterations = 1)
    val batch = vecs(
      200L -> Seq(1.0f, 0.01f, 0f, 0f),
      201L -> Seq(0.99f, 0.015f, 0f, 0f))
    val out = IncrementalSemDedup(idx, threshold = 0.9)
      .transform(batch)
      .select("vec_id", "is_known", "dup_of")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2))).toMap
    // both match corpus id 10 (smaller than any batch id)
    assert(out(200L) == ((true, 10L)))
    assert(out(201L) == ((true, 10L)))
  }

  test("incremental: over-cap corpus cell fails loud at transform time; " +
    "output-column collisions rejected; empty index fails loud (the " +
    "operator preserves sample size — a silent empty result would drop " +
    "the batch)") {
    val corpus = vecs(xish: _*)
    val idx = IncrementalSemDedup.memberIndex(corpus, nClusters = 1,
      iterations = 1)
    val e = intercept[IllegalArgumentException] {
      IncrementalSemDedup(idx, maxClusterSize = 2L)
        .transform(vecs(300L -> Seq(1f, 0f, 0f, 0f)))
    }
    assert(e.getMessage.contains("re-cluster"), e.getMessage)

    val bad = vecs(1L -> Seq(1f, 0f, 0f, 0f))
      .withColumn("is_known", org.apache.spark.sql.functions.lit(true))
    val e2 = intercept[IllegalArgumentException](
      IncrementalSemDedup(idx).transform(bad))
    assert(e2.getMessage.contains("is_known"))

    val emptyIdx = IncrementalSemDedup.memberIndex(
      vecs().select($"vec_id", $"embedding"))
    val e3 = intercept[IllegalArgumentException](
      IncrementalSemDedup(idx.filter(
          org.apache.spark.sql.functions.lit(false)))
        .transform(vecs(1L -> Seq(1f, 0f, 0f, 0f))))
    assert(e3.getMessage.contains("non-empty corpus"), e3.getMessage)
    assert(emptyIdx.count() == 0)
  }

  test("incremental: a stabilized index is a FIXPOINT of its re-derived " +
    "centers — reassigning every member against them reproduces the " +
    "recorded clusters exactly") {
    val corpus = vecs(xish ++ yish: _*)
    val idx = IncrementalSemDedup.memberIndex(corpus, nClusters = 2,
      iterations = 1, stabilizeRounds = 20).localCheckpoint()
    val asg = idx.select(
      org.apache.spark.sql.functions.col("vec_id").as("id"),
      org.apache.spark.sql.functions.col("cluster"),
      org.apache.spark.sql.functions.col("q"),
      org.apache.spark.sql.functions.col("nrm"))
    val dim = 4
    val centers = SemDedup.roundedMeanCenters(asg, 2, dim)
    val re = SemDedup.assignToCenters(asg.select("id", "q", "nrm"),
        centers, dim)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    val recorded = idx.select("vec_id", "cluster")
      .as[(Long, Long)].collect().toMap
    assert(re == recorded)
  }

  test("mismatched embedding dimensions fail loud with the offending id") {
    val df = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f)),
      (2L, Seq(1.0f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      SemDedup(nClusters = 1, iterations = 1).transform(df).collect())
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(_.contains("dims")), e)
  }
}
