package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingTfIdfSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0L until 400L)
    .map(i => (i, s"doc $i", if (i % 4 == 0) "en" else "de"))
    .toDF("doc_id", "text", "lang")

  test("thresholdHex: boundary rates") {
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(1.0) == "g") // above every hex digit
    assertThrows[IllegalArgumentException](Sampling.thresholdHex(-0.1))
  }

  test("rate 1 keeps every row; rate 0 keeps none; rates are per-stratum") {
    val all = Sampling.StratifiedSample(Map("en" -> 1.0, "de" -> 0.0))
      .transform(docs).select("lang").as[String].collect()
    assert(all.nonEmpty && all.forall(_ == "en"))
    assert(all.length == 100)
  }

  test("sampling is deterministic and NESTED across rates (same salt)") {
    def ids(rate: Double) =
      Sampling.StratifiedSample(Map("en" -> rate, "de" -> rate))
        .transform(docs).select("doc_id").as[Long].collect().toSet
    val half = ids(0.5)
    assert(ids(0.5) == half) // rerun identical
    val tenth = ids(0.1)
    assert(tenth.subsetOf(half)) // smaller rate is a subset
    // rough mass check: md5 is uniform, 400 docs at 0.5 ≈ 200 ± 5σ
    assert(math.abs(half.size - 200) < 50)
  }

  test("unlisted strata use defaultRate") {
    val got = Sampling.StratifiedSample(Map("en" -> 0.0), defaultRate = 1.0)
      .transform(docs).select("lang").as[String].collect()
    assert(got.nonEmpty && got.forall(_ == "de"))
  }

  // ------------------------------------------------------- QuotaSample

  /** The operator's md5 bucket, recomputed independently in plain JVM. */
  private def bucketOf(id: Long, salt: String = "graft"): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)

  test("quota: keeps exactly the quota smallest buckets per stratum") {
    val got = Sampling.QuotaSample(Map("en" -> 10L, "de" -> 7L))
      .transform(docs)
      .select("doc_id", "lang", "quota_rank")
      .as[(Long, String, Long)].collect()
    assert(got.count(_._2 == "en") == 10)
    assert(got.count(_._2 == "de") == 7)
    // expected = hash-order prefix, recomputed without Spark
    val expectEn = (0L until 400L).filter(_ % 4 == 0)
      .sortBy(id => (bucketOf(id), id)).take(10).toSet
    val expectDe = (0L until 400L).filter(_ % 4 != 0)
      .sortBy(id => (bucketOf(id), id)).take(7).toSet
    assert(got.filter(_._2 == "en").map(_._1).toSet == expectEn)
    assert(got.filter(_._2 == "de").map(_._1).toSet == expectDe)
    // ranks are the 1-based hash-order positions
    val enRanks = got.filter(_._2 == "en").sortBy(_._3).map(_._1).toSeq
    assert(enRanks ==
      (0L until 400L).filter(_ % 4 == 0)
        .sortBy(id => (bucketOf(id), id)).take(10).toSeq)
  }

  test("quota: nested across sizes; larger-than-group keeps all") {
    def ids(q: Long) = Sampling.QuotaSample(Map("en" -> q, "de" -> q))
      .transform(docs).select("doc_id").as[Long].collect().toSet
    val ten = ids(10L)
    assert(ten.subsetOf(ids(25L))) // prefix property
    assert(ids(1000L).size == 400) // quota above group size keeps all
  }

  test("quota: zero quota drops the stratum; defaultQuota for unlisted") {
    val got = Sampling.QuotaSample(Map("en" -> 0L), defaultQuota = 5L)
      .transform(docs).select("lang").as[String].collect()
    assert(got.length == 5 && got.forall(_ == "de"))
  }

  test("quota: null key fails loudly (would NPE in the heap ordering)") {
    val bad = Seq((Some(1L), "en"), (None, "en"))
      .map { case (id, l) => (id.map(Long.box).orNull, l) }
      .toDF("doc_id", "lang")
    assertThrows[Exception](
      Sampling.QuotaSample(Map("en" -> 5L)).transform(bad).collect())
  }

  test("quota: pre-existing output-named columns are overwritten, not " +
    "duplicated (AMBIGUOUS_REFERENCE hazard)") {
    val staged = docs
      .withColumn("sample_bucket", org.apache.spark.sql.functions.lit("x"))
      .withColumn("quota_rank", org.apache.spark.sql.functions.lit(-1L))
    val out = Sampling.QuotaSample(Map("en" -> 5L, "de" -> 5L))
      .transform(staged)
    assert(out.columns.count(_ == "sample_bucket") == 1)
    assert(out.columns.count(_ == "quota_rank") == 1)
    // fresh ranks, not the poisoned -1, and names resolve unambiguously
    out.select("quota_rank").as[Long].collect()
      .foreach(r => assert(r >= 1L))
    // key/strata collision with an output name fails loudly
    assertThrows[IllegalArgumentException](
      Sampling.QuotaSample(Map("en" -> 5L), keyColumn = "quota_rank")
        .transform(docs.withColumnRenamed("doc_id", "quota_rank")))
  }

  test("quota: agrees with a plain rank window (pruning is invisible)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number, when}
    val naive = docs
      .withColumn("b", Sampling.bucketHex("graft", col("doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("b"), col("doc_id"))))
      .filter(col("rn") <= when(col("lang") === "en", 13).otherwise(4))
      .select("doc_id").as[Long].collect().toSet
    val got = Sampling.QuotaSample(Map("en" -> 13L), defaultQuota = 4L)
      .transform(docs).select("doc_id").as[Long].collect().toSet
    assert(got == naive)
  }

  test("tfidf: hand-computed tiny corpus") {
    // 3 docs; "cat" in 2 docs, "dog" in 1, "the" in 3
    val d = Seq((1L, "the cat cat"), (2L, "the dog"), (3L, "the cat"))
      .toDF("doc_id", "text")
    val got = TfIdf(k = 2).transform(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq.sortBy(x => (x._1, x._2))
    def score(tf: Long, df: Long): Double =
      BigDecimal(tf * (math.log(4.0 / (df + 1.0)) + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: cat tf=2 df=2, the tf=1 df=3
    assert(got.filter(_._1 == 1L) == Seq(
      (1L, 1L, "cat", 2L, 2L, score(2, 2)),
      (1L, 2L, "the", 1L, 3L, score(1, 3))))
    // doc 2: dog tf=1 df=1 beats the tf=1 df=3
    assert(got.filter(_._1 == 2L) == Seq(
      (2L, 1L, "dog", 1L, 1L, score(1, 1)),
      (2L, 2L, "the", 1L, 3L, score(1, 3))))
    // doc 3: cat df=2 beats the df=3
    assert(got.filter(_._1 == 3L) == Seq(
      (3L, 1L, "cat", 1L, 2L, score(1, 2)),
      (3L, 2L, "the", 1L, 3L, score(1, 3))))
  }

  test("tfidf: rank ties on equal rounded score break by term asc") {
    val d = Seq((1L, "aa bb"), (2L, "aa bb")).toDF("doc_id", "text")
    val got = TfIdf(k = 2).transform(d).orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 1L, "aa"), (1L, 2L, "bb"),
      (2L, 1L, "aa"), (2L, 2L, "bb")))
  }

  test("bm25: hand-computed tiny corpus (idf, length normalization, " +
    "integer-lattice sums, top-k tie-break)") {
    // corpus: 4 docs; query {cat, dog}; doc 4 matches nothing
    val d = Seq((1L, "the cat cat dog"), (2L, "the dog"),
        (3L, "the cat"), (4L, "the bird")).toDF("doc_id", "text")
    val got = Bm25Search(queryTerms = Seq("cat", "dog"), k = 10)
      .transform(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // local reference: N=4, lens 4/2/2/2 -> avgdl = 2.5
    val avgdl = 10.0 / 4.0
    def comp(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
      val c = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      BigDecimal(c * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong
    }
    val want = Seq(
      1L -> (2L, comp(2, 2, 4) + comp(1, 2, 4)), // cat tf2 + dog tf1
      2L -> (1L, comp(1, 2, 2)), // dog
      3L -> (1L, comp(1, 2, 2))) // cat (same score as doc 2: df equal)
      .map { case (id, (m, s)) => (id, m, s) }
      .sortBy(x => (-x._3, x._1))
    assert(got == want)
    // doc 4 (no match) is absent; docs 2/3 tie -> doc 2 first
    assert(!got.exists(_._1 == 4L))
    assert(got.indexWhere(_._1 == 2L) < got.indexWhere(_._1 == 3L))
    // k truncates after the deterministic order
    val top1 = Bm25Search(queryTerms = Seq("cat", "dog"), k = 1)
      .transform(d).collect().map(_.getLong(0)).toSeq
    assert(top1 == Seq(got.head._1))
    // parameter validation
    assertThrows[IllegalArgumentException](
      Bm25Search(queryTerms = Seq.empty))
    assertThrows[IllegalArgumentException](
      Bm25Search(queryTerms = Seq("a", "a")))
    assertThrows[IllegalArgumentException](
      Bm25Search(queryTerms = Seq("a"), b = 1.5))
    // r17 ADVICE: un-normalized query terms fail loud instead of
    // silently matching nothing against the lower-cased tokens
    assertThrows[IllegalArgumentException](
      Bm25Search(queryTerms = Seq("Cat")))
    assertThrows[IllegalArgumentException](
      Bm25Search(queryTerms = Seq(" cat")))
  }

  test("bm25 index: probe == inline search; fold == refit; drift and " +
    "duplicate-doc guards raise") {
    val d = Seq((1L, "the cat cat dog"), (2L, "the dog"),
        (3L, "the cat"), (4L, "the bird"), (5L, "cat dog cat dog"),
        (6L, "dog elephant runs")).toDF("doc_id", "text")
    val q = Seq("cat", "dog")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val inline = rows(Bm25Search(queryTerms = q, k = 10).transform(d))
    // probe of a whole-corpus fit == the inline operator, bit-for-bit
    val full = Bm25Index.fit(d)
    assert(rows(Bm25Index.probe(full, q, k = 10)) == inline)
    // fold == refit: fit on half, fold the rest, probe agrees
    val fitHalf = Bm25Index.fit(d.filter($"doc_id" <= 3L))
    val folded = Bm25Index.foldBatch(fitHalf, d.filter($"doc_id" > 3L))
    assert(rows(Bm25Index.probe(folded, q, k = 10)) == inline)
    // the artifact survives a parquet round-trip (metadata included)
    val tmp = java.nio.file.Files.createTempDirectory("bm25idx")
      .resolve("idx").toString
    folded.write.parquet(tmp)
    val reread = spark.read.parquet(tmp)
    assert(rows(Bm25Index.probe(reread, q, k = 10)) == inline)
    // k1/b drift raises in both directions
    assertThrows[IllegalArgumentException](
      Bm25Index.probe(full, q, k1 = 1.5))
    assertThrows[IllegalArgumentException](
      Bm25Index.foldBatch(full, d.limit(0), b = 0.5))
    // re-ingesting an indexed doc raises (would double-count terms)
    val e = intercept[IllegalArgumentException](
      Bm25Index.foldBatch(full, d.filter($"doc_id" === 2L)))
    assert(e.getMessage.contains("re-ingests"))
    // a posting-only table (no stats row) fails the probe loudly
    val noStats = full.filter($"term".isNotNull)
    val e2 = intercept[IllegalArgumentException](
      Bm25Index.probe(noStats, q))
    assert(e2.getMessage.contains("stats row"))
    // un-normalized probe terms fail loud
    assertThrows[IllegalArgumentException](
      Bm25Index.probe(full, Seq("Cat")))
  }

  test("group_topk matches the brute force under heavy ties and many " +
    "partitions (the heap prune never loses a winner)") {
    val rnd = new scala.util.Random(31337L)
    for (round <- 1 to 6) {
      val rows = (0L until 200L).map { i =>
        (i, s"g${rnd.nextInt(4)}", rnd.nextInt(9).toLong)
      }
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        rs.sortBy { case (id, _, v) => (-v, id) }.take(3)
          .zipWithIndex.map { case ((id, _, _), r) => id -> (r + 1).toLong }
      }
      val got = Sampling.GroupTopK(k = 3L, groupColumn = "g",
          scoreColumn = "v", keyColumn = "id")
        .transform(rows.toDF("id", "g", "v").repartition(13))
        .select("id", "group_rank").as[(Long, Long)].collect().toMap
      assert(got == want, s"round $round")
    }
  }

  test("group_topk: null score and output-column collision fail loudly") {
    val withNull = Seq((1L, "g", Some(5L)), (2L, "g", None))
      .toDF("id", "g", "v")
    val e = intercept[Exception] {
      Sampling.GroupTopK(k = 1L, groupColumn = "g", scoreColumn = "v",
        keyColumn = "id").transform(withNull).collect()
    }
    assert(e.getMessage.contains("non-null"), e.getMessage)
    val bad = Seq((1L, "g", 5L)).toDF("id", "group_rank", "v")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.GroupTopK(k = 1L, groupColumn = "group_rank",
        scoreColumn = "v", keyColumn = "id").transform(bad)
    }
    assert(e2.getMessage.contains("group_rank"), e2.getMessage)
  }

  test("group_topk: NaN scores fail loudly — the heap and the rank " +
    "window would disagree about where NaN sorts (round-9 ADVICE)") {
    val withNaN = Seq((1L, "g", 5.0), (2L, "g", Double.NaN))
      .toDF("id", "g", "v")
    val e = intercept[Exception] {
      Sampling.GroupTopK(k = 1L, groupColumn = "g", scoreColumn = "v",
        keyColumn = "id").transform(withNaN).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(_.contains("non-NaN")), e)
  }

  test("group_topk: -0.0 and 0.0 tie under the heap exactly as under " +
    "the rank window (normalized zero, key-asc tiebreak)") {
    // 3 rows tie at zero (one as -0.0); k=2 must keep the two LOWEST
    // keys regardless of zero sign — a negating comparator would rank
    // -0.0 below 0.0 and evict the wrong row
    val d = Seq((10L, "g", 0.0), (3L, "g", -0.0), (7L, "g", 0.0),
      (99L, "g", -1.0)).toDF("id", "g", "v")
    val got = Sampling.GroupTopK(k = 2L, groupColumn = "g",
        scoreColumn = "v", keyColumn = "id")
      .transform(d).select("id").as[Long].collect().toSet
    assert(got == Set(3L, 7L), got)
  }

  test("group_topk: a key-like group column trips the fail-loud " +
    "cardinality guard instead of exhausting executor memory") {
    val d = (0L until 64L).map(i => (i, s"g$i", i.toDouble))
      .toDF("id", "g", "v").repartition(1)
    val e = intercept[Exception] {
      Sampling.GroupTopK(k = 1L, groupColumn = "g", scoreColumn = "v",
        keyColumn = "id", maxGroupsPerPartition = 16L)
        .transform(d).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(_.contains("maxGroupsPerPartition")), e)
    // at or under the cap: fine
    val ok = Sampling.GroupTopK(k = 1L, groupColumn = "g",
        scoreColumn = "v", keyColumn = "id",
        maxGroupsPerPartition = 64L)
      .transform(d).count()
    assert(ok == 64L)
  }

  test("quota_sample: defaultQuota > 0 over a key-like strata column " +
    "trips the fail-loud cardinality guard instead of exhausting memory") {
    val d = (0L until 64L).map(i => (i, s"domain$i"))
      .toDF("doc_id", "lang").repartition(1)
    val e = intercept[Exception] {
      Sampling.QuotaSample(Map("en" -> 5L), defaultQuota = 2L,
        maxGroupsPerPartition = 16L)
        .transform(d).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(_.contains("maxGroupsPerPartition")), e)
    // same data under the default quota 0: unlisted strata carry NO
    // heap, so the guard counts only the quota-bearing ones and passes
    val none = Sampling.QuotaSample(Map("domain3" -> 1L),
        maxGroupsPerPartition = 16L)
      .transform(d).select("doc_id").as[Long].collect().toSeq
    assert(none == Seq(3L))
    // at or under the cap with positive default: fine and exact
    val ok = Sampling.QuotaSample(Map.empty[String, Long],
        defaultQuota = 1L, maxGroupsPerPartition = 64L)
      .transform(d).count()
    assert(ok == 64L)
  }
}
