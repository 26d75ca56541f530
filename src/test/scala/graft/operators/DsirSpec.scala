package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Dsir.ImportanceResample]] against a local brute-force replay of
  * the published method (hashed-unigram add-one log-ratio, scaled-long
  * lattice, (score DESC, md5, id) selection order) — the same
  * derivation the DuckDB oracle runs, re-implemented here in plain
  * Scala so every selection path (keep-all buckets, multi-valued
  * boundary bucket, the single-valued heavy-tie hash split) is pinned
  * without Spark in the loop.
  */
class DsirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString

  /** Spark's round(e, 0): BigDecimal HALF_UP (Math.round would differ
    * on negative .5 ties).
    */
  private def roundHalfUp(x: Double): Long =
    JBigDecimal.valueOf(x).setScale(0, RoundingMode.HALF_UP).longValue()

  /** Local replay: docs as (id, text-or-null, source). */
  private def bruteForce(docs: Seq[(Long, String, String)],
                         targetValue: String, fraction: Double,
                         numFeatures: Int,
                         salt: String = "graft"): Seq[(Long, Long)] = {
    def toks(t: String): Seq[String] =
      if (t == null) Seq.empty else t.trim.toLowerCase.split("\\s+").toSeq
    def feat(tok: String): Long =
      java.lang.Long.parseLong(md5hex(tok).substring(0, 8), 16) %
        numFeatures
    val posting = docs.flatMap { case (id, text, src) =>
      toks(text).map(t => (id, src == targetValue, feat(t)))
    }
    val byF = posting.groupBy(_._3).map { case (f, hits) =>
      f -> (hits.count(_._2).toLong, hits.count(!_._2).toLong)
    }
    val t = byF.values.map(_._1).sum
    val r = byF.values.map(_._2).sum
    val v = byF.size
    val lr = byF.map { case (f, (ct, cr)) =>
      f -> roundHalfUp((math.log((ct + 1).toDouble / (t + v)) -
        math.log((cr + 1).toDouble / (r + v))) * 1e6)
    }
    val scores = docs.map { case (id, text, _) =>
      id -> toks(text).map(tk => lr(feat(tk))).sum
    }.toMap
    val n = docs.size
    val k = new JBigDecimal(fraction.toString)
      .multiply(new JBigDecimal(n))
      .setScale(0, RoundingMode.CEILING).longValue()
    docs.map(_._1)
      .sortBy(id => (-scores(id), md5hex(s"$salt:$id").substring(0, 8), id))
      .take(k.toInt)
      .map(id => id -> scores(id))
      .sortBy(_._1)
  }

  private def run(df: DataFrame, targetValue: String, fraction: Double,
                  numFeatures: Int, valueBuckets: Int = 256)
      : Seq[(Long, Long)] =
    Dsir.ImportanceResample(targetValue = targetValue,
        fraction = fraction, numFeatures = numFeatures,
        valueBuckets = valueBuckets)
      .transform(df)
      .select("doc_id", "dsir_score")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  // varied texts, a null text (scores 0), shared tokens across sources
  private val mixedDocs: Seq[(Long, String, String)] =
    (0L until 40L).map { i =>
      val src = if (i % 4 == 0) "seed" else s"web${i % 3}"
      val text =
        if (i == 7L) null
        else (0 until (3 + (i % 5)).toInt)
          .map(j => s"w${(i * 7 + j * 11) % 13}").mkString(" ")
      (i, text, src)
    }

  test("mixed corpus: kept set and scores equal the local replay " +
    "(keep-all + boundary paths, null text scores 0 and can be kept)") {
    val got = run(mixedDocs.toDF("doc_id", "text", "source"),
      "seed", 0.3, 512)
    assert(got == bruteForce(mixedDocs, "seed", 0.3, 512))
    assert(got.size == 12) // ceil(0.3 * 40)
  }

  test("multi-valued boundary bucket: few buckets force the cut inside " +
    "a bucket with many distinct scores") {
    // distinct score per doc (distinct token counts), 4 buckets over 64
    // docs => the boundary bucket rank-windows ~16 rows
    val docs = (0L until 64L).map { i =>
      val src = if (i < 8) "seed" else "web"
      ((i, List.fill(1 + i.toInt)(s"tok$i").mkString(" "), src))
    }
    val got = run(docs.toDF("doc_id", "text", "source"), "seed", 0.25,
      1024, valueBuckets = 4)
    assert(got == bruteForce(docs, "seed", 0.25, 1024))
    assert(got.size == 16)
  }

  test("single-valued boundary bucket: a heavy tie class holds the " +
    "cut; selection inside is md5-hash order, exact count") {
    // 8 target docs ("a"), 56 raw docs ("b"): two tie classes; the cut
    // at 50% needs 32 docs = all 8 targets + 24 OF THE 56-WAY TIE —
    // resolved via the hash-cell split, never a whole-class sort
    val docs = (0L until 64L).map { i =>
      if (i < 8) (i, "a", "seed") else (i, "b", "web")
    }
    val expect = bruteForce(docs, "seed", 0.5, 64)
    val got = run(docs.toDF("doc_id", "text", "source"), "seed", 0.5, 64)
    assert(got == expect)
    assert(got.size == 32)
    // every target doc outranks every raw doc (lr("a") > 0 > lr("b"))
    assert((0L until 8L).forall(id => got.exists(_._1 == id)))
  }

  test("fraction edges: 1.0 keeps every row; a tiny fraction keeps " +
    "exactly ceil(f*n) = 1") {
    val df = mixedDocs.toDF("doc_id", "text", "source")
    assert(run(df, "seed", 1.0, 512).size == 40)
    val one = run(df, "seed", 0.001, 512)
    assert(one == bruteForce(mixedDocs, "seed", 0.001, 512))
    assert(one.size == 1)
  }

  test("deterministic: two runs return the identical kept set") {
    val df = mixedDocs.toDF("doc_id", "text", "source")
    assert(run(df, "seed", 0.3, 512) == run(df, "seed", 0.3, 512))
  }

  test("null id raises in-plan; reserved output column rejected") {
    val bad = Seq((java.lang.Long.valueOf(1L), "a b", "seed"),
        (null.asInstanceOf[java.lang.Long], "c d", "web"))
      .toDF("doc_id", "text", "source")
    val e = intercept[Exception] {
      Dsir.ImportanceResample("seed", 0.5).transform(bad).collect()
    }
    assert(e.getMessage.contains("must be non-null"))
    // a duplicate id would fan out the kept-rows join past exact-k:
    // raised in-plan, including when the duplicates are null-text
    val dup = Seq((1L, "a b", "seed"), (2L, "c", "web"),
        (1L, null.asInstanceOf[String], "web"))
      .toDF("doc_id", "text", "source")
    val eDup = intercept[Exception] {
      Dsir.ImportanceResample("seed", 0.5).transform(dup).collect()
    }
    assert(eDup.getMessage.contains("must be unique"))
    val clash = Seq((1L, "a", "seed", 9L))
      .toDF("doc_id", "text", "source", "dsir_score")
    val e2 = intercept[IllegalArgumentException] {
      Dsir.ImportanceResample("seed", 0.5).transform(clash)
    }
    assert(e2.getMessage.contains("must not carry"))
  }

  test("parameter validation fails fast") {
    intercept[IllegalArgumentException] {
      Dsir.ImportanceResample("seed", 0.0)
    }
    intercept[IllegalArgumentException] {
      Dsir.ImportanceResample("seed", 1.5)
    }
    intercept[IllegalArgumentException] {
      Dsir.ImportanceResample("seed", 0.5, numFeatures = (1 << 20) + 1)
    }
  }

  test("input columns pass through on kept rows; dsir_score appended") {
    val df = mixedDocs.toDF("doc_id", "text", "source")
    val out = Dsir.ImportanceResample("seed", 0.3, numFeatures = 512)
      .transform(df)
    assert(out.columns.toSeq == Seq("doc_id", "text", "source",
      "dsir_score"))
  }

  test("selection report: per-source in/kept/rate/score mass equals " +
    "the replay; a null source is one class") {
    val docs = mixedDocs.map { case (id, tx, src) =>
      (id, tx, if (id == 11L) null else src) // one null-source class
    }
    val kept = bruteForce(docs, "seed", 0.3, 512).toMap
    val want = docs.groupBy(_._3).map { case (src, grp) =>
      val k = grp.count(d => kept.contains(d._1)).toLong
      (src, grp.size.toLong, k, k.toDouble / grp.size,
        grp.flatMap(d => kept.get(d._1)).sum)
    }.toSet
    val got = Dsir.SelectionReport("seed", 0.3, numFeatures = 512)
      .transform(docs.toDF("doc_id", "text", "source"))
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(got == want)
  }

  // ---- incremental form: fit on a corpus, score/select a batch ----

  /** Local replay of the incremental path: fit counts on `corpus`,
    * score `batch` (ids disjoint or not — irrelevant), with features
    * absent from the corpus scoring the zero-count smoothed ratio.
    */
  private def bruteForceIncr(corpus: Seq[(Long, String, String)],
                             batch: Seq[(Long, String)],
                             targetValue: String, fraction: Double,
                             numFeatures: Int,
                             salt: String = "graft"): Seq[(Long, Long)] = {
    def toks(t: String): Seq[String] =
      if (t == null) Seq.empty else t.trim.toLowerCase.split("\\s+").toSeq
    def feat(tok: String): Long =
      java.lang.Long.parseLong(md5hex(tok).substring(0, 8), 16) %
        numFeatures
    val byF = corpus
      .flatMap { case (_, text, src) =>
        toks(text).map(tk => (src == targetValue, feat(tk)))
      }
      .groupBy(_._2).map { case (f, hits) =>
        f -> (hits.count(_._1).toLong, hits.count(!_._1).toLong)
      }
    val t = byF.values.map(_._1).sum
    val r = byF.values.map(_._2).sum
    val v = byF.size
    def ratio(ct: Long, cr: Long): Long =
      roundHalfUp((math.log((ct + 1).toDouble / (t + v)) -
        math.log((cr + 1).toDouble / (r + v))) * 1e6)
    val dflt = ratio(0L, 0L)
    val scores = batch.map { case (id, text) =>
      id -> toks(text)
        .map(tk => byF.get(feat(tk)).map(c => ratio(c._1, c._2))
          .getOrElse(dflt)).sum
    }.toMap
    val k = new JBigDecimal(fraction.toString)
      .multiply(new JBigDecimal(batch.size))
      .setScale(0, RoundingMode.CEILING).longValue()
    batch.map(_._1)
      .sortBy(id => (-scores(id), md5hex(s"$salt:$id").substring(0, 8), id))
      .take(k.toInt)
      .map(id => id -> scores(id))
      .sortBy(_._1)
  }

  // batch shares some corpus vocabulary and carries tokens the corpus
  // never saw (the "new crawl slang" case — must score the zero-count
  // ratio, not drop)
  private val incrBatch: Seq[(Long, String)] =
    (100L until 120L).map { i =>
      val known = s"w${(i * 7) % 13}"
      val unseen = s"zz${i % 5}"
      (i, if (i % 6 == 0) null else s"$known $unseen $known")
    }

  test("incremental: batch kept set and scores equal the local replay " +
    "(fit on corpus, unseen features score the zero-count ratio)") {
    val counts = Dsir.featureCounts(
      mixedDocs.toDF("doc_id", "text", "source"), "seed",
      numFeatures = 512)
    val got = Dsir.IncrementalResample(counts, fraction = 0.4,
        numFeatures = 512)
      .transform(incrBatch.toDF("doc_id", "text"))
      .select("doc_id", "dsir_score")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == bruteForceIncr(mixedDocs, incrBatch, "seed", 0.4, 512))
    assert(got.size == 8) // ceil(0.4 * 20)
  }

  test("foldBatch equals a from-scratch fit over corpus + batch") {
    val corpusDf = mixedDocs.toDF("doc_id", "text", "source")
    val batchDf = incrBatch.map { case (id, tx) => (id, tx, "web9") }
      .toDF("doc_id", "text", "source")
    val folded = Dsir.foldBatch(
        Dsir.featureCounts(corpusDf, "seed", numFeatures = 512),
        batchDf, "seed", numFeatures = 512)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val scratch = Dsir.featureCounts(corpusDf.unionByName(batchDf),
        "seed", numFeatures = 512)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(folded == scratch)
  }

  test("incremental: a table fitted with a larger numFeatures raises " +
    "in-plan instead of silently mis-bucketing") {
    val counts = Dsir.featureCounts(
      mixedDocs.toDF("doc_id", "text", "source"), "seed",
      numFeatures = 4096)
    // since r13 the table's recorded fit metadata fires first, naming
    // both values; the in-plan structural raise remains the fallback
    // for legacy metadata-less tables (FitParamsSpec pins both)
    val e = intercept[Exception] {
      Dsir.IncrementalResample(counts, fraction = 0.5, numFeatures = 7)
        .transform(incrBatch.toDF("doc_id", "text")).collect()
    }
    assert(e.getMessage.contains("numFeatures=4096") &&
      e.getMessage.contains("numFeatures=7"))
    // the structural guard itself, on a metadata-stripped table
    val legacy = counts.withColumn("feature",
      org.apache.spark.sql.functions.col("feature")
        .as("feature", org.apache.spark.sql.types.Metadata.empty))
    val e2 = intercept[Exception] {
      Dsir.IncrementalResample(legacy, fraction = 0.5, numFeatures = 7)
        .transform(incrBatch.toDF("doc_id", "text")).collect()
    }
    assert(e2.getMessage.contains("different numFeatures"))
  }

  test("incremental: an empty batch (an empty ingest day) yields an " +
    "empty kept set, not an error") {
    val counts = Dsir.featureCounts(
      mixedDocs.toDF("doc_id", "text", "source"), "seed",
      numFeatures = 512)
    val out = Dsir.IncrementalResample(counts, fraction = 0.5,
        numFeatures = 512)
      .transform(Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("doc_id", "text", "dsir_score"))
  }

  test("incremental: empty feature-count table fails loud in-plan") {
    val counts = Dsir.featureCounts(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source"),
      "seed", numFeatures = 512)
    val e = intercept[Exception] {
      Dsir.IncrementalResample(counts, fraction = 0.5, numFeatures = 512)
        .transform(incrBatch.toDF("doc_id", "text")).collect()
    }
    assert(e.getMessage.contains("empty feature-count table"))
  }
}
