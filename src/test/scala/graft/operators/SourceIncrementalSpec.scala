package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics pins for [[Dedup.IncrementalExactDedup]] and
  * [[SourceQuality]] over tiny literal frames (the DuckDB oracle covers
  * the fixture-table behavior of `dedup_incr` / `source_stats` /
  * `source_filter`).
  */
class SourceIncrementalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, Some("known text")),
    (2L, Some("known  TEXT")), // same class as 1 after normalization
    (3L, Option.empty[String]), // null content class lives in the corpus
    (4L, Some("corpus only"))).toDF("doc_id", "text")

  test("IncrementalExactDedup: known content points at the CORPUS " +
    "canonical; new content dedups within the batch; null text is " +
    "null-safe known") {
    val idx = Dedup.IncrementalExactDedup.fingerprintIndex(corpus)
    val batch = Seq(
      (10L, Some("known text")),     // already ingested -> canonical 1
      (11L, Some("fresh content")),  // new, batch-canonical
      (12L, Some("fresh  content")), // dup of 11 within the batch
      (13L, Option.empty[String]))   // null class, known via <=>
      .toDF("doc_id", "text")
    val out = Dedup.IncrementalExactDedup(idx).transform(batch)
      .select("doc_id", "is_known", "canonical_id", "is_dup")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size == 4) // row-preserving
    assert(out(10L) == ((true, 1L, true)))
    assert(out(11L) == ((false, 11L, false)))
    assert(out(12L) == ((false, 11L, true)))
    assert(out(13L) == ((true, 3L, true)))
  }

  test("updatedIndex: folding a deduped batch in makes its new content " +
    "known to the NEXT batch, keeping existing canonicals") {
    val idx = Dedup.IncrementalExactDedup.fingerprintIndex(corpus)
    val b1 = Dedup.IncrementalExactDedup(idx).transform(
      Seq((10L, "fresh content")).toDF("doc_id", "text"))
    val idx2 = Dedup.IncrementalExactDedup.updatedIndex(idx, b1)
    assert(idx2.count() == idx.count() + 1)
    val out = Dedup.IncrementalExactDedup(idx2).transform(Seq(
        (20L, "fresh content"), (21L, "known text"))
        .toDF("doc_id", "text"))
      .select("doc_id", "is_known", "canonical_id")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2)))
      .toMap
    assert(out(20L) == ((true, 10L)))
    assert(out(21L) == ((true, 1L))) // original canonical survives the fold
  }

  test("IncrementalExactDedup rejects reserved/working column collisions") {
    val idx = Dedup.IncrementalExactDedup.fingerprintIndex(corpus)
    val bad = Seq((1L, "t")).toDF("doc_id", "text")
      .withColumn("is_known", lit(true))
    val e = intercept[IllegalArgumentException](
      Dedup.IncrementalExactDedup(idx).transform(bad))
    assert(e.getMessage.contains("is_known"))
  }

  test("qCosine ANSI regression: zero-norm vectors yield NaN pairs " +
    "(NaN >= threshold, both engines), never a DIVIDE_BY_ZERO error — " +
    "EmbeddingNearDup over two zero vectors must emit their pair") {
    val df = Seq(
      (1L, Seq.fill(8)(0f)),
      (2L, Seq.fill(8)(0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.EmbeddingNearDup(dim = 8, tables = 1,
        planesPerTable = 4, threshold = 0.4)
      .transform(df)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  private def srcDocs = Seq(
    // srcA: 4 docs, one exact-dup pair, one null text (its own class),
    // one null lang
    (1L, Some("aa bb"), Some("en"), 4L, "srcA"),
    (2L, Some("aa  BB"), Some("de"), 6L, "srcA"),
    (3L, Option.empty[String], Some("en"), 0L, "srcA"),
    (4L, Some("cc"), Option.empty[String], 2L, "srcA"),
    // srcB: 2 docs, no dups
    (5L, Some("dd"), Some("en"), 10L, "srcB"),
    (6L, Some("ee"), Some("en"), 20L, "srcB"))
    .toDF("doc_id", "text", "lang", "n_chars", "source")

  test("SourceStats: counts, exact mean, dup ratio with null text as " +
    "ONE content class, distinct non-null langs") {
    val out = SourceQuality.SourceStats().transform(srcDocs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getLong(5))).toMap
    // srcA: classes = {aa bb, cc, null} = 3 -> dup_ratio = (4-3)/4
    assert(out("srcA") == ((4L, 3.0, 3L, 0.25, 2L)))
    assert(out("srcB") == ((2L, 15.0, 2L, 0.0, 1L)))
  }

  test("SourceFilter: gates whole sources, attaches the deciding stats " +
    "to surviving rows") {
    val out = SourceQuality.SourceFilter(minMeanChars = 10.0)
      .transform(srcDocs)
      .select("doc_id", "source_mean_chars", "source_dup_ratio")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(out.keySet == Set(5L, 6L)) // only srcB passes mean >= 10
    assert(out(5L) == ((15.0, 0.0)))
  }

  test("CorpusReport: one exact row — counts, totals, null text as one " +
    "content class, null source/lang excluded from distinct counts") {
    val docs = Seq(
      (1L, "srcA", "same text", 10L, "en"),
      (2L, "srcA", "same  TEXT", 20L, "en"),   // normalizes onto row 1
      (3L, "srcB", null.asInstanceOf[String], 30L, "de"),
      (4L, null.asInstanceOf[String], null.asInstanceOf[String], 40L,
        null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text", "n_chars", "lang")
    val r = SourceQuality.CorpusReport().transform(docs).head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_sources") == 2L)    // null source not counted
    assert(r.getAs[Long]("n_langs") == 2L)      // null lang not counted
    assert(r.getAs[Long]("total_chars") == 100L)
    assert(r.getAs[Double]("mean_chars") == 25.0)
    assert(r.getAs[Long]("n_null_text") == 2L)
    // classes: {same text} + the null class = 2
    assert(r.getAs[Long]("distinct_classes") == 2L)
    assert(r.getAs[Double]("dup_ratio") == 0.5)
  }

  test("SourceFilter: a NULL source is a real source class — docs whose " +
    "null source passes the gate survive the null-safe join") {
    // two null-source docs, all-unique text (dup_ratio 0, mean 20) plus
    // a failing named source; a plain === join would drop rows 1-2 even
    // though their source passes every gate (the ExactDedup null-text
    // silent-drop class)
    val docs = Seq(
      (1L, null.asInstanceOf[String], "unique one", 20L, "en"),
      (2L, null.asInstanceOf[String], "unique two", 20L, "en"),
      (3L, "srcLow", "short", 2L, "en"))
      .toDF("doc_id", "source", "text", "n_chars", "lang")
    val out = SourceQuality.SourceFilter(minMeanChars = 10.0)
      .transform(docs).select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("SourceFilter: maxDupRatio drops the duplicated source; minDocs " +
    "drops the thin one") {
    val byDup = SourceQuality.SourceFilter(maxDupRatio = 0.1)
      .transform(srcDocs).select("doc_id").as[Long].collect().toSet
    assert(byDup == Set(5L, 6L))
    val byDocs = SourceQuality.SourceFilter(minDocs = 3L)
      .transform(srcDocs).select("doc_id").as[Long].collect().toSet
    assert(byDocs == Set(1L, 2L, 3L, 4L))
  }
}
