package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Line-level corpus dedup (CCNet-style): hot lines strip everywhere,
  * within-doc repetition alone is not corpus-hot, blank lines behave
  * like any line, all-hot and null-text docs survive as empty rows.
  * Value-level correctness is the `text_striplines` oracle row.
  */
class HotLineStripSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], maxDf: Long = 2L) =
    Corpus.HotLineStrip(maxDocFreq = maxDf)
      .transform(rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  test("hot lines strip from every doc; unique lines survive in " +
    "order; df counts distinct DOCS (within-doc repeats not hot)") {
    val docs = Seq(
      (1L, "alpha\nHOT\nbeta"),
      (2L, "HOT\ngamma"),
      (3L, "delta\nHOT"),
      // doc 4 repeats a line 3x within ONE doc — df is 1, stays
      (4L, "solo\nsolo\nsolo"))
    val got = run(docs, maxDf = 2L)
    assert(got == Seq(
      (1L, 3L, 2L, "alpha\nbeta"),
      (2L, 2L, 1L, "gamma"),
      (3L, 2L, 1L, "delta"),
      (4L, 3L, 3L, "solo\nsolo\nsolo")))
  }

  test("all-hot docs become empty (row kept); null text is the 0-line " +
    "empty class; corpus-hot BLANK lines strip like any line") {
    val docs = Seq(
      (1L, "HOT"), (2L, "HOT"), (3L, "HOT"),
      (4L, "keep\n\nme"), (5L, "also\n\nhere"), (6L, "\nx"),
      (7L, null.asInstanceOf[String]))
    val got = run(docs, maxDf = 2L)
    // blank line appears in docs 4, 5, 6 -> df 3 > 2 -> hot
    assert(got == Seq(
      (1L, 1L, 0L, ""), (2L, 1L, 0L, ""), (3L, 1L, 0L, ""),
      (4L, 3L, 2L, "keep\nme"), (5L, 3L, 2L, "also\nhere"),
      (6L, 2L, 1L, "x"),
      (7L, 0L, 0L, "")))
  }

  test("incremental: batch strip against the persisted line index == " +
    "the full-corpus strip restricted to batch docs; fold == refit; " +
    "cold start (empty index) == the batch alone") {
    val all = (0 until 40).map { i =>
      (i.toLong, s"unique $i\nshared banner\n${if (i % 2 == 0) "even side"
        else "odd side"}")
    }
    val corpus = all.filter(_._1 % 2 == 0).toDF("doc_id", "text")
    val batch = all.filter(_._1 % 2 == 1).toDF("doc_id", "text")
    val idx = Corpus.IncrementalHotLines.lineIndex(corpus)
    // banner df 40 > 15 hot; "odd side" df 20 (batch-only) > 15 hot
    // too — batch-internal mass counts toward the union threshold
    val got = Corpus.IncrementalHotLineStrip(idx, maxDocFreq = 15L)
      .transform(batch)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val full = Corpus.HotLineStrip(maxDocFreq = 15L)
      .transform(all.toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect()
      .filter(_._1 % 2 == 1).sortBy(_._1).toSeq
    assert(got == full)
    assert(got.forall(r => r._3 == 1L && r._4.startsWith("unique")))
    // fold == refit, exactly (additive counts)
    val folded = Corpus.IncrementalHotLines.foldBatch(idx, batch)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val refit = Corpus.IncrementalHotLines.lineIndex(
      all.toDF("doc_id", "text"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(folded == refit)
    // cold start: empty index == HotLineStrip over the batch alone
    val cold = Corpus.IncrementalHotLineStrip(
        idx.filter(org.apache.spark.sql.functions.lit(false)),
        maxDocFreq = 15L)
      .transform(batch)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val alone = Corpus.HotLineStrip(maxDocFreq = 15L).transform(batch)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(cold == alone)
  }

  test("deterministic across repartition; a high threshold keeps " +
    "everything byte-identical") {
    val docs = (0 until 60).map(i =>
      (i.toLong, s"unique $i\nshared banner\nunique tail $i"))
    val base = run(docs, maxDf = 10L)
    assert(base.forall(_._3 == 2L)) // banner stripped everywhere
    val df7 = Corpus.HotLineStrip(maxDocFreq = 10L)
      .transform(docs.toDF("doc_id", "text").repartition(7))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(df7 == base)
    val keepAll = run(docs, maxDf = 1000L)
    assert(keepAll.map(r => (r._1, r._4)) ==
      docs.map { case (id, t) => (id, t) })
  }
}
