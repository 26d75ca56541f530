package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable

/** Unit specs for the text-analysis / dedup / similarity / multimodal
  * operator layer over tiny literal frames (the DuckDB oracle covers the
  * full-table behavior; these pin the algebra and edge cases).
  */
class TextDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("shingles: n-gram generation and short-doc guard") {
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b"),      // shorter than n=3 -> empty
      (3L, "x x x x"),  // duplicates collapse
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      Portable.shingles(Portable.tokens($"text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq())
    assert(out(3L) == Seq("x x x"))
  }

  test("tokenHash matches the driver-side computation") {
    val got = Seq("hello").toDF("s")
      .select(Portable.tokenHash($"s")).as[Long].head()
    assert(got == Portable.tokenHashLocal("hello"))
    assert(got == 1564557354L) // 0x5d41402a of md5("hello")
  }

  test("ExactDedup: null-text rows are PRESERVED and group as mutual " +
    "duplicates (a plain equi-join on the null fingerprint would " +
    "silently drop them despite preservesSampleSize)") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("same text")), (2L, Some("same  text")),
      (3L, Option.empty[String]), (4L, Option.empty[String]),
      (5L, Some("unique"))).toDF("doc_id", "text")
    val out = Dedup.ExactDedup().transform(df)
      .select("doc_id", "canonical_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, false), (2L, 1L, true),
      (3L, 3L, false), (4L, 3L, true),
      (5L, 5L, false)), out)
  }

  test("ExactDedup groups identical normalized content") {
    val df = docsDF(
      1L -> "Hello  World",
      2L -> "hello world",   // same after normalize
      3L -> "different text")
    val out = Dedup.ExactDedup().transform(df)
      .select("doc_id", "canonical_id", "is_dup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(out == Set((1L, 1L, false), (2L, 1L, true), (3L, 3L, false)))
  }

  test("NGramJaccard computes exact jaccard on known overlap") {
    // doc1: shingles {a b c, b c d, c d e} ; doc2: {a b c, b c d, c d x}
    // common=2, union=4, jaccard=0.5
    val df = docsDF(1L -> "a b c d e", 2L -> "a b c d x")
    val out = Dedup.NGramJaccard(threshold = 0.1).transform(df).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("common") == 2L && r.getAs[Long]("uni") == 4L)
    assert(r.getAs[Double]("jaccard") == 0.5)
  }

  test("NGramJaccard maxDocFreq drops hot shingles (capped-set sizes)") {
    // 'a b c' appears in all 3 docs -> dropped at maxDocFreq=2; docs 1/2
    // still share 'b c d'. Capped-set semantics: sizes are the FILTERED
    // set sizes, so doc1={b c d}, doc2={b c d} -> jaccard 1/1 = 1.0
    val df = docsDF(1L -> "a b c d", 2L -> "a b c d", 3L -> "a b c x")
    val out = Dedup.NGramJaccard(threshold = 0.0, maxDocFreq = 2)
      .transform(df).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val r = out.head
    assert(r.getAs[Long]("common") == 1L && r.getAs[Long]("uni") == 1L)
    assert(r.getAs[Double]("jaccard") == 1.0)
  }

  test("NGramJaccard: generous cap reproduces the exact uncapped result") {
    val df = docsDF(1L -> "a b c d e", 2L -> "a b c d x", 3L -> "p q r s")
    // maxDocFreq = 0 is the explicit opt-in to the exact (self-join) path;
    // the capped formulation is the default
    val exact = Dedup.NGramJaccard(threshold = 0.1, maxDocFreq = 0)
      .transform(df).collect().map(_.toSeq).toSet
    val capped = Dedup.NGramJaccard(threshold = 0.1, maxDocFreq = 100)
      .transform(df).collect().map(_.toSeq).toSet
    assert(capped == exact && exact.nonEmpty)
  }

  test("NGramJaccard property: cap >= corpus size == exact, any corpus " +
    "(seeded ScalaCheck corpora)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val doc = Gen.chooseNum(0, 8).flatMap(Gen.listOfN(_, word))
      .map(_.mkString(" "))
    val corpus = Gen.chooseNum(2, 8).flatMap(Gen.listOfN(_, doc))
    (1 to 25).foreach { seed =>
      corpus(Gen.Parameters.default, Seed(seed.toLong)).foreach { texts =>
        val df = docsDF(texts.zipWithIndex.map {
          case (t, i) => (i.toLong, t) }: _*)
        val exact = Dedup.NGramJaccard(threshold = 0.0, maxDocFreq = 0)
          .transform(df).collect().map(_.toSeq).toSet
        val capped = Dedup
          .NGramJaccard(threshold = 0.0, maxDocFreq = texts.size.toLong)
          .transform(df).collect().map(_.toSeq).toSet
        assert(capped == exact,
          s"seed=$seed corpus=$texts capped=$capped exact=$exact")
      }
    }
  }

  test("NGramJaccard default is the capped (non-quadratic) formulation") {
    assert(Dedup.NGramJaccard().maxDocFreq > 0)
  }

  test("MinHashLSH finds identical docs with est_jaccard 1.0") {
    val df = docsDF(
      1L -> "w1 w2 w3 w4 w5 w6",
      2L -> "w1 w2 w3 w4 w5 w6",
      3L -> "z1 z2 z3 z4 z5 z6")
    val out = Dedup.MinHashLSHDedup().transform(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("SimHash: identical docs at hamming 0, disjoint docs absent") {
    val df = docsDF(
      1L -> "w1 w2 w3 w4 w5 w6",
      2L -> "w1 w2 w3 w4 w5 w6",
      3L -> "z1 z2 z3 z4 z5 z6")
    val out = Dedup.SimHashDedup().transform(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 0L)))
  }

  test("MinHashLSH/SimHash maxBucket: hot band buckets are dropped, " +
      "uncapped opt-in restores them, defaults are capped") {
    // two identical docs share EVERY band/chunk bucket (bucket size 2),
    // so maxBucket = 1 suppresses all their candidate pairs — the
    // boilerplate-blowup guard observable at spec scale
    val df = docsDF(
      1L -> "w1 w2 w3 w4 w5 w6",
      2L -> "w1 w2 w3 w4 w5 w6",
      3L -> "z1 z2 z3 z4 z5 z6")
    assert(Dedup.MinHashLSHDedup(maxBucket = 1L).transform(df).isEmpty)
    assert(Dedup.SimHashDedup(maxBucket = 1L).transform(df).isEmpty)
    assert(Dedup.MinHashLSHDedup(maxBucket = 0L).transform(df)
      .count() == 1L) // uncapped: the (1,2) pair is back
    assert(Dedup.SimHashDedup(maxBucket = 0L).transform(df).count() == 1L)
    // an unsuspecting default at corpus scale must get the capped plan
    assert(Dedup.MinHashLSHDedup().maxBucket > 0)
    assert(Dedup.SimHashDedup().maxBucket > 0)
  }

  private def vecDF(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("quantized cosine is exact for parallel/orthogonal vectors") {
    val df = vecDF(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(2f, 0f, 0f, 0f),   // parallel -> cosine 1
      2L -> Seq(0f, 3f, 0f, 0f))   // orthogonal -> cosine 0
    val q = df.select($"vec_id", Portable.quantize($"embedding").as("q"))
      .withColumn("nrm", Portable.qNormSq($"q"))
    val a = q.filter($"vec_id" === 0).select($"q".as("qa"), $"nrm".as("na"))
    val pairs = q.crossJoin(a).filter($"vec_id" =!= 0)
      .select($"vec_id", Portable.qCosine(
        Portable.qDot($"q", $"qa"), $"nrm", $"na").as("cos"))
      .as[(Long, Double)].collect().toMap
    assert(pairs(1L) == 1.0)
    assert(pairs(2L) == 0.0)
  }

  test("CosineTopK ranks neighbors by cosine with id tie-break") {
    val df = vecDF(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.1f),
      2L -> Seq(1f, 1f),
      3L -> Seq(0f, 1f))
    val out = Similarity.CosineTopK(d => d.filter($"vec_id" === 0), k = 2)
      .transform(df)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 2L)))
  }

  test("LshCosineTopK multi-table: candidate union covers table 0, " +
      "pairs dedup, cosines are exact") {
    // tables=1 with `planes` hyperplanes IS table 0 of the multi config
    // (hyperplaneMatrix(0, planes) == rows [0, planes) of
    // hyperplaneMatrix(0, tables*planes)), so with k >= corpus size the
    // multi-table result pairs must be a superset of the single-table
    // ones — the whole point of extra tables is candidates a single
    // table misses
    val rnd = new scala.util.Random(7)
    val df = vecDF((0L until 24L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f)): _*)
    def pairs(tables: Int) = Similarity.LshCosineTopK(
        d => d.filter($"vec_id" < 4), dim = 8, planes = 4,
        tables = tables, k = 100)
      .transform(df)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
    val single = pairs(1)
    val multi = pairs(4)
    assert(single.map(p => (p._1, p._2)).toSet
      .subsetOf(multi.map(p => (p._1, p._2)).toSet),
      "multi-table candidates must cover table 0's")
    assert(multi.size > single.size,
      "4 tables should surface candidates one table misses on 24 vectors")
    // the ids-only distinct must leave no duplicate pairs
    assert(multi.map(p => (p._1, p._2)).distinct.size == multi.size)
    // every multi cosine equals the exact brute-force cosine
    val brute = Similarity.CosineTopK(
        d => d.filter($"vec_id" < 4), k = 100)
      .transform(df).select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    multi.foreach { case (q, n, c) => assert(brute((q, n)) == c) }
    // cacheInputs (single materialization of each quantized side) must
    // not change anything
    val cached = Similarity.LshCosineTopK(
        d => d.filter(col("vec_id") < 4), dim = 8, planes = 4,
        tables = 4, k = 100, cacheInputs = true)
      .transform(df).select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
    assert(cached.sorted == multi.sorted)
  }

  test("IvfTopK: cacheCorpus produces bit-identical results to the " +
      "double-scan default") {
    val rnd = new scala.util.Random(11)
    val df = vecDF((0L until 30L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f)): _*)
    // col(), not $: the queries lambda is captured into the typed
    // assignment closure, and $ would drag the SparkSession along
    def run(cache: Boolean) = Similarity.IvfTopK(
        d => d.filter(col("vec_id") < 3), nlist = 4, nprobe = 2,
        k = 4, cacheCorpus = cache)
      .transform(df)
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(run(cache = false) == run(cache = true))
  }

  test("IncrementalIvf: fold == refit when the batch cannot displace " +
    "the centroid pick; probing finds folded vectors exactly") {
    val rnd = new scala.util.Random(13)
    val corpusRows = (0L until 20L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
    val corpus = vecDF(corpusRows: _*)
    val idx = Similarity.IncrementalIvf.memberIndex(corpus, nlist = 4)
    // choose batch ids whose md5 hash exceeds the 4th-smallest corpus
    // hash, so refit's deterministic centroid pick is UNCHANGED by the
    // batch — the exact fold == refit regime the scaladoc states
    val cutoff = (0L until 20L)
      .map(i => Portable.tokenHashLocal(i.toString)).sorted.apply(3)
    val batchIds = (100L until 300L)
      .filter(i => Portable.tokenHashLocal(i.toString) > cutoff).take(5)
    assert(batchIds.size == 5, "fixture: need 5 non-displacing ids")
    val batchRows = batchIds.map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
    val folded = Similarity.IncrementalIvf.foldBatch(idx,
      vecDF(batchRows: _*), nlist = 4)
    val refit = Similarity.IncrementalIvf.memberIndex(
      vecDF((corpusRows ++ batchRows): _*), nlist = 4)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cluster", $"q", $"nrm")
        .as[(Long, Long, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    assert(canon(folded) == canon(refit))
    // probe: a query identical to a folded vector must surface it at
    // rank 1 with cosine exactly 1.0
    val probe = Similarity.IncrementalIvfTopK(folded, nlist = 4,
        nprobe = 4, k = 3)
      .transform(vecDF(9999L -> batchRows.head._2))
      .select("rank", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(probe.head == ((1L, batchRows.head._1, 1.0)))
  }

  test("IncrementalIvf.foldBatch: an id whose hash would DISPLACE the " +
    "fit's centroid pick fails loud — stored cluster labels would " +
    "silently mismatch the re-derived centroids at probe time") {
    val rnd = new scala.util.Random(31)
    val corpusRows = (0L until 20L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
    val idx = Similarity.IncrementalIvf.memberIndex(
      vecDF(corpusRows: _*), nlist = 4)
    // an id hashing BELOW the 4th-smallest corpus hash displaces
    val cutoff = (0L until 20L)
      .map(i => Portable.tokenHashLocal(i.toString)).sorted.apply(3)
    val bad = (100L until 3000L)
      .find(i => Portable.tokenHashLocal(i.toString) < cutoff).get
    val e = intercept[Exception](
      Similarity.IncrementalIvf.foldBatch(idx,
        vecDF(bad -> Seq.fill(8)(0.5f)), nlist = 4).collect())
    assert(e.getMessage.contains("displace") ||
      (e.getCause != null && e.getCause.getMessage.contains("displace")))
    // an index smaller than nlist cannot fold at all (everything
    // displaces) — loud, with the re-fit remediation
    val tiny = Similarity.IncrementalIvf.memberIndex(
      vecDF(corpusRows.take(2): _*), nlist = 4)
    val e2 = intercept[Exception](
      Similarity.IncrementalIvf.foldBatch(tiny,
        vecDF(500L -> Seq.fill(8)(0.5f)), nlist = 4).collect())
    assert(e2.getMessage.contains("displace") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("displace")))
  }

  test("IncrementalIvf guards: duplicate fold ids, empty index, and an " +
    "nlist mismatch all fail loud") {
    val rnd = new scala.util.Random(17)
    val corpus = vecDF((0L until 12L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f)): _*)
    val idx = Similarity.IncrementalIvf.memberIndex(corpus, nlist = 4)
    // folding an id the index already holds raises in-plan
    val e1 = intercept[Exception](
      Similarity.IncrementalIvf.foldBatch(idx,
        vecDF(3L -> Seq.fill(8)(0.5f)), nlist = 4).collect())
    assert(e1.getMessage.contains("duplicated") ||
      (e1.getCause != null &&
        e1.getCause.getMessage.contains("duplicated")))
    // two rows sharing a vec_id WITHIN one batch also raise (ADVICE
    // r12: they both pass the index left-join) — use a non-displacing
    // id so the dup guard, not the displacement guard, is what fires
    val cutoff = (0L until 12L)
      .map(i => Portable.tokenHashLocal(i.toString)).sorted.apply(3)
    val freshId = (100L until 3000L)
      .find(i => Portable.tokenHashLocal(i.toString) > cutoff).get
    val eDup = intercept[Exception](
      Similarity.IncrementalIvf.foldBatch(idx,
        vecDF(freshId -> Seq.fill(8)(0.5f),
              freshId -> Seq.fill(8)(0.25f)), nlist = 4).collect())
    assert(eDup.getMessage.contains("duplicated") ||
      (eDup.getCause != null &&
        eDup.getCause.getMessage.contains("duplicated")))
    // and the same non-displacing id folded ONCE still folds fine
    assert(Similarity.IncrementalIvf.foldBatch(idx,
      vecDF(freshId -> Seq.fill(8)(0.5f)), nlist = 4).count() == 13L)
    // empty index: probe and fold both fail loud (nlist matches the
    // fit so the emptiness error — not the r13 metadata check — fires)
    val empty = idx.filter(org.apache.spark.sql.functions.lit(false))
    val e2 = intercept[IllegalArgumentException](
      Similarity.IncrementalIvfTopK(empty, nlist = 4)
        .transform(vecDF(1L -> Seq.fill(8)(1f))))
    assert(e2.getMessage.contains("empty member index"))
    val e3 = intercept[IllegalArgumentException](
      Similarity.IncrementalIvf.foldBatch(empty,
        vecDF(1L -> Seq.fill(8)(1f)), nlist = 4))
    assert(e3.getMessage.contains("empty member index"))
    // an index fit with nlist=8 probed with nlist=4 is a config drift —
    // since r13 the index's recorded fit metadata names both values
    // (FitParamsSpec pins the structural fallback for legacy indexes)
    val idx8 = Similarity.IncrementalIvf.memberIndex(corpus, nlist = 8)
    val e4 = intercept[IllegalArgumentException](
      Similarity.IncrementalIvfTopK(idx8, nlist = 4)
        .transform(vecDF(1L -> Seq.fill(8)(1f))))
    assert(e4.getMessage.contains("nlist=8") &&
      e4.getMessage.contains("nlist=4"))
  }

  test("LanguageId: argmax with first-wins tie-break and und fallback") {
    val df = docsDF(
      1L -> "the cat and the dog",   // en
      2L -> "der hund und die katze", // de
      3L -> "xyz qqq zzz")           // no markers -> und
    val out = TextAnalysis.LanguageId().transform(df)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "und")
  }

  test("Fingerprint roll_fp matches a driver-side reference fold") {
    val text = "alpha beta gamma"
    val expected = Seq("alpha", "beta", "gamma")
      .foldLeft(0L)((acc, t) =>
        (acc * 31L + Portable.tokenHashLocal(t)) % 1000000007L)
    val got = TextAnalysis.Fingerprint().transform(docsDF(1L -> text))
      .select("roll_fp").as[Long].head()
    assert(got == expected)
  }

  test("QualityScore ratios derive from exact counts") {
    val df = docsDF(1L -> "the quick fox")  // 3 tokens, 1 stopword
    val r = TextAnalysis.QualityScore().transform(df).head()
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Double]("stopword_ratio") == math.rint(1.0 / 3.0 * 1e6) / 1e6)
  }

  test("GopherRules: counters and every rule verdict on a hand-computed " +
    "fixture (bullets, both ellipsis forms, symbols, astral codepoints)") {
    // doc 1: clean prose, passes everything (stopwords the+of present)
    // doc 2: 3 of 4 lines bulleted (75% <= 90% passes r_bullet), but
    //        2 of 4 end with ellipsis (50% > 30% fails r_ellipsis)
    // doc 3: symbol-heavy: 3 marks over 4 words fails r_symbol_ratio;
    //        astral clef = ONE codepoint for word_chars
    // doc 4: numeric salad fails r_alpha (0 of 3 alpha) and stopwords
    val df = docsDF(
      1L -> "the size of the data stays small here now",
      2L -> "- alpha beta…\n- gamma of\n- the delta\nplain tail ...",
      3L -> "count # ## the…of 𝄞x ...",
      4L -> "123 456 789")
    val got = TextAnalysis.GopherRules(minWords = 3L, maxWords = 10L,
        stopwords = Seq("the", "of"))
      .transform(df).orderBy("doc_id").collect()

    val r1 = got(0)
    assert(r1.getAs[Long]("n_words") == 9L)
    assert(r1.getAs[Long]("word_chars") == 33L)
    assert(r1.getAs[Long]("n_lines") == 1L)
    assert(r1.getAs[Long]("stopword_hits") == 2L)
    assert(r1.getAs[Boolean]("admit"))

    val r2 = got(1)
    assert(r2.getAs[Long]("n_lines") == 4L)
    assert(r2.getAs[Long]("bullet_lines") == 3L)
    // lines ending "beta…" and "tail ..." (space-rtrim then match)
    assert(r2.getAs[Long]("ellipsis_lines") == 2L)
    assert(r2.getAs[Boolean]("r_bullet")) // 30 <= 36
    assert(!r2.getAs[Boolean]("r_ellipsis")) // 20 > 12
    assert(!r2.getAs[Boolean]("admit"))

    val r3 = got(2)
    // tokens: count / # / ## / the…of / 𝄞x / ... -> 6 words
    assert(r3.getAs[Long]("n_words") == 6L)
    // marks: 3 hashes + 1 "..." run + 1 unicode ellipsis = 5
    assert(r3.getAs[Long]("symbol_marks") == 5L)
    assert(!r3.getAs[Boolean]("r_symbol_ratio")) // 50 > 6
    // word_chars counts CODEPOINTS: 𝄞x is 2, the…of is 6:
    // 5 + 1 + 2 + 6 + 2 + 3 = 19
    assert(r3.getAs[Long]("word_chars") == 19L)
    // 'the…of' is one token — neither stopword matches whole-token
    assert(r3.getAs[Long]("stopword_hits") == 0L)

    val r4 = got(3)
    assert(r4.getAs[Long]("alpha_words") == 0L)
    assert(!r4.getAs[Boolean]("r_alpha"))
    assert(!r4.getAs[Boolean]("r_stopwords"))
    assert(r4.getAs[Boolean]("r_word_count")) // 3 in [3, 10]
    assert(!r4.getAs[Boolean]("admit"))
  }

  test("GopherRepetition: duplicate line/paragraph counters on a " +
    "hand-computed fixture; empty units dropped; k occurrences count " +
    "k-1 dups; codepoint weights") {
    // doc 1: lines [ab, cd, ab, ab] (+1 empty dropped), paras [whole]
    //   -> dup_lines 2, line_chars 8, dup_line_chars 4
    //   -> 10*2 > 3*4 fails r_dup_lines; 5*4 > 8 fails r_dup_line_chars
    // doc 2: two paragraphs, identical after space-trim -> dup_paras 1
    //   of 2 (fails 0.30), dup chars half (fails 0.20); its lines are
    //   [xx yy, xx yy] -> dup_lines 1 of 2 (fails) — all-false doc
    // doc 3: clean 3 distinct lines -> all rules pass
    val df = docsDF(
      1L -> "ab\ncd\n\nab\nab",
      2L -> "xx yy\n\nxx yy ",
      3L -> "one\ntwo\nthree")
    val got = TextAnalysis.GopherRepetition().transform(df)
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("n_lines") == 4L)
    assert(r1.getAs[Long]("dup_lines") == 2L)
    assert(r1.getAs[Long]("line_chars") == 8L)
    assert(r1.getAs[Long]("dup_line_chars") == 4L)
    // paragraphs: ["ab\ncd", "ab\nab"] -> 2 distinct
    assert(r1.getAs[Long]("n_paras") == 2L)
    assert(r1.getAs[Long]("dup_paras") == 0L)
    assert(!r1.getAs[Boolean]("r_dup_lines"))
    assert(!r1.getAs[Boolean]("r_dup_line_chars"))
    assert(r1.getAs[Boolean]("r_dup_paras"))
    assert(!r1.getAs[Boolean]("admit"))
    val r2 = got(1)
    assert(r2.getAs[Long]("n_paras") == 2L)
    assert(r2.getAs[Long]("dup_paras") == 1L) // trailing space trimmed
    assert(r2.getAs[Long]("dup_para_chars") == 5L)
    assert(r2.getAs[Long]("dup_lines") == 1L)
    assert(!r2.getAs[Boolean]("r_dup_paras"))
    assert(!r2.getAs[Boolean]("r_dup_para_chars"))
    assert(!r2.getAs[Boolean]("admit"))
    val r3 = got(2)
    assert(r3.getAs[Long]("dup_lines") == 0L &&
      r3.getAs[Long]("dup_paras") == 0L)
    assert(r3.getAs[Boolean]("admit"))
    // null text: -1 counters, all rules false
    val rn = TextAnalysis.GopherRepetition()
      .transform(docsDF(9L -> null)).head()
    assert(rn.getAs[Long]("n_lines") == -1L)
    assert(!rn.getAs[Boolean]("admit"))
  }

  test("GopherRepetition: n-gram character-fraction rules on a " +
    "hand-computed fixture — top family needs a REPEATED gram, dup " +
    "family covers each word position once across overlaps") {
    // doc 1: "ab cd ab cd ab zz" (17 chars)
    //   2-grams: [ab cd]x2? positions 1-5: "ab cd","cd ab","ab cd",
    //   "cd ab","ab zz" -> "ab cd" c=2 len=5 -> 10; "cd ab" c=2 -> 10
    //   top2 = 10; 10*5 > 1*17 -> r_top2_gram FALSE
    //   3-grams: "ab cd ab" c=2 (pos 1,3)? pos1="ab cd ab",
    //   pos2="cd ab cd", pos3="ab cd ab", pos4="cd ab zz" -> c=2,
    //   len=8 -> top3 = 16; 16*50 > 9*17 -> FALSE
    //   4-grams: pos1="ab cd ab cd", pos2="cd ab cd ab",
    //   pos3="ab cd ab zz" -> all unique -> top4 = 0 -> TRUE
    //   5-grams+: 2 grams, unique -> dup5..10 = 0 -> all TRUE
    val df = docsDF(1L -> "ab cd ab cd ab zz")
    val r1 = TextAnalysis.GopherRepetition().transform(df).head()
    assert(r1.getAs[Long]("rep_chars") == 17L)
    assert(r1.getAs[Long]("top2_chars") == 10L)
    assert(r1.getAs[Long]("top3_chars") == 16L)
    assert(r1.getAs[Long]("top4_chars") == 0L)
    assert(!r1.getAs[Boolean]("r_top2_gram"))
    assert(!r1.getAs[Boolean]("r_top3_gram"))
    assert(r1.getAs[Boolean]("r_top4_gram"))
    (5 to 10).foreach { n =>
      assert(r1.getAs[Long](s"dup${n}_chars") == 0L)
      assert(r1.getAs[Boolean](s"r_dup${n}_gram"))
    }
    assert(!r1.getAs[Boolean]("admit"))
    // doc 2: "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5 q99999999" (39 chars):
    //   the 5-gram "x1..x5" repeats at positions 1 and 6 -> covered
    //   word positions 1..10 (the overlap at position 6 counted once),
    //   chars = 20; 20*20 > 3*39 -> r_dup5_gram FALSE; no 6-gram
    //   repeats -> dup6..10 = 0 -> TRUE
    val r2 = TextAnalysis.GopherRepetition()
      .transform(docsDF(2L -> "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5 q99999999"))
      .head()
    assert(r2.getAs[Long]("rep_chars") == 39L)
    assert(r2.getAs[Long]("dup5_chars") == 20L)
    assert(!r2.getAs[Boolean]("r_dup5_gram"))
    assert(r2.getAs[Long]("dup6_chars") == 0L)
    assert(r2.getAs[Boolean]("r_dup6_gram"))
    // overlap-once semantics directly on the helper: ten single-char
    // words, the repeated 5-gram's two occurrences share nothing but
    // every position is covered exactly once -> 10, not 2x5x2
    val helpers = graft.operators.TextAnalysis.GopherRepetition
    val toks = "a b c d e a b c d e".split(" ")
    val wlen = toks.map(_.length.toLong)
    val cov = helpers.dupGramChars(helpers.internTokens(toks), wlen, 5,
      new Array[Boolean](toks.length))
    assert(cov == 10L)
  }

  test("GopherRepetition: CRLF and whitespace-blank paragraph " +
    "separators — \\r\\n\\r\\n and \\n \\t \\n both split paragraphs") {
    // all three docs have the same two paragraphs [aa bb, aa bb]
    // under the normalized contract -> dup_paras 1, and the same two
    // LINES after CRLF normalization
    val variants = docsDF(
      1L -> "aa bb\n\naa bb",       // plain LF blank line
      2L -> "aa bb\r\n\r\naa bb",   // CRLF blank line
      3L -> "aa bb\n \t \naa bb")   // whitespace-only blank line
    val got = TextAnalysis.GopherRepetition().transform(variants)
      .orderBy("doc_id").collect()
    got.foreach { r =>
      assert(r.getAs[Long]("n_paras") == 2L,
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[Long]("n_paras")}")
      assert(r.getAs[Long]("dup_paras") == 1L)
      assert(r.getAs[Long]("para_chars") == 10L)
      assert(r.getAs[Long]("dup_para_chars") == 5L)
      assert(!r.getAs[Boolean]("r_dup_paras"))
    }
    // lines: docs 1 and 2 agree exactly (CRLF normalized away); doc 3's
    // middle line " \t " space-trims to "\t" — NON-empty (the unit trim
    // strips spaces only, the DuckDB trim default), so it stays a line
    // even though the paragraph regex treats it as a separator
    assert(got(0).getAs[Long]("n_lines") == 2L)
    assert(got(1).getAs[Long]("n_lines") == 2L)
    assert(got(2).getAs[Long]("n_lines") == 3L)
    assert(got.forall(_.getAs[Long]("dup_lines") == 1L))
    // output-column collision fails loud
    val e = intercept[IllegalArgumentException](
      TextAnalysis.GopherRepetition().transform(
        variants.withColumn("rep_chars",
          org.apache.spark.sql.functions.lit(1L))))
    assert(e.getMessage.contains("rep_chars"))
  }

  test("C4Clean: line retention (terminal punct incl. closing quote, " +
    "min words, the javascript word), document rules (sentence marks " +
    "in RETAINED text, brace, lorem ipsum, blocklist), CRLF, null") {
    val df = docsDF(
      1L -> ("good line with five words.\nshort one.\n" +
        "no punct line here okay\nuse javascript for this page.\n" +
        "another good line right here!"),
      2L -> ("one two three four five.\nsix seven eight nine ten?\n" +
        "\"quoted line of five words.\""),
      3L -> ("has a brace { in it and five words.\n" +
        "more of the same five words here.\n" +
        "third full line of words here."),
      4L -> ("lorem ipsum is here with six words.\n" +
        "second line has five good words.\n" +
        "third line has five good words!"),
      5L -> ("this badword appears with five words.\n" +
        "second line has five good words.\n" +
        "third line has five good words!"),
      6L -> null,
      7L -> "aa bb cc dd ee.\r\nff gg hh ii jj.\r\nkk ll mm nn oo.")
    val got = TextAnalysis.C4Clean(blockWords = Seq("badword"))
      .transform(df).orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("n_lines") == 5L)
    assert(r1.getAs[Long]("kept_lines") == 2L)
    assert(r1.getAs[Long]("js_lines") == 1L)
    assert(r1.getAs[Long]("n_sentences") == 2L)
    assert(r1.getAs[String]("clean_text") ==
      "good line with five words.\nanother good line right here!")
    assert(!r1.getAs[Boolean]("r_sentences") && // 2 < 3
      !r1.getAs[Boolean]("admit"))
    val r2 = got(1)
    assert(r2.getAs[Long]("kept_lines") == 3L) // the quote ending kept
    assert(r2.getAs[Long]("n_sentences") == 3L)
    assert(r2.getAs[Boolean]("admit"))
    val r3 = got(2)
    assert(r3.getAs[Long]("kept_lines") == 3L)
    assert(r3.getAs[Boolean]("has_brace") &&
      !r3.getAs[Boolean]("r_brace") && !r3.getAs[Boolean]("admit"))
    val r4 = got(3)
    assert(r4.getAs[Boolean]("has_lorem") && !r4.getAs[Boolean]("admit"))
    val r5 = got(4)
    assert(r5.getAs[Long]("block_hits") == 1L &&
      !r5.getAs[Boolean]("r_block") && !r5.getAs[Boolean]("admit"))
    val r6 = got(5)
    assert(r6.getAs[Long]("n_lines") == -1L &&
      r6.getAs[String]("clean_text") == null &&
      !r6.getAs[Boolean]("admit"))
    val r7 = got(6) // CRLF normalized: 3 kept lines, 3 sentences
    assert(r7.getAs[Long]("n_lines") == 3L &&
      r7.getAs[Long]("kept_lines") == 3L &&
      r7.getAs[Long]("n_sentences") == 3L && r7.getAs[Boolean]("admit"))
    // parameter and collision validation
    assertThrows[IllegalArgumentException](
      TextAnalysis.C4Clean(blockWords = Seq("Mixed")))
    assertThrows[IllegalArgumentException](
      TextAnalysis.C4Clean(blockWords = Seq("a", "a")))
    assertThrows[IllegalArgumentException](
      TextAnalysis.C4Clean().transform(
        df.withColumn("clean_text",
          org.apache.spark.sql.functions.lit("x"))))
  }

  test("GopherRules: null text, trailing-empty line kept, parameter " +
    "validation") {
    val got = TextAnalysis.GopherRules()
      .transform(docsDF(1L -> null, 2L -> "one line\n"))
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_words") == -1L)
    assert(!got(0).getAs[Boolean]("admit"))
    // "one line\n" splits to 2 lines (trailing empty KEPT — the
    // DuckDB string_split mirror), not java.lang.String#split's 1
    assert(got(1).getAs[Long]("n_lines") == 2L)
    assertThrows[IllegalArgumentException](
      TextAnalysis.GopherRules(minWords = 5L, maxWords = 4L))
    assertThrows[IllegalArgumentException](
      TextAnalysis.GopherRules(stopwords = Seq("the", "the")))
    assertThrows[IllegalArgumentException](
      TextAnalysis.GopherRules(stopwords = Seq.empty))
  }

  test("TokenEntropy: closed-form values, null text, case folding, " +
    "row preservation") {
    val df = Seq(
      (1L, "a a a a"),          // single class -> exactly 0 bits
      (2L, "a b c d"),          // 4 uniform classes -> exactly 2 bits
      (3L, "a a b b"),          // 2 uniform classes -> exactly 1 bit
      (4L, "a A b"),            // folds to (a:2, b:1)
      (5L, null.asInstanceOf[String]),
      (6L, ""))                 // one empty token -> 0 bits
      .toDF("doc_id", "text")
    val got = TextAnalysis.TokenEntropy().transform(df)
      .select("doc_id", "entropy").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(0.0))
    assert(got(2L).contains(2.0))
    assert(got(3L).contains(1.0))
    // H(2/3, 1/3) = log2(3) - 2/3
    val h3 = BigDecimal(Math.log(3.0) / Math.log(2.0) -
        (2.0 * (Math.log(2.0) / Math.log(2.0))) / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(4L).contains(h3))
    assert(got(5L).isEmpty)   // null text -> null entropy, row kept
    assert(got(6L).contains(0.0))
    assert(got.size == 6)     // row-preserving
    // output-column collision rejected, any case
    val bad = Seq((1L, "x", 0.0)).toDF("doc_id", "text", "ENTROPY")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.TokenEntropy().transform(bad)
    }
    assert(e.getMessage.contains("entropy"))
  }

  test("MediaFeatures rejects non-image payloads loud (r13: the stub " +
    "is retired — every media class has a real decoder)") {
    val df = docsDF(1L -> "some payload text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.MediaFeatures().transform(df).collect())
    assert(e.getMessage.contains("media 1") ||
      (e.getCause != null && e.getCause.getMessage.contains("media 1")))
  }

  test("connectedComponents: chains merge, components stay separate") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents: long chain needs multiple propagation rounds") {
    val pairs = (1L until 12L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L) && got.size == 12)
  }

  test("connectedComponents: pointer jumping converges on a 40-chain " +
      "within the default 20-iteration budget") {
    // plain one-hop propagation needs O(diameter)=40 rounds; the
    // pointer-jump shortcut gets there in O(log d) and must not throw
    val pairs = (1L until 41L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L) && got.size == 41)
  }

  test("connectedComponents: non-convergence throws by default, warns " +
      "and returns partial labels when asked") {
    val pairs = (1L until 30L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIterations = 1)
    }
    val partial = Dedup.connectedComponents(pairs, maxIterations = 1,
      failOnNonConvergence = false)
    assert(partial.count() == 30)
  }

  test("connectedComponents: empty edges yield empty result") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(pairs).count() == 0)
  }

  test("connectedComponents: superseded round checkpoints are freed — " +
      "storage stays flat regardless of iteration count") {
    // round-5 judge finding #2: every round's localCheckpoint labels used
    // to stay persisted for the life of the returned frame (20 rounds =
    // 20x label storage, and the bench-JVM memory squeeze behind the
    // ann_ivf 6.4x breach). Only the FINAL labels' blocks may survive.
    val sc = spark.sparkContext
    // clean slate: other specs in the JVM may have leaked blocks
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = sc.getPersistentRDDs.size
    val pairs = (1L until 41L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs) // ~7 pointer-jump rounds
    assert(got.count() == 41)
    val leaked = sc.getPersistentRDDs.size - before
    assert(leaked <= 1,
      s"$leaked persistent RDDs after CC — superseded round cuts leak")
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("connectedComponents: reliable checkpoint path matches local") {
    // at cluster scale localCheckpoint lineage dies with a lost
    // executor; checkpointDir opts into fault-tolerant checkpoint()
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt")
    try {
      val got = Dedup
        .connectedComponents(pairs, checkpointDir = Some(dir.toString))
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
      // the reliable checkpoint actually wrote RDD blocks. Files land in
      // the session's EFFECTIVE checkpoint dir — by design the first
      // setter in the shared session wins (never-clobber), so another
      // spec may have claimed it before this one runs
      val eff = java.nio.file.Paths.get(
        new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath)
      assert(java.nio.file.Files.walk(eff).count() > 1)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator.asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("NGramJaccard capped plan carries no forced broadcast hint") {
    val df = docsDF(1L -> "a b c d e", 2L -> "a b c d x")
    val plan = Dedup.NGramJaccard(threshold = 0.1, maxDocFreq = 10)
      .transform(df).queryExecution.analyzed.toString
    assert(!plan.contains("ResolvedHint"), plan)
  }

  test("RepetitionScore: duplicate n-gram ratios with short-doc guard") {
    val df = docsDF(
      1L -> "a b a b a b",   // 2-grams: ab ba ab ba ab -> 5 total 2 distinct
      2L -> "w x y z",       // all distinct -> 0
      3L -> "solo")          // too short for any n-gram
    val out = TextAnalysis.RepetitionScore().transform(df)
      .select("doc_id", "n_2grams", "dup_2gram_ratio", "n_3grams",
        "dup_3gram_ratio", "repetition_score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out(1L) == ((5L, 0.6, 4L, 0.5, 0.6)))
    assert(out(2L) == ((3L, 0.0, 2L, 0.0, 0.0)))
    assert(out(3L) == ((0L, 0.0, 0L, 0.0, 0.0)))
  }

  test("PiiScrub redacts emails, IPs and phones with counts") {
    val df = docsDF(
      1L -> "mail a.b+c@site.io or +44 20 7946-0958 from 192.168.0.1",
      2L -> "clean text only")
    val out = TextAnalysis.PiiScrub().transform(df)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "scrubbed")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) ==
      ((1L, 1L, 1L, "mail <EMAIL> or <PHONE> from <IP>")))
    assert(out(2L) == ((0L, 0L, 0L, "clean text only")))
  }

  test("PiiScrub: overlapping matches count what was actually redacted") {
    // the IPv4 regex would also match the all-digit email local part;
    // the email pass consumes it first, so it must count as ONE email
    // and ZERO ips — audit counts mirror the performed replacements
    val df = docsDF(1L -> "reach me at 1.2.3.4@example.com")
    val r = TextAnalysis.PiiScrub().transform(df).head()
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_ips") == 0L)
    assert(r.getAs[String]("scrubbed") == "reach me at <EMAIL>")
  }

  test("Normalize strips tags, collapses whitespace, lowercases") {
    val df = docsDF(1L -> "<p>Hello   <b>World</b></p>\n extra")
    val r = TextAnalysis.Normalize().transform(df).head()
    assert(r.getAs[String]("norm_text") == "hello world extra")
    assert(r.getAs[Long]("norm_len") == 17L)
  }

  test("selectCanonical keeps the best-scoring doc per cluster and every " +
    "singleton") {
    import spark.implicits._
    val scored = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.3), (9L, 0.1))
      .toDF("doc_id", "quality_score")
    // cluster {1,2,3} (2 and 3 tie on score -> smaller id wins), {4};
    // 9 has no cluster row = singleton
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "component")
    val got = Dedup.selectCanonical(scored, clusters)
      .select("doc_id", "component", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true), (9L, 9L, true)))
  }

  test("selectCanonical fails loudly on a component wider than " +
    "maxClusterSize (mis-thresholded upstream would otherwise build a " +
    "corpus-sized window partition silently)") {
    import spark.implicits._
    // adversarial all-connected cluster: every doc in ONE component
    val n = 50L
    val scored = (1L to n).map(i => (i, i / 100.0))
      .toDF("doc_id", "quality_score")
    val clusters = (1L to n).map(i => (i, 1L)).toDF("doc_id", "component")
    val e = intercept[Exception] {
      Dedup.selectCanonical(scored, clusters, maxClusterSize = 10L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxClusterSize")), e.toString)
    // a cap at the component size passes, and <= 0 disables the guard
    val ok = Dedup.selectCanonical(scored, clusters, maxClusterSize = n)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSeq
    assert(ok == Seq(n)) // best score wins
    val off = Dedup.selectCanonical(scored, clusters, maxClusterSize = 0L)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSeq
    assert(off == Seq(n))
  }
}
