package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.testing._

/** The DataTestCase golden+mutation protocol applied to the corpus
  * operators (the interval identifier has its own in
  * IntervalMutationSpec): every declared cell perturbation must change
  * the output, or the golden constrains nothing — and the repartition
  * hook pins shuffle invariance for the two operators whose algebra is
  * most sensitive to physical layout (rank location and the distributed
  * prefix sum).
  */
class CorpusMutationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("quantile_stats golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.QuantileStats(Seq("g"), "v", Seq(0.5)).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq("a", 2L), Seq("a", 4L), Seq("a", 3L), Seq("a", 1L),
          Seq("b", 20L), Seq("b", 10L)),
        Seq("g:s", "v:i"))
      // a: sorted [1,2,3,4], rank ceil(0.5*4)=2 -> 2; b: rank 1 -> 10
      def expected = PlainFrame.fromPlain(
        Seq(Seq("a", 4L, 2L), Seq("b", 2L, 10L)),
        Seq("g:s", "n:i", "p50:i"))
      override def mutants = Seq(
        ValueMutant("v", 0, 100L), // a's sorted set shifts: p50 2 -> 3
        ValueMutant("g", 5, "a"),  // group move changes both n's
        RandomMutant(count = 1, seed = 7L, columns = Seq("v")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(4))
  }

  test("decontaminate golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.Decontaminate(evalDocs = _.filter(col("doc_id") >= 10),
        n = 2).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "the cat sat here"),  // 2-shingles: the cat/cat sat/sat here
          Seq(2L, "dog runs fast"),     // dog runs/runs fast
          Seq(3L, "tiny"),              // < n tokens -> zero shingles
          Seq(10L, "the cat sat on mat")), // EVAL doc (id >= 10)
        Seq("doc_id:i", "text:s"))
      // doc 1 shares {the cat, cat sat} with the eval set -> 2/3
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 3L, 2L, 0.666667, true),
          Seq(2L, 2L, 0L, 0.0, false),
          Seq(3L, 0L, 0L, 0.0, false)),
        Seq("doc_id:i", "n_shingles:i", "n_overlap:i",
          "contamination_ratio:f", "contaminated:b"))
      override def mutants = Seq(
        ValueMutant("text", 1, "the cat runs"),  // doc 2 gains an overlap
        ValueMutant("text", 3, "dog runs everywhere"), // EVAL text: overlaps flip
        ValueMutant("doc_id", 2, 11L), // doc 3 becomes eval -> row drops
        ValueMutant("text", 2, "a b c")) // zero-shingle doc gains shingles
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("contamination_report golden: killed mutants + repartition " +
    "invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.ContaminationReport(evalDocs = _.filter(col("doc_id") >= 10),
        n = 2, maxDocFreq = 1L).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "the cat sat"),      // train: {the cat, cat sat}
          Seq(2L, "the cat ran"),      // train: {the cat, cat ran}
          Seq(3L, "dog barks loud"),   // train, unrelated
          Seq(10L, "the cat sat here"), // eval
          Seq(11L, "nothing matches"),  // eval, clean
          Seq(12L, "x")),               // eval, shingle-free
        Seq("doc_id:i", "text:s"))
      // eval 10: 3 shingles, 2 contaminated; n_train_docs counts only
      // df<=1 shingles — "the cat" (df=2) is capped out, leaving the
      // single "cat sat" -> train 1
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq[Any](10L, 3L, 2L, 1L, 0.666667),
          Seq[Any](11L, 1L, 0L, 0L, 0.0),
          Seq[Any](12L, 0L, 0L, 0L, 0.0)),
        Seq("doc_id:i", "n_shingles:i", "n_contaminated:i",
          "n_train_docs:i", "contamination_ratio:f"))
      override def mutants = Seq(
        // train 2 rewrites to share eval 10's tail: contamination AND
        // the pair count rise
        ValueMutant("text", 1, "sat here now"),
        // a train doc becomes eval: a new report row appears
        ValueMutant("doc_id", 2, 13L),
        // the clean eval doc turns into the CAPPED hot shingle: its
        // contamination flips to 1/1 while n_train_docs stays 0 — kills
        // any implementation that drops capped shingles from the
        // contamination count too
        ValueMutant("text", 4, "the cat"))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("boilerplate_score golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.BoilerplateScore(n = 2, maxDocFreq = 2L).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "visit our site now"),
          Seq(2L, "visit our site today"),
          Seq(3L, "visit our site again"),
          Seq(4L, "fresh unique content")),
        Seq("doc_id:i", "text:s"))
      // df("visit our") = df("our site") = 3 > 2 -> the hot set; each
      // template doc carries 2 hot of 3 shingles
      def expected = PlainFrame.fromPlain(
        Seq(
          // Seq[Any]: all-numeric literal rows would otherwise widen the
          // longs to Double (Scala weak conformance) and fail dtype checks
          Seq[Any](1L, 3L, 2L, 0.666667),
          Seq[Any](2L, 3L, 2L, 0.666667),
          Seq[Any](3L, 3L, 2L, 0.666667),
          Seq[Any](4L, 2L, 0L, 0.0)),
        Seq("doc_id:i", "n_shingles:i", "n_boiler:i", "boiler_ratio:f"))
      override def mutants = Seq(
        // doc 3 leaves the template: both shingles drop to df=2, the hot
        // set empties, docs 1-2 lose their boiler counts
        ValueMutant("text", 2, "something else entirely"),
        ValueMutant("text", 3, "visit our site often"), // doc 4 joins it
        ValueMutant("doc_id", 0, 5L))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("vocab_topk golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.VocabTopK(k = 3).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "apple banana apple"),
          Seq(2L, "apple cherry"),
          Seq(3L, "banana apple")),
        Seq("doc_id:i", "text:s"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq("apple", 4L, 3L),
          Seq("banana", 2L, 2L),
          Seq("cherry", 1L, 1L)),
        Seq("token:s", "term_freq:i", "doc_freq:i"))
      override def mutants = Seq(
        ValueMutant("text", 1, "cherry cherry cherry cherry"), // reorders
        ValueMutant("text", 0, "banana banana banana"),
        RandomMutant(count = 1, seed = 11L, columns = Seq("text")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("tfidf golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame = TfIdf(k = 2).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "apple apple banana"),
          Seq(2L, "banana cherry"),
          Seq(3L, "cherry durian cherry")),
        Seq("doc_id:i", "text:s"))
      // N=3; idf(df=1) = ln(2)+1 = 1.693147..., idf(df=2) = ln(4/3)+1 =
      // 1.287682...; doc 2 is a full tie broken by term asc
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 1L, "apple", 2L, 1L, 3.386294),
          Seq(1L, 2L, "banana", 1L, 2L, 1.287682),
          Seq(2L, 1L, "banana", 1L, 2L, 1.287682),
          Seq(2L, 2L, "cherry", 1L, 2L, 1.287682),
          Seq(3L, 1L, "cherry", 2L, 2L, 2.575364),
          Seq(3L, 2L, "durian", 1L, 1L, 1.693147)),
        Seq("doc_id:i", "rank:i", "term:s", "tf:i", "df:i", "tfidf:f"))
      override def mutants = Seq(
        ValueMutant("text", 0, "banana banana banana"), // df + tf reshuffle
        ValueMutant("text", 2, "apple"), // apple df 1->2: every idf shifts
        RandomMutant(count = 1, seed = 13L, columns = Seq("text")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  /** The operator's md5 bucket, recomputed independently. Goldens below
    * derive their expected rows from this so the hash order is explicit
    * in the test, not copied from the implementation's output.
    */
  private def bucketOf(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)

  test("quota_sample golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Sampling.QuotaSample(Map("en" -> 2L), defaultQuota = 10L)
        .transform(df)
        .select("doc_id", "lang", "sample_bucket", "quota_rank")
    // en = {1,2,3} quota 2 (one dropped), de = {4,5} default quota 10
    val enOrder = Seq(1L, 2L, 3L).sortBy(id => (bucketOf(id), id))
    val deOrder = Seq(4L, 5L).sortBy(id => (bucketOf(id), id))
    val expRows: Seq[Seq[Any]] =
      enOrder.take(2).zipWithIndex.map { case (id, i) =>
        Seq[Any](id, "en", bucketOf(id), (i + 1).toLong)
      } ++ deOrder.zipWithIndex.map { case (id, i) =>
        Seq[Any](id, "de", bucketOf(id), (i + 1).toLong)
      }
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1L, "en"), Seq(2L, "en"), Seq(3L, "en"),
          Seq(4L, "de"), Seq(5L, "de")),
        Seq("doc_id:i", "lang:s"))
      def expected = PlainFrame.fromPlain(expRows,
        Seq("doc_id:i", "lang:s", "sample_bucket:s", "quota_rank:i"))
      override def mutants = Seq(
        // a KEPT en doc changes stratum: its output lang flips and the
        // en quota admits the previously-dropped doc
        ValueMutant("lang", (enOrder.head - 1L).toInt, "de"),
        // the DROPPED en doc moves to de, where the quota keeps it
        ValueMutant("lang", (enOrder.last - 1L).toInt, "de"),
        // a kept de doc's id (and hash) change is visible in the output
        ValueMutant("doc_id", 3, 99L))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("group_topk golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Sampling.GroupTopK(k = 2L, groupColumn = "g", scoreColumn = "v",
        keyColumn = "id").transform(df)
        .select("id", "g", "v", "group_rank")
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq("a", 1L, 10L), Seq("a", 2L, 20L), Seq("a", 3L, 20L),
          Seq("a", 4L, 30L),
          Seq("b", 5L, 5L), Seq("b", 6L, 5L)),
        Seq("g:s", "id:i", "v:i"))
      // a: 30 -> rank 1; the 20-tie breaks by id asc -> id 2 rank 2;
      // b: tie at 5 -> id 5 rank 1, id 6 rank 2
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq[Any](2L, "a", 20L, 2L),
          Seq[Any](4L, "a", 30L, 1L),
          Seq[Any](5L, "b", 5L, 1L),
          Seq[Any](6L, "b", 5L, 2L)),
        Seq("id:i", "g:s", "v:i", "group_rank:i"))
      override def mutants = Seq(
        ValueMutant("v", 0, 99L),  // id 1 takes rank 1, id 2 drops out
        ValueMutant("g", 3, "b"),  // 30 moves to b: both groups reshuffle
        ValueMutant("id", 1, 9L))  // the 20-tie now breaks toward id 3
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("mix_budget golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.MixBudget(Map("en" -> 5L), defaultBudget = 4L).transform(df)
        .select("doc_id", "lang", "n_tokens", "cum_tokens", "sample_bucket")
    // token weights: en ids 1,2,3 -> 2,3,2 (sum 7 > budget 5, so the
    // take-while prefix cuts); de ids 4,5 -> 2,3 (sum 5 > budget 4)
    val weights = Map(1L -> 2, 2L -> 3, 3L -> 2, 4L -> 2, 5L -> 3)
    def text(id: Long) = Seq.fill(weights(id))("t").mkString(" ")
    def prefix(ids: Seq[Long], budget: Long): Seq[(Long, Long)] = {
      val order = ids.sortBy(id => (bucketOf(id), id))
      var cum = 0L
      order.iterator.map { id => cum += weights(id); (id, cum) }
        .takeWhile(_._2 <= budget).toSeq
    }
    val en = prefix(Seq(1L, 2L, 3L), 5L)
    val de = prefix(Seq(4L, 5L), 4L)
    assert(en.size < 3 && de.size < 2) // the golden must exercise the cut
    val expRows: Seq[Seq[Any]] =
      en.map { case (id, cum) =>
        Seq[Any](id, "en", weights(id).toLong, cum, bucketOf(id)) } ++
      de.map { case (id, cum) =>
        Seq[Any](id, "de", weights(id).toLong, cum, bucketOf(id)) }
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1L, "en", text(1L)), Seq(2L, "en", text(2L)),
          Seq(3L, "en", text(3L)), Seq(4L, "de", text(4L)),
          Seq(5L, "de", text(5L))),
        Seq("doc_id:i", "lang:s", "text:s"))
      def expected = PlainFrame.fromPlain(expRows,
        Seq("doc_id:i", "lang:s", "n_tokens:i", "cum_tokens:i",
          "sample_bucket:s"))
      override def mutants = Seq(
        // the first kept en doc balloons past the budget: it and every
        // doc after it in hash order drop (inclusive prefix semantics)
        ValueMutant("text", (en.head._1 - 1L).toInt, "t t t t t t"),
        // a kept de doc changes stratum: weights shift in both strata
        ValueMutant("lang", (de.head._1 - 1L).toInt, "en"),
        // a kept doc's id changes the output row (and its hash position)
        ValueMutant("doc_id", (en.head._1 - 1L).toInt, 99L))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("quality_winsor golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.QuantileClamp(Seq("g"), "v", lo = 0.25, hi = 0.75)
        .transform(df)
        .select("id", "g", "v", "v_winsor", "band_lo", "band_hi")
    // g: sorted [1,2,3,4] -> p25 = rank ceil(1)=1 -> 1; p75 = rank 3 -> 3
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq("g", 1L, 4L), Seq("g", 2L, 1L), Seq("g", 3L, 2L),
          Seq("g", 4L, 3L)),
        Seq("g:s", "id:i", "v:i"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq[Any](1L, "g", 4L, 3L, 1L, 3L), // clamped down to p75
          Seq[Any](2L, "g", 1L, 1L, 1L, 3L),
          Seq[Any](3L, "g", 2L, 2L, 1L, 3L),
          Seq[Any](4L, "g", 3L, 3L, 1L, 3L)),
        Seq("id:i", "g:s", "v:i", "v_winsor:i", "band_lo:i",
          "band_hi:i"))
      override def mutants = Seq(
        // the max value changes: p75 moves, so the clamp band moves
        ValueMutant("v", 0, 100L),
        // a group move changes both thresholds AND the row's band
        ValueMutant("g", 1, "h"),
        // an id change moves an output row
        ValueMutant("id", 2, 99L))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("sample_dsir golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Dsir.ImportanceResample("seed", fraction = 0.5, numFeatures = 64)
        .transform(df)
        .select("doc_id", "dsir_score")
    // two clean score classes, cut exactly at the class edge so no
    // md5 tie-break is needed: "good" docs score the positive ratio
    // (ct=1, cr=2, T=1, R=8, V=2 -> round(ln(20/9)*1e6) = 798508 per
    // token), "bad bad" docs score 2*round(ln(10/21)*1e6); k = 3 keeps
    // exactly the good class. Scores are part of the golden, so any
    // count/class perturbation shows even when the kept SET survives
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "good", "seed"), Seq(2L, "good", "web"),
          Seq(3L, "good", "web"), Seq(4L, "bad bad", "web"),
          Seq(5L, "bad bad", "web"), Seq(6L, "bad bad", "web")),
        Seq("doc_id:i", "text:s", "source:s"))
      def expected = PlainFrame.fromPlain(
        Seq(Seq(1L, 798508L), Seq(2L, 798508L), Seq(3L, 798508L)),
        Seq("doc_id:i", "dsir_score:i"))
      override def mutants = Seq(
        // doc 1 defects to the bad class: the kept set AND the counts
        // behind every score change
        ValueMutant("text", 0, "bad bad"),
        // a second doc turns target: T doubles, the ratio moves
        ValueMutant("source", 1, "seed"),
        // a bad doc turns good: the good class outgrows k, and cr
        // shifts recompute the surviving scores
        ValueMutant("text", 5, "good"),
        RandomMutant(count = 1, seed = 11L, columns = Seq("text")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("bigram_logprob golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.BigramLogProb().transform(df)
    // bigrams: "a b"=2, "b a"=2, "a c"=1; contexts: a=3, b=2
    def lp(c: Long, p: Long): Long =
      math.round(math.log(c.toDouble / p.toDouble) * 1e6)
    def score(lpSum: Long, n: Long): Double =
      BigDecimal(lpSum.toDouble / (n.toDouble * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1L, "a b a b"), Seq(2L, "b a c")),
        Seq("doc_id:i", "text:s"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq[Any](1L, 3L, score(2 * lp(2, 3) + lp(2, 2), 3)),
          Seq[Any](2L, 2L, score(lp(2, 2) + lp(1, 3), 2))),
        Seq("doc_id:i", "n_bigrams:i", "avg_bigram_logprob:f"))
      override def mutants = Seq(
        // doc 2 reverses: its bigrams flip to "c a"/"a b"-class pairs,
        // changing BOTH docs' conditional distributions
        ValueMutant("text", 1, "c a b"),
        // doc 1 loses a token: one "a b" occurrence leaves the counts
        ValueMutant("text", 0, "a b a"),
        // a doc id change moves an output row
        ValueMutant("doc_id", 1, 99L))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("unigram_logprob golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.UnigramLogProb().transform(df)
    // counts: a=2, b=2, c=1; total=5
    def lp(cnt: Long): Long = math.round(math.log(cnt / 5.0) * 1e6)
    def score(lpSum: Long, n: Long): Double =
      BigDecimal(lpSum.toDouble / (n.toDouble * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1L, "a a b"), Seq(2L, "b c")),
        Seq("doc_id:i", "text:s"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq[Any](1L, 3L, score(2 * lp(2) + lp(2), 3)),
          Seq[Any](2L, 2L, score(lp(2) + lp(1), 2))),
        Seq("doc_id:i", "n_tokens:i", "avg_logprob:f"))
      override def mutants = Seq(
        // doc 2 loses the rare token: c's count leaves the corpus
        // distribution, so EVERY doc's probabilities shift
        ValueMutant("text", 1, "b b"),
        // doc 1 gains a token: total changes, all logprobs shift
        ValueMutant("text", 0, "a a b b"),
        ValueMutant("doc_id", 0, 9L))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("shard_pack golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.ShardPack(targetBytes = 25L, partitions = 2).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(3L, 30L), Seq(1L, 10L), Seq(2L, 20L)), // unsorted input
        Seq("doc_id:i", "n_chars:i"))
      // key order 1,2,3: cum 10,30,60; shard = before/25 -> 0,0,1
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 10L, 10L, 0L), Seq(2L, 20L, 30L, 0L),
          Seq(3L, 30L, 60L, 1L)),
        Seq("doc_id:i", "n_chars:i", "cum_bytes:i", "shard:i"))
      override def mutants = Seq(
        ValueMutant("n_chars", 1, 40L), // shifts every later cum + shard
        ValueMutant("doc_id", 0, 0L),   // reorders the prefix sum
        RandomMutant(count = 1, seed = 5L, columns = Seq("n_chars")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("chunk_split golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      ChunkSplit(chunkTokens = 3, overlapTokens = 1).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1L, "a b c d e"), Seq(2L, "x y")),
        Seq("doc_id:i", "text:s"))
      // doc 1: n=5, stride=2, starts < max(5-1,1)=4 -> 0, 2
      // doc 2: n=2, starts < max(1,1)=1 -> 0 (short tail chunk)
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 0L, 0L, 3L, "a b c"),
          Seq(1L, 1L, 2L, 3L, "c d e"),
          Seq(2L, 0L, 0L, 2L, "x y")),
        Seq("doc_id:i", "chunk_idx:i", "chunk_start:i",
          "n_chunk_tokens:i", "chunk_text:s"))
      override def mutants = Seq(
        ValueMutant("text", 0, "a b c d e f"), // n=6: a third chunk appears
        ValueMutant("text", 1, "x"),           // tail chunk shrinks
        RandomMutant(count = 1, seed = 3L, columns = Seq("text")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("shuffle_interleave golden: killed mutants + repartition " +
    "invariance (md5 order precomputed: 1 < 2 < 4 < 3)") {
    def run(df: DataFrame): DataFrame =
      InterleaveShuffle(numShards = 2).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1L, "p"), Seq(2L, "q"), Seq(3L, "r"), Seq(4L, "s")),
        Seq("doc_id:i", "text:s"))
      // md5("graft:i")[:8]: 1=18245cfa 2=51573f8d 3=e17a8e1b 4=ac4b8681
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "p", "18245cfa", 0L, 0L, 0L),
          Seq(2L, "q", "51573f8d", 1L, 1L, 0L),
          Seq(4L, "s", "ac4b8681", 2L, 0L, 1L),
          Seq(3L, "r", "e17a8e1b", 3L, 1L, 1L)),
        Seq("doc_id:i", "text:s", "shuffle_key:s", "global_pos:i",
          "shard:i", "pos_in_shard:i"))
      override def mutants = Seq(
        ValueMutant("doc_id", 2, 9L), // different key: permutation shifts
        RandomMutant(count = 1, seed = 11L, columns = Seq("doc_id")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("neardup_decontaminate golden: killed mutants + repartition " +
    "invariance") {
    val evalText = "the quick brown fox jumps over the lazy dog"
    def run(df: DataFrame): DataFrame =
      Corpus.NearDupDecontaminate(_.filter(col("doc_id") === 0L),
        threshold = 0.5).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(0L, evalText),                         // eval doc
          Seq(1L, evalText),                         // identical: est 1.0
          Seq(2L, "completely different content with no shared shingles")),
        Seq("doc_id:i", "text:s"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 1L, 1.0, true),
          Seq(2L, 0L, 0.0, false)),
        Seq("doc_id:i", "n_eval_near:i", "max_est_jaccard:f",
          "near_contaminated:b"))
      override def mutants = Seq(
        ValueMutant("text", 1, "now fully rewritten distinct words here"),
        ValueMutant("doc_id", 2, 0L)) // doc 2 becomes eval: row drops
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("range_join golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      RangeJoin.RangeJoinOp(
        pointSide = _.filter(col("side") === "p")
          .select(col("k"), col("id").as("pid"), col("t")),
        rangeSide = _.filter(col("side") === "r")
          .select(col("k"), col("id").as("rid"), col("lo"), col("hi")),
        keyColumns = Seq("k"), timeColumn = "t",
        loColumn = "lo", hiColumn = "hi", binWidth = 4L,
        rangePayload = Seq("rid")).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq("p", 1L, 1L, 5L, 0L, 0L),
          Seq("p", 1L, 2L, 15L, 0L, 0L),
          Seq("p", 2L, 3L, 5L, 0L, 0L),
          Seq("r", 1L, 7L, 0L, 0L, 9L),
          Seq("r", 1L, 8L, 0L, 10L, 19L),
          Seq("r", 2L, 9L, 0L, 6L, 9L)),
        Seq("side:s", "k:i", "id:i", "t:i", "lo:i", "hi:i"))
      // p1(k1,t5) in r7[0,9]; p2(k1,t15) in r8[10,19]; p3(k2,t5) misses
      // r9[6,9]
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 1L, 5L, 0L, 9L, 7L),
          Seq(1L, 2L, 15L, 10L, 19L, 8L)),
        Seq("k:i", "pid:i", "t:i", "lo:i", "hi:i", "rid:i"))
      override def mutants = Seq(
        ValueMutant("t", 2, 7L),  // p3 enters r9: a third match appears
        ValueMutant("hi", 3, 4L), // r7 shrinks past t=5: p1 unmatches
        ValueMutant("k", 0, 2L))  // p1 moves to key 2 (t=5 < r9.lo=6): unmatches
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("overlap_join golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      RangeJoin.OverlapJoinOp(
        leftSide = _.filter(col("side") === "l")
          .select(col("k"), col("id").as("lid"),
            col("lo").as("l_lo"), col("hi").as("l_hi")),
        rightSide = _.filter(col("side") === "r")
          .select(col("k"), col("id").as("rid"),
            col("lo").as("r_lo"), col("hi").as("r_hi")),
        keyColumns = Seq("k"), leftLo = "l_lo", leftHi = "l_hi",
        rightLo = "r_lo", rightHi = "r_hi", binWidth = 4L)
        .transform(df)
        .select("k", "lid", "rid")
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq("l", 1L, 1L, 0L, 9L),   // overlaps r7 (edge-touch at 9)
          Seq("l", 1L, 2L, 11L, 30L), // spans bins; overlaps r8 only
          Seq("l", 2L, 3L, 5L, 6L),   // overlaps r9
          Seq("r", 1L, 7L, 9L, 12L),  // touches l1 at 9, l2 at 11-12
          Seq("r", 1L, 8L, 25L, 40L),
          Seq("r", 2L, 9L, 0L, 5L)),
        Seq("side:s", "k:i", "id:i", "lo:i", "hi:i"))
      // l1-r7 (closed-interval touch), l2-r7, l2-r8, l3-r9
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 1L, 7L), Seq(1L, 2L, 7L), Seq(1L, 2L, 8L),
          Seq(2L, 3L, 9L)),
        Seq("k:i", "lid:i", "rid:i"))
      override def mutants = Seq(
        ValueMutant("hi", 0, 8L),  // l1 pulls off r7's lo=9: pair drops
        ValueMutant("lo", 4, 31L), // r8 slides past l2's hi=30: pair drops
        ValueMutant("k", 2, 1L))   // l3 changes key: r9 pair drops
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("curriculum_order golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      CurriculumOrder("ph", numShards = 2).transform(df)
        .select("doc_id", "phase", "global_pos", "shard", "pos_in_shard")
    // phases: ids 1,2 -> 0; ids 3,4 -> 1; within a phase, md5 order
    val order = Seq(1L, 2L).sortBy(id => (bucketOf(id), id)) ++
      Seq(3L, 4L).sortBy(id => (bucketOf(id), id))
    val phase = Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L)
    val expRows: Seq[Seq[Any]] = order.zipWithIndex.map { case (id, pos) =>
      Seq[Any](id, phase(id), pos.toLong, pos.toLong % 2L, pos.toLong / 2L)
    }
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1L, 0L), Seq(2L, 0L), Seq(3L, 1L), Seq(4L, 1L)),
        Seq("doc_id:i", "ph:i"))
      def expected = PlainFrame.fromPlain(expRows,
        Seq("doc_id:i", "phase:i", "global_pos:i", "shard:i",
          "pos_in_shard:i"))
      override def mutants = Seq(
        // a phase-0 doc moves to phase 1: every later position shifts
        ValueMutant("ph", (order.head - 1L).toInt, 1L),
        // an id change moves the doc within (and possibly across) the
        // md5 order AND changes the output row
        ValueMutant("doc_id", 2, 99L))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("mix_temperature golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.MixTemperature(totalBudget = 6L, strataColumn = "src")
        .transform(df)
        .select("doc_id", "src", "n_tokens", "cum_tokens", "mix_budget")
    // src a: weights 2,2 (T=4, wl=2e6); src b: 3,6 (T=9, wl=3e6);
    // W=5e6 -> budgets floor(6*0.4)=2, floor(6*0.6)=3 (exact IEEE ops)
    val weights = Map(1L -> 2, 2L -> 2, 3L -> 3, 4L -> 6)
    def text(id: Long) = Seq.fill(weights(id))("t").mkString(" ")
    def wl(t: Long) = math.round(math.sqrt(t.toDouble) * 1e6)
    val w = Map("a" -> wl(4L), "b" -> wl(9L))
    val sumW = w.values.sum
    val budget = w.map { case (s, v) =>
      s -> math.floor(6L.toDouble * (v.toDouble / sumW.toDouble)).toLong
    }
    def prefix(ids: Seq[Long], b: Long): Seq[(Long, Long)] = {
      var cum = 0L
      ids.sortBy(id => (bucketOf(id), id)).iterator
        .map { id => cum += weights(id); (id, cum) }
        .takeWhile(_._2 <= b).toSeq
    }
    val keptA = prefix(Seq(1L, 2L), budget("a"))
    val keptB = prefix(Seq(3L, 4L), budget("b"))
    // the golden must exercise a budget cut in each stratum
    assert(keptA.size < 2 && keptB.size < 2)
    val expRows: Seq[Seq[Any]] =
      keptA.map { case (id, cum) =>
        Seq[Any](id, "a", weights(id).toLong, cum, budget("a")) } ++
      keptB.map { case (id, cum) =>
        Seq[Any](id, "b", weights(id).toLong, cum, budget("b")) }
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1L, "a", text(1L)), Seq(2L, "a", text(2L)),
          Seq(3L, "b", text(3L)), Seq(4L, "b", text(4L))),
        Seq("doc_id:i", "src:s", "text:s"))
      def expected = PlainFrame.fromPlain(expRows,
        Seq("doc_id:i", "src:s", "n_tokens:i", "cum_tokens:i",
          "mix_budget:i"))
      override def mutants = Seq(
        // the kept a-doc balloons: a's T (and both budgets) change and
        // the inclusive prefix drops it
        ValueMutant("text", (keptA.head._1 - 1L).toInt, "t t t t t t t"),
        // a b-doc changes stratum: both strata's T, budgets and prefixes
        // move (row 2 = id 3, the w=3 doc — fixed index, because keptB
        // may legitimately be empty under the hash order)
        ValueMutant("src", 2, "a"),
        RandomMutant(count = 1, seed = 17L, columns = Seq("text")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("dup_spans golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.DupSpans(n = 3, minDocFreq = 2L).transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "a b c d e f g h m n"), // dup 3-grams at pos 0,1,4,5
          Seq(2L, "a b c d x y z w"),     // shares abc/bcd with doc 1
          Seq(3L, "e f g h q r s t"),     // shares efg/fgh with doc 1
          Seq(4L, "u v")),                // shorter than n: no shingles
        Seq("doc_id:i", "text:s"))
      // doc 1: dup positions {0,1,4,5}; gap 1->4 is 3 >= n so TWO spans
      // [0,1] and [4,5], each covering hi-lo+3 = 4 tokens -> 8/10
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq[Any](1L, 10L, 2L, 8L, 0.8),
          Seq[Any](2L, 8L, 1L, 4L, 0.5),
          Seq[Any](3L, 8L, 1L, 4L, 0.5),
          Seq[Any](4L, 2L, 0L, 0L, 0.0)),
        Seq("doc_id:i", "n_tokens:i", "n_dup_spans:i", "n_dup_tokens:i",
          "dup_ratio:f"))
      override def mutants = Seq(
        // doc 2 becomes doc 1 verbatim: every shingle of both turns
        // duplicated, the two spans of doc 1 fuse into one full cover
        ValueMutant("text", 1, "a b c d e f g h m n"),
        // doc 1 rewrites to unique tokens: docs 2-3 lose their only
        // duplicated shingles, every ratio collapses to 0
        ValueMutant("text", 0, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0"),
        // the shingle-free doc grows an `a b c` copy: its row flips
        ValueMutant("text", 3, "a b c q1 q2"))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("strip_spans golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.StripDupSpans(n = 3, minDocFreq = 2L).transform(df)
    val tc = new DataTestCase(spark) {
      // same corpus as the dup_spans golden: spans [0,1] and [4,5] of
      // doc 1 cover tokens 0..7, leaving "m n"; docs 2-3 lose their
      // 4-token shared prefix; doc 4 is shingle-free and passes through
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "a b c d e f g h m n"),
          Seq(2L, "a b c d x y z w"),
          Seq(3L, "e f g h q r s t"),
          Seq(4L, "u v")),
        Seq("doc_id:i", "text:s"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 10L, 2L, "m n"),
          Seq(2L, 8L, 4L, "x y z w"),
          Seq(3L, 8L, 4L, "q r s t"),
          Seq(4L, 2L, 2L, "u v")),
        Seq("doc_id:i", "n_tokens:i", "n_kept_tokens:i", "clean_text:s"))
      override def mutants = Seq(
        // doc 2 becomes doc 1 verbatim: both strip to empty
        ValueMutant("text", 1, "a b c d e f g h m n"),
        // doc 1 rewrites to unique tokens: every doc keeps everything
        ValueMutant("text", 0, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0"),
        // the shingle-free doc grows an `a b c` copy: it gets stripped
        ValueMutant("text", 3, "a b c q1 q2"))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("quality_band golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      Corpus.QuantileBandFilter(Seq("g"), "v", lo = 0.25, hi = 0.75)
        .transform(df)
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq("a", 1L, 10L), Seq("a", 2L, 20L), Seq("a", 3L, 30L),
          Seq("a", 4L, 40L),
          Seq("b", 5L, 100L), Seq("b", 6L, 900L)),
        Seq("g:s", "id:i", "v:i"))
      // a: sorted [10,20,30,40], lo rank ceil(.25*4)=1 -> 10, hi rank
      // ceil(.75*4)=3 -> 30 => keep 10,20,30; b: both ranks hit [100,
      // 900] at ranks 1 and 2 => keep both
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq("a", 1L, 10L, 10L, 30L), Seq("a", 2L, 20L, 10L, 30L),
          Seq("a", 3L, 30L, 10L, 30L),
          Seq("b", 5L, 100L, 100L, 900L), Seq("b", 6L, 900L, 100L, 900L)),
        Seq("g:s", "id:i", "v:i", "band_lo:i", "band_hi:i"))
      override def mutants = Seq(
        ValueMutant("v", 0, 35L),  // a's sorted set reorders: band moves
        ValueMutant("g", 3, "b"),  // group move changes BOTH bands
        RandomMutant(count = 1, seed = 19L, columns = Seq("v")))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("gopher_rules golden: killed mutants + repartition invariance") {
    def run(df: DataFrame): DataFrame =
      graft.operators.TextAnalysis.GopherRules(minWords = 3L,
        maxWords = 10L, stopwords = Seq("the", "of"))
        .transform(df)
        .select(col("doc_id"), col("n_words"), col("word_chars"),
          col("symbol_marks"), col("stopword_hits"), col("admit"))
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          Seq(1L, "the data of it all stays small here"), // clean: admit
          Seq(2L, "1 2 3"),        // numeric salad: alpha + mean fail
          Seq(3L, "# # the of ok")), // symbol-heavy: ratio fails
        Seq("doc_id:i", "text:s"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 8L, 28L, 0L, 2L, true),
          Seq(2L, 3L, 3L, 0L, 0L, false),
          Seq(3L, 5L, 9L, 2L, 2L, false)),
        Seq("doc_id:i", "n_words:i", "word_chars:i", "symbol_marks:i",
          "stopword_hits:i", "admit:b"))
      override def mutants = Seq(
        // doc 1 blows the word cap: n_words + admit flip
        ValueMutant("text", 0,
          "the data of it all stays small here and then some more words"),
        ValueMutant("text", 1, "the of go"), // stopword_hits 0 -> 2
        ValueMutant("text", 2, "ok the of going fine")) // symbols 2 -> 0
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("c4_clean golden: killed mutants + repartition invariance " +
    "(the r17 C4 line-retention + document rules)") {
    def run(df: DataFrame): DataFrame =
      graft.operators.TextAnalysis.C4Clean(blockWords = Seq("zap"))
        .transform(df)
        .select(col("doc_id"), col("n_lines"), col("kept_lines"),
          col("js_lines"), col("n_sentences"), col("block_hits"),
          col("admit"))
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          // 3 kept sentences -> admit
          Seq(1L, "alpha beta gamma delta one.\nepsilon zeta eta " +
            "theta two!\niota kappa lambda mu three?"),
          // line 2 too short, line 3 unpunctuated -> 1 kept, reject
          Seq(2L, "alpha beta gamma delta one.\nshort two.\n" +
            "iota kappa lambda mu three"),
          // javascript line dropped; zap token -> blocked
          Seq(3L, "alpha beta zap delta one.\nuse javascript for " +
            "rendering this.\niota kappa lambda mu three?")),
        Seq("doc_id:i", "text:s"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 3L, 3L, 0L, 3L, 0L, true),
          Seq(2L, 3L, 1L, 0L, 1L, 0L, false),
          Seq(3L, 3L, 2L, 1L, 2L, 1L, false)),
        Seq("doc_id:i", "n_lines:i", "kept_lines:i", "js_lines:i",
          "n_sentences:i", "block_hits:i", "admit:b"))
      override def mutants = Seq(
        // doc 1 loses a terminal mark: kept 3 -> 2, admit flips
        ValueMutant("text", 0, "alpha beta gamma delta one.\nepsilon " +
          "zeta eta theta two!\niota kappa lambda mu three"),
        // doc 2's short line grows to five words: kept 1 -> 2
        ValueMutant("text", 1, "alpha beta gamma delta one.\nnow a " +
          "full five words.\niota kappa lambda mu three"),
        // doc 3 drops the blocklist token: block_hits 1 -> 0
        ValueMutant("text", 2, "alpha beta gamma delta one.\nuse " +
          "javascript for rendering this.\niota kappa lambda mu three?"))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("gopher_ngram golden: killed mutants + repartition invariance " +
    "(the r17 n-gram character-fraction rules)") {
    def run(df: DataFrame): DataFrame =
      graft.operators.TextAnalysis.GopherRepetition()
        .transform(df)
        .select(col("doc_id"), col("rep_chars"), col("top2_chars"),
          col("dup5_chars"), col("r_top2_gram"), col("r_dup5_gram"),
          col("admit"))
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(
          // heaviest 2-gram "ab cd" c=2 len 5 -> 10; 10*5 > 17 fails
          Seq(1L, "ab cd ab cd ab zz"),
          // clean prose: no repeated gram anywhere -> all pass
          Seq(2L, "one two three four five six"),
          // the 5-gram repeats -> covered words 20 of 39 chars, fails
          Seq(3L, "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5 q99999999")),
        Seq("doc_id:i", "text:s"))
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 17L, 10L, 0L, false, true, false),
          Seq(2L, 27L, 0L, 0L, true, true, true),
          Seq(3L, 39L, 10L, 20L, false, false, false)),
        Seq("doc_id:i", "rep_chars:i", "top2_chars:i", "dup5_chars:i",
          "r_top2_gram:b", "r_dup5_gram:b", "admit:b"))
      override def mutants = Seq(
        // doc 1 loses the repeated 2-gram: top2 0 -> admit flips true
        ValueMutant("text", 0, "ab cd xx yy zz qq"),
        // doc 2 gains one: "one two" c=2 len 7 -> 14 > 21/5 -> flips
        ValueMutant("text", 1, "one two one two three"),
        // doc 3's second half de-duplicates: dup5 0, r_dup5 flips
        ValueMutant("text", 2,
          "x1 x2 x3 x4 x5 y1 y2 y3 y4 y5 q99999999"))
    }
    tc.test(run)
    tc.test(run, repartition = Some(3))
  }

  test("len_bucket_pack golden: killed mutants + repartition invariance " +
    "(the seeded two-phase rank is the layout-sensitive algebra)") {
    def run(df: DataFrame): DataFrame =
      Corpus.LengthBucketPack(bands = Seq(4L, 8L), seqsPerPack = 2)
        .transform(df)
        .withColumn("len_class", col("len_class").cast("long"))
    val tc = new DataTestCase(spark) {
      def input = PlainFrame.fromPlain(
        Seq(Seq(1L, 3L), Seq(2L, 7L), Seq(3L, 4L), Seq(4L, 8L),
          Seq(5L, 2L)),
        Seq("doc_id:i", "n_tokens:i"))
      // class 0 (<=4): ids 1,3,5 ranks 0,1,2 -> packs 0,0,1
      // class 1 (<=8): ids 2,4 ranks 0,1 -> pack 0
      def expected = PlainFrame.fromPlain(
        Seq(
          Seq(1L, 3L, 0L, 4L, 0L, 0L, 1L),
          Seq(2L, 7L, 1L, 8L, 0L, 0L, 1L),
          Seq(3L, 4L, 0L, 4L, 1L, 0L, 0L),
          Seq(4L, 8L, 1L, 8L, 1L, 0L, 0L),
          Seq(5L, 2L, 0L, 4L, 2L, 1L, 2L)),
        Seq("doc_id:i", "n_tokens:i", "len_class:i", "class_tokens:i",
          "class_seq:i", "pack_id:i", "pad_tokens:i"))
      override def mutants = Seq(
        ValueMutant("n_tokens", 0, 7L), // doc 1 jumps class: ranks shift
        ValueMutant("doc_id", 4, 0L),   // doc 5 first: class-0 ranks shift
        ValueMutant("n_tokens", 2, 2L)) // pad changes, rank unchanged
    }
    tc.test(run)
    tc.test(run, repartition = Some(4))
  }
}
