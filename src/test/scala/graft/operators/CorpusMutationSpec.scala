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
}
