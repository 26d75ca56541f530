package graft.operators

import org.apache.spark.sql.DataFrame
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
