package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-9 verdict stretch #6: the quantile family's randomized specs
  * shared the uniform-value blind spot with the old stress rows — this
  * suite drives [[Corpus.QuantileStats]] and [[PercentileRank]] with
  * HEAVY-TAILED value draws (log-normal bodies, point masses up to
  * 90%, 2^40-class outliers, tiny denormal-ish values) against
  * brute-force sort oracles, across bucket counts small enough to
  * force every layout shape (singleton heavy buckets, multi-value
  * buckets, boundary collisions).
  */
class HeavyTailPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** One heavy-tailed draw: mixture of a log-normal body, a point mass
    * at 42 (weight grows with `spike`), rare huge outliers and rare
    * near-zero values — all the shapes that collapse equal-width
    * bucketing.
    */
  private def draw(rnd: Random, spike: Double): Double = {
    val u = rnd.nextDouble()
    if (u < spike) 42.0
    else if (u < spike + 0.02) math.pow(2.0, 30 + rnd.nextInt(11)) // huge
    else if (u < spike + 0.04) rnd.nextDouble() * 1e-6             // tiny
    else math.exp(rnd.nextGaussian() * 2.5)                        // body
  }

  test("quantile_stats matches the brute-force percentile_disc on " +
    "heavy-tailed mixtures across bucket counts") {
    val rnd = new Random(20260814L)
    val qs = Seq(0.01, 0.25, 0.5, 0.9, 1.0)
    for (trial <- 1 to 4) {
      val spike = Seq(0.0, 0.3, 0.6, 0.9)(trial - 1)
      val nGroups = 1 + rnd.nextInt(3)
      val rows = (1 to 500).map { _ =>
        (s"g${rnd.nextInt(nGroups)}", draw(rnd, spike))
      }
      val want = rows.groupBy(_._1).map { case (g, grp) =>
        val sorted = grp.map(_._2).sorted
        g -> ((sorted.size.toLong, qs.map { q =>
          sorted((BigDecimal(q.toString) * sorted.size)
            .setScale(0, BigDecimal.RoundingMode.CEILING).toInt - 1)
        }))
      }
      for (vb <- Seq(1, 5, 64)) {
        val got = Corpus.QuantileStats(Seq("g"), "v", qs,
            valueBuckets = vb)
          .transform(rows.toDF("g", "v")).collect()
          .map(r => r.getString(0) ->
            ((r.getLong(1), qs.indices.map(i => r.getDouble(2 + i)))))
          .toMap
        assert(got.keySet == want.keySet, s"trial $trial vb=$vb")
        want.foreach { case (g, (n, vals)) =>
          assert(got(g)._1 == n, s"trial $trial vb=$vb group $g count")
          assert(got(g)._2 == vals,
            s"trial $trial vb=$vb group $g: got ${got(g)._2}, want $vals")
        }
      }
    }
  }

  test("pct_rank matches the brute-force cume rank on heavy-tailed " +
    "mixtures across bucket counts") {
    val rnd = new Random(77L)
    for (trial <- 1 to 4) {
      val spike = Seq(0.0, 0.3, 0.6, 0.9)(trial - 1)
      val rows = (0L until 300L).map { i =>
        (i, s"g${rnd.nextInt(3)}", draw(rnd, spike))
      }
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val vs = rs.map(_._3)
        rs.map { case (id, _, v) =>
          id -> ((vs.count(_ <= v).toLong, vs.size.toLong))
        }
      }
      for (vb <- Seq(1, 5, 64)) {
        val got = PercentileRank(Seq("g"), "v", idColumn = "id",
            valueBuckets = vb).transform(rows.toDF("id", "g", "v"))
          .select("id", "value_rank", "pct_rank")
          .as[(Long, Long, Double)].collect()
        assert(got.length == rows.size, s"trial $trial vb=$vb")
        got.foreach { case (id, r, p) =>
          val (wr, wn) = want(id)
          val wp = BigDecimal(wr.toDouble / wn)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(r == wr && math.abs(p - wp) < 1e-9,
            s"trial $trial vb=$vb id $id: got ($r,$p) want ($wr,$wp)")
        }
      }
    }
  }
}
