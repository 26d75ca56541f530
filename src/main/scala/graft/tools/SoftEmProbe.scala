package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Tokenize

/** Measurement probe (r16 verdict #8, stretch): does SOFT-EM
  * (forward-backward expected counts over the unigram lattice) change
  * segmentation quality vs the shipped HARD-EM (Viterbi counts) on the
  * fixture corpora — and can it keep the integer-lattice determinism?
  *
  * Protocol: round-0 scores from `UnigramScores` (MaxMatch counts);
  * one HARD round via `UnigramScores(emRounds = 1)`; one SOFT round
  * computed here driver-side — per distinct word, the exact
  * forward-backward over piece probabilities `exp(score/1e6)`, each
  * word's expected piece counts rounded to the 1e-6 lattice BEFORE the
  * corpus-level sum (the only formulation whose corpus sums stay exact
  * integers and partitioning-invariant), then the same smoothed ln
  * M-step on the fractional counts. Both refined tables then drive
  * `UnigramEncode`; we report where the segmentations differ and the
  * cross-scored corpus log-likelihoods (each segmentation scored under
  * BOTH models, the 2x2 that shows whether soft's reweighting actually
  * moves inference).
  *
  * This is a PROBE, not an operator: adoption requires the oracle to
  * replay forward-backward — float cells in the recursive CTE — and
  * the measured delta to justify it. Results are recorded in
  * COVERAGE.md next to the OPQ-lite adjudication.
  */
object SoftEmProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val vocab = Tokenize.VocabBuild().transform(docs)
    val s0 = Tokenize.UnigramScores(vocab).transform(docs)
    val s1h = Tokenize.UnigramScores(vocab, emRounds = 1).transform(docs)

    // vocab tables driver-side (bounded by construction)
    val pieces = s0.select("piece", "id", "score")
      .as[(String, Long, Long)].collect()
    val first = pieces.filter(!_._1.startsWith("##"))
    val cont = pieces.filter(_._1.startsWith("##"))
      .map { case (p, id, s) => (p.substring(2), id, s) }
    val vSize = pieces.length.toLong

    // distinct words with multiplicity (fixture corpora: bounded)
    val words = docs
      .select(explode(graft.functions.Portable.tokens(col("text")))
        .as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()

    // per-word forward-backward; expected counts rounded to the 1e-6
    // lattice per word, summed exactly (scaled longs)
    val expCounts = new scala.collection.mutable.HashMap[Long, Long]()
    var totalScaled = 0L
    var uncovered = 0L
    words.foreach { case (w, mult) =>
      val n = w.length
      // matches(s) = (end, id, prob) of pieces starting at s
      def matchesAt(s: Int): Array[(Int, Long, Double)] = {
        val table = if (s == 0) first else cont
        table.flatMap { case (p, id, sc) =>
          if (s + p.length <= n && w.regionMatches(s, p, 0, p.length))
            Some((s + p.length, id, math.exp(sc.toDouble / 1e6)))
          else None
        }
      }
      val matches = Array.tabulate(n)(matchesAt)
      val alpha = new Array[Double](n + 1)
      alpha(0) = 1.0
      var s = 0
      while (s < n) {
        if (alpha(s) > 0) matches(s).foreach { case (e, _, p) =>
          alpha(e) += alpha(s) * p }
        s += 1
      }
      val z = alpha(n)
      if (z <= 0) uncovered += mult
      else {
        val beta = new Array[Double](n + 1)
        beta(n) = 1.0
        s = n - 1
        while (s >= 0) {
          matches(s).foreach { case (e, _, p) =>
            beta(s) += p * beta(e) }
          s -= 1
        }
        // expected count of each piece occurrence, rounded per word
        val perWord = new scala.collection.mutable.HashMap[Long, Double]()
        s = 0
        while (s < n) {
          if (alpha(s) > 0) matches(s).foreach { case (e, id, p) =>
            val ec = alpha(s) * p * beta(e) / z
            perWord(id) = perWord.getOrElse(id, 0.0) + ec
          }
          s += 1
        }
        perWord.foreach { case (id, ec) =>
          val scaled = math.round(ec * 1e6) * mult
          expCounts(id) = expCounts.getOrElse(id, 0L) + scaled
          totalScaled += scaled
        }
      }
    }

    // soft M-step: same smoothed lattice on fractional counts
    val softRows = pieces.map { case (p, id, _) =>
      val e = expCounts.getOrElse(id, 0L).toDouble / 1e6
      val score = math.round(math.log(
        (e + 1.0) / (totalScaled.toDouble / 1e6 + vSize)) * 1e6)
      (p, id, score)
    }
    val s1s = graft.util.SparkUtil.withFitParamsStr(
      softRows.toSeq.toDF("piece", "id", "score"),
      "piece", Map("lowercase" -> "true", "continuationPrefix" -> "##",
        "byteLevel" -> "false"))

    // encode under each refined table
    def segs(scores: org.apache.spark.sql.DataFrame) =
      Tokenize.UnigramEncode(scores).transform(docs)
        .select(col("doc_id"), col("n_bpe_tokens"),
          col("bpe_ids").cast("array<string>").as("ids"))
        .as[(Long, Long, Seq[String])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val hard = segs(s1h)
    val soft = segs(s1s)
    val diff = hard.keys.count(k => hard(k)._2 != soft(k)._2)
    val hardToks = hard.values.map(_._1).sum
    val softToks = soft.values.map(_._1).sum

    // cross-scored corpus log-likelihood (sum of piece scores of each
    // segmentation under each model), exact integer sums
    val sScore = softRows.map { case (_, id, s) => id -> s }.toMap
    val s1hMap = s1h.select("id", "score").as[(Long, Long)]
      .collect().toMap
    def ll(seg: Map[Long, (Long, Seq[String])],
           sc: Map[Long, Long]): Long =
      seg.values.flatMap(_._2).map(id => sc(id.toLong)).sum
    println(f"[softem] docs=${hard.size} distinctWords=${words.length} " +
      f"vocab=$vSize uncoveredWordOcc=$uncovered")
    println(f"[softem] segDiffDocs=$diff of ${hard.size}; " +
      f"tokens hard=$hardToks soft=$softToks")
    println(f"[softem] LL(hardSeg|hardModel)=${ll(hard, s1hMap)} " +
      f"LL(softSeg|hardModel)=${ll(soft, s1hMap)}")
    println(f"[softem] LL(hardSeg|softModel)=${ll(hard, sScore)} " +
      f"LL(softSeg|softModel)=${ll(soft, sScore)}")
    spark.stop()
  }
}
