package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable

/** The trained quality gate ([[Classifier.QualityClassifier]]):
  * train-then-score pinned against an independent in-memory replay of
  * the batch-perceptron rounds (the NaiveIterator convention), the
  * separable-corpus behavior, repartition determinism, and the
  * fail-loud edges. Corpus-scale value correctness is the
  * `quality_classifier` DuckDB oracle, which replays the GD rounds in
  * SQL.
  */
class ClassifierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Independent full-batch CLASS-BALANCED perceptron over hashed
    * unigram counts (misclassified docs contribute y * |other class|). */
  private def naive(docs: Seq[(Long, String, String)], pos: String,
                    nf: Int, rounds: Int): Map[Long, Long] = {
    def feats(t: String): Seq[Int] =
      Option(Portable.tokensLocal(t)).getOrElse(Array.empty[String])
        .toSeq.map(tok =>
          (((Portable.tokenHashLocal(tok) % nf) + nf) % nf).toInt)
    val fx = docs.map { case (id, src, t) =>
      (id, src == pos, feats(t))
    }
    val nPos = fx.count(_._2).toLong
    val nNeg = fx.length - nPos
    val w = Array.fill(nf)(0L)
    (0 until rounds).foreach { _ =>
      val g = Array.fill(nf)(0L)
      fx.foreach { case (_, p, fs) =>
        val m = fs.map(w(_)).sum
        val y = if (p) 1L else -1L
        if (y * m <= 0L) {
          val ys = if (p) nNeg else -nPos
          fs.foreach(f => g(f) += ys)
        }
      }
      (0 until nf).foreach(i => w(i) += g(i))
    }
    fx.map { case (id, _, fs) => id -> fs.map(w(_)).sum }.toMap
  }

  private def run(docs: Seq[(Long, String, String)], rounds: Int,
                  nf: Int = 64, parts: Int = 1): Map[Long, (Long, Boolean)] =
    Classifier.QualityClassifier(positiveValue = "seed",
        numFeatures = nf, rounds = rounds)
      .transform {
        val d = docs.toDF("doc_id", "source", "text")
        if (parts > 1) d.repartition(parts) else d
      }
      .select("doc_id", "quality_margin", "quality_keep")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("a separable corpus separates: the distinguishing tokens earn " +
    "the sign, shared noise cancels, and quality_keep gates exactly " +
    "the positive class") {
    val docs = (0L until 40L).map { i =>
      val p = i % 2 == 0
      (i, if (p) "seed" else "web",
        s"common filler ${if (p) "excellent prose" else "spam junk"}")
    }
    val got = run(docs, rounds = 4)
    docs.foreach { case (id, src, _) =>
      assert(got(id)._2 == (src == "seed"), s"doc $id")
      assert((got(id)._1 > 0) == (src == "seed"))
    }
  }

  test("property: 20 random corpora — train-then-score equals the " +
    "independent naive batch-perceptron replay margin for margin") {
    val rnd = new scala.util.Random(20260818L)
    val vocabPos = Seq("alpha", "beta", "gamma")
    val vocabNeg = Seq("delta", "eps", "zeta")
    val vocabAll = vocabPos ++ vocabNeg ++ Seq("x", "y", "zz", "")
    (1 to 20).foreach { trial =>
      val n = 6 + rnd.nextInt(20)
      val docs = (0L until n.toLong).map { i =>
        val p = rnd.nextBoolean()
        val lean = if (p) vocabPos else vocabNeg
        val toks = (0 until 1 + rnd.nextInt(6)).map { _ =>
          if (rnd.nextBoolean()) lean(rnd.nextInt(lean.length))
          else vocabAll(rnd.nextInt(vocabAll.length))
        }
        (i, if (p) "seed" else "web", toks.mkString(" "))
      }
      // both classes must exist for the operator; skip degenerate draws
      if (docs.exists(_._2 == "seed") && docs.exists(_._2 != "seed")) {
        val rounds = 1 + rnd.nextInt(6)
        val nf = Seq(16, 64, 257)(rnd.nextInt(3))
        val got = run(docs, rounds, nf)
        val want = naive(docs, "seed", nf, rounds)
        docs.foreach { case (id, _, _) =>
          assert(got(id)._1 == want(id),
            s"trial $trial doc $id: ${got(id)._1} != ${want(id)}")
        }
        // repartition invariance: per-partition gradient partials are
        // integer sums — commutative, so the split cannot matter
        assert(run(docs, rounds, nf, parts = 5) == got,
          s"trial $trial repartition drift")
      }
    }
  }

  test("bigram features separate word ORDER where unigrams provably " +
    "cannot: identical per-doc token counts leave the unigram model " +
    "at margin 0 (balanced gradient), the bigram model gates exactly") {
    // every doc holds 3 x's and 3 y's — unigram features identical, so
    // the balanced batch gradient cancels and margins stay 0; bigram
    // counts differ (xy-heavy vs yx-heavy)
    val docs = (0L until 20L).map { i =>
      val p = i % 2 == 0
      (i, if (p) "seed" else "web",
        if (p) "x y x y x y" else "y x y x y x")
    }
    val uni = Classifier.QualityClassifier(positiveValue = "seed",
        numFeatures = 257, rounds = 4)
      .transform(docs.toDF("doc_id", "source", "text"))
      .select("doc_id", "quality_margin")
      .as[(Long, Long)].collect()
    assert(uni.forall(_._2 == 0L), uni.toSeq.toString)
    val bi = Classifier.QualityClassifier(positiveValue = "seed",
        numFeatures = 257, rounds = 4, ngram = 2)
      .transform(docs.toDF("doc_id", "source", "text"))
      .select("doc_id", "quality_keep")
      .as[(Long, Boolean)].collect().toMap
    docs.foreach { case (id, src, _) =>
      assert(bi(id) == (src == "seed"), s"doc $id")
    }
  }

  test("persisted weights: train -> weightsTable -> Score equals " +
    "direct train-then-score margin for margin; fit drift raises") {
    val docs = (0L until 30L).map { i =>
      val p = i % 3 == 0
      (i, if (p) "seed" else "web",
        s"shared noise ${if (p) "fine prose words" else "junk spam"} t$i")
    }
    val df = docs.toDF("doc_id", "source", "text")
    val direct = Classifier.QualityClassifier(positiveValue = "seed",
        numFeatures = 64, rounds = 5)
      .transform(df)
      .select("doc_id", "quality_margin", "quality_keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val w = Classifier.weightsTable(df, positiveValue = "seed",
      numFeatures = 64, rounds = 5)
    // the artifact is sparse and self-describing
    assert(w.filter("weight = 0").count() == 0)
    assert(graft.util.SparkUtil.fitParam(w, "feature", "rounds")
      == Some(5L))
    val scored = Classifier.Score(w, numFeatures = 64)
      .transform(df.select("doc_id", "text"))
      .select("doc_id", "quality_margin", "quality_keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(scored == direct)
    // drift raises: numFeatures and ngram both directions
    val e = intercept[IllegalArgumentException] {
      Classifier.Score(w, numFeatures = 128).transform(df)
    }
    assert(e.getMessage.contains("numFeatures"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Classifier.Score(w, numFeatures = 64, ngram = 2).transform(df)
    }
    assert(e2.getMessage.contains("ngram"), e2.getMessage)
    // a unioned (duplicate-feature) weights table raises instead of
    // scoring quietly wrong via last-write-wins
    val e3 = intercept[IllegalArgumentException] {
      Classifier.Score(w.unionByName(w), numFeatures = 64)
        .transform(df.select("doc_id", "text"))
    }
    assert(e3.getMessage.contains("duplicate feature"), e3.getMessage)
  }

  test("fail loud: a one-class corpus raises naming both counts; " +
    "rounds over the barrier cap raise; null text scores exactly 0") {
    val oneClass = Seq((1L, "seed", "a"), (2L, "seed", "b"))
    val e = intercept[IllegalArgumentException] {
      Classifier.QualityClassifier(positiveValue = "seed")
        .transform(oneClass.toDF("doc_id", "source", "text"))
    }
    assert(e.getMessage.contains("BOTH classes"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Classifier.QualityClassifier(positiveValue = "seed", rounds = 500))
    assert(e2.getMessage.contains("maxRounds"))
    val withNull = Seq((1L, "seed", "good stuff"), (2L, "web", "bad"),
      (3L, "web", null))
    val got = run(withNull.map(t => (t._1, t._2, t._3)), rounds = 3)
    assert(got(3L) == ((0L, false)))
  }
}
