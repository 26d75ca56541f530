package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.functions.Portable
import graft.util.SparkUtil

/** In-engine TRAINED quality gate — a fastText-style hashed-ngram
  * LINEAR classifier (Joulin et al. 2016 popularized the shape: hash
  * n-grams into a bounded feature space, classify with a linear
  * model; CCNet and the GPT-3 pipeline use exactly such a classifier
  * as the corpus quality gate). Training is FULL-BATCH PERCEPTRON
  * (Rosenblatt's rule batched) with CLASS-BALANCED gradients: per
  * round, every document scores `margin = Σ_f w[f]·x[f]` against the
  * current weights, and the misclassified documents
  * (`y·margin <= 0`, y ∈ {+1, −1}) contribute `y·|other class|·x` to
  * one gradient that updates the weights — the standard imbalance
  * correction (a small curated seed against a large raw pool must not
  * be swamped), a constant scale on balanced classes. Everything is
  * 64-bit INTEGER arithmetic — token counts, weights, margins — so
  * training and scoring are bit-deterministic in any engine and the
  * DuckDB oracle replays the GD rounds themselves (`quality_classifier`).
  *
  * The LABELED SEED is in-data: rows whose `sourceColumn` equals
  * `positiveValue` are the positive class (a curated slice — the
  * CCNet "target domain" convention, the same labeling contract as
  * [[Dsir.ImportanceResample]]), everything else negative. Both
  * classes must be non-empty (fail-loud — a one-class "classifier"
  * is a wiring bug). Features are [[Portable.tokenHash]]-hashed
  * unigrams (`ngram = 1`) or space-joined bigrams (`ngram = 2`), the
  * DSIR feature space, so the two gates are directly comparable.
  *
  * Output: one row per input row — `(doc_id, quality_margin,
  * quality_keep)` with `quality_keep = margin > 0` (the typed
  * projection convention; join back on the id). The margin is the
  * exact integer score — threshold it differently downstream, or
  * compose with [[SourceQuality.SourceFilter]] as the trained
  * complement of the heuristic gate. Docs with no tokens score
  * exactly 0 (never kept).
  *
  * 100 TB shape: the per-doc feature arrays are built ONCE and
  * localCheckpointed (the DSIR selection cut); each training round is
  * then ONE map-side job — per-partition gradient partial sums
  * (`numFeatures` longs of executor state, the
  * [[SimilarityPq.trainedCodebooks]] pattern) merged driver-side —
  * with NO doc-level shuffle anywhere; weights are driver-held and
  * broadcast (at most `numFeatures` longs). Scoring is a pure
  * map-side pass. Rounds are a fail-loud-capped driver barrier like
  * BpeLearn's. Overflow envelope: weights are bounded by
  * rounds × per-cell corpus token count and margins by doc length ×
  * max weight — at 8 rounds and 2^10 cells this stays far inside
  * Long even at trillion-token corpora; the arithmetic is unchecked
  * by design (the [[Portable]] quantized-dot envelope class).
  */
object Classifier {

  private def featureOf(tok: Column, numFeatures: Int): Column =
    pmod(Portable.tokenHash(tok), lit(numFeatures.toLong))

  /** Per-occurrence feature cells of one document as `array<long>`
    * (x[f] = how often f appears — summing w over occurrences IS
    * Σ w[f]·x[f]). */
  private def featArray(textColumn: String, numFeatures: Int,
                        ngram: Int): Column = {
    val toks = Portable.tokens(col(textColumn))
    if (ngram == 1)
      org.apache.spark.sql.functions.transform(toks,
        t => featureOf(t, numFeatures))
    else {
      val len = greatest(size(toks) - 1, lit(0))
      org.apache.spark.sql.functions.transform(
        arrays_zip(slice(toks, lit(1), len), slice(toks, lit(2), len)),
        p => featureOf(concat_ws(" ",
          p.getField("0"), p.getField("1")), numFeatures))
    }
  }

  final case class QualityClassifier(positiveValue: String,
                                     sourceColumn: String = "source",
                                     textColumn: String = "text",
                                     idColumn: String = "doc_id",
                                     numFeatures: Int = 1024,
                                     rounds: Int = 8,
                                     ngram: Int = 1,
                                     maxRounds: Int = 256)
      extends Wrangler {
    require(numFeatures >= 1, "numFeatures must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    require(ngram == 1 || ngram == 2, s"ngram must be 1 or 2, got $ngram")
    require(rounds <= maxRounds,
      s"QualityClassifier: rounds=$rounds exceeds maxRounds=$maxRounds " +
        "— every round is one driver-coordinated corpus pass; raise " +
        "maxRounds explicitly if training this long is intended")
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df,
        Seq(idColumn, sourceColumn, textColumn))
      val spark = df.sparkSession
      import spark.implicits._
      // per-doc feature arrays, built once — training reads this
      // `rounds` times and scoring once more
      val docFeats = df.select(col(idColumn).cast("long").as("id"),
          coalesce(col(sourceColumn) === lit(positiveValue), lit(false))
            .as("pos"),
          coalesce(featArray(textColumn, numFeatures, ngram),
            array().cast("array<long>")).as("feats"))
        .localCheckpoint()
      val typed = docFeats.as[(Long, Boolean, Array[Long])]
      val w = trainOn(typed, positiveValue, sourceColumn, numFeatures,
        rounds, "QualityClassifier")
      val bcW = spark.sparkContext.broadcast(w)
      typed.mapPartitions { it =>
        val wv = bcW.value
        it.map { case (id, _, feats) =>
          var m = 0L
          var i = 0
          while (i < feats.length) { m += wv(feats(i).toInt); i += 1 }
          (id, m, m > 0L)
        }
      }.toDF(idColumn, "quality_margin", "quality_keep")
    }
  }

  /** The full-batch perceptron rounds over a prepared `(id, pos,
    * feats)` dataset — shared by [[QualityClassifier]] (train + score
    * inline) and [[weightsTable]] (train + persist), so the two can
    * never drift. */
  private def trainOn(
      typed: org.apache.spark.sql.Dataset[(Long, Boolean, Array[Long])],
      positiveValue: String, sourceColumn: String, numFeatures: Int,
      rounds: Int, who: String): Array[Long] = {
    import org.apache.spark.sql.functions.{sum, when, col, lit}
    val spark = typed.sparkSession
    import spark.implicits._
    val classes = typed.toDF("id", "pos", "feats").agg(
      sum(when(col("pos"), 1L).otherwise(0L)),
      sum(when(col("pos"), 0L).otherwise(1L))).collect()(0)
    val (nPos, nNeg) =
      if (classes.isNullAt(0)) (0L, 0L)
      else (classes.getLong(0), classes.getLong(1))
    require(nPos > 0L && nNeg > 0L,
      s"$who: need BOTH classes non-empty — $nPos " +
        s"positive (`$sourceColumn` = `$positiveValue`) vs $nNeg " +
        "negative rows; a one-class classifier is a wiring bug")
    val nf = numFeatures
    var w = new Array[Long](nf)
    // CLASS-BALANCED gradients (the standard imbalance correction,
    // still exact-integer): each positive document contributes
    // y·|negative class| and each negative y·|positive class| — a 5%
    // curated seed against a 95% raw pool would otherwise swamp every
    // shared feature with negative mass in round 1 and the model
    // would oscillate between all-negative and all-positive. On
    // balanced classes this is the unit-gradient perceptron scaled by
    // a constant (identical signs, identical keeps). Overflow
    // envelope: weights are bounded by rounds × per-cell counts ×
    // class size — at corpus scale train on a BOUNDED labeled seed
    // (the CCNet practice: the classifier fits on a curated sample,
    // then scores the corpus), not the full 100 TB.
    val (yPos, yNeg) = (nNeg, -nPos)
    (0 until rounds).foreach { _ =>
      val bcW = spark.sparkContext.broadcast(w)
      val grad = typed.mapPartitions { it =>
        val wv = bcW.value
        val g = new Array[Long](nf)
        it.foreach { case (_, pos, feats) =>
          var m = 0L
          var i = 0
          while (i < feats.length) { m += wv(feats(i).toInt); i += 1 }
          val y = if (pos) 1L else -1L
          if (y * m <= 0L) {
            val ys = if (pos) yPos else yNeg
            i = 0
            while (i < feats.length) { g(feats(i).toInt) += ys; i += 1 }
          }
        }
        Iterator.single(g)
      }.reduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      w = Array.tabulate(nf)(i => w(i) + grad(i))
    }
    w
  }

  /** Train and PERSIST the classifier as a `(feature, weight)` frame —
    * the fit artifact the ingest loop deploys (the [[Dsir.featureCounts]]
    * convention): nonzero cells only (sparse, deterministic), fit
    * params (`numFeatures`, `rounds`, `ngram` + the positive label)
    * riding the `feature` column's metadata so every scoring-side
    * drift direction raises. [[Score]] consumes it on batch OR stream.
    */
  def weightsTable(corpus: DataFrame, positiveValue: String,
                   sourceColumn: String = "source",
                   textColumn: String = "text",
                   numFeatures: Int = 1024, rounds: Int = 8,
                   ngram: Int = 1, maxRounds: Int = 256): DataFrame = {
    require(numFeatures >= 1, "numFeatures must be >= 1")
    require(rounds >= 1 && rounds <= maxRounds,
      s"Classifier.weightsTable: rounds=$rounds outside [1, " +
        s"$maxRounds] — every round is one driver-coordinated corpus " +
        "pass; raise maxRounds explicitly if training this long is " +
        "intended")
    require(ngram == 1 || ngram == 2, s"ngram must be 1 or 2, got $ngram")
    SparkUtil.validateColumns(corpus, Seq(sourceColumn, textColumn))
    val spark = corpus.sparkSession
    import spark.implicits._
    val docFeats = corpus.select(lit(0L).as("id"),
        coalesce(col(sourceColumn) === lit(positiveValue), lit(false))
          .as("pos"),
        coalesce(featArray(textColumn, numFeatures, ngram),
          array().cast("array<long>")).as("feats"))
      .localCheckpoint()
    val w = trainOn(docFeats.as[(Long, Boolean, Array[Long])],
      positiveValue, sourceColumn, numFeatures, rounds,
      "Classifier.weightsTable")
    SparkUtil.withFitParamsStr(
      SparkUtil.withFitParams(
        w.zipWithIndex.collect { case (wt, f) if wt != 0L =>
          (f.toLong, wt)
        }.toSeq.toDF("feature", "weight"),
        "feature", Map("numFeatures" -> numFeatures.toLong,
          "rounds" -> rounds.toLong, "ngram" -> ngram.toLong)),
      "feature", Map("positiveValue" -> positiveValue))
  }

  /** Score documents against a PERSISTED [[weightsTable]] — a pure
    * map-side pass, legal on batch and streaming frames alike (the
    * [[Tokenize.BpeEncode]] duality); the deployable face of the
    * trained gate for the ingest loop. Output: `(doc_id,
    * quality_margin, quality_keep)`, bit-identical to training-side
    * scoring by construction (spec-pinned). Fit drift (numFeatures,
    * ngram) raises before the plan runs.
    */
  final case class Score(weights: DataFrame,
                         idColumn: String = "doc_id",
                         textColumn: String = "text",
                         numFeatures: Int = 1024,
                         ngram: Int = 1)
      extends Wrangler {
    require(numFeatures >= 1 && numFeatures <= (1 << 20),
      "numFeatures must be in [1, 2^20] — the weight array is " +
        s"driver-held; got $numFeatures")
    require(ngram == 1 || ngram == 2, s"ngram must be 1 or 2, got $ngram")
    override def getParams: Seq[(String, Any)] = Seq(
      "idColumn" -> idColumn, "textColumn" -> textColumn,
      "numFeatures" -> numFeatures, "ngram" -> ngram)
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
      SparkUtil.validateColumns(weights, Seq("feature", "weight"))
      SparkUtil.requireFitParam(weights, "feature", "numFeatures",
        numFeatures.toLong, "Classifier.Score")
      SparkUtil.requireFitParam(weights, "feature", "ngram",
        ngram.toLong, "Classifier.Score")
      val spark = df.sparkSession
      import spark.implicits._
      val rows = weights.select(col("feature").cast("long"),
          col("weight").cast("long"))
        .as[(Long, Long)].collect()
      // fail-loud on duplicate feature rows (the vocab loaders'
      // convention): a unioned/corrupted weights table would otherwise
      // score quietly wrong via last-write-wins
      require(rows.map(_._1).distinct.length == rows.length,
        "Classifier.Score: duplicate feature ids in the weights table " +
          "— a weights artifact holds ONE row per feature; a union or " +
          "corruption here would score silently wrong")
      val w = new Array[Long](numFeatures)
      rows.foreach { case (f, wt) =>
        require(f >= 0 && f < numFeatures,
          s"Classifier.Score: feature $f out of [0, $numFeatures) — " +
            "the weights were trained with a different numFeatures")
        w(f.toInt) = wt
      }
      val bcW = spark.sparkContext.broadcast(w)
      df.select(col(idColumn).cast("long").as("id"),
          coalesce(featArray(textColumn, numFeatures, ngram),
            array().cast("array<long>")).as("feats"))
        .as[(Long, Array[Long])]
        .mapPartitions { it =>
          val wv = bcW.value
          it.map { case (id, feats) =>
            var m = 0L
            var i = 0
            while (i < feats.length) { m += wv(feats(i).toInt); i += 1 }
            (id, m, m > 0L)
          }
        }.toDF(idColumn, "quality_margin", "quality_keep")
    }
  }
}
