package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.functions.Portable
import graft.util.SparkUtil

/** The composed ingest recipe — the documented streaming curation loop
  * (canonicalize → gate → strip against the persisted line index →
  * encode) wired as ONE operator over the three persisted fit
  * artifacts: the DSIR feature-count table ([[Dsir.featureCounts]]),
  * the line-frequency index ([[Corpus.IncrementalHotLines.lineIndex]])
  * and a self-describing subword vocab ([[Tokenize.VocabBuild]] /
  * [[Tokenize.BpeLearn]]). Every leg is the EXACT arithmetic of its
  * standalone face — the ratio table of [[graft.streaming.StreamingDsir]],
  * the hot-set strip of [[graft.streaming.StreamingHotLineStrip]], the
  * trie encode of [[Tokenize.BpeEncode]] (the shared
  * [[Tokenize.WordEncoder]]) — fused into ONE stateless typed pass:
  * per micro-batch (or batch partition) each document scores, gates,
  * strips and encodes in a single map step with zero shuffles, zero
  * state store, and all artifacts broadcast once at plan-build time
  * (fit-param drift raises before the stream starts).
  *
  * Leg order (the loop's contract): the optional URL canonicalization
  * runs first (`urlColumn` set — [[Web.UrlCanonicalize]]'s codegen'd
  * chain, `url_canonical` threads to the output); the GATE scores the
  * RAW text against the count table (a doc the gate drops is never
  * stripped or encoded — admission is the cheap leg, run it first);
  * the STRIP removes corpus-hot lines with INDEX frequencies alone
  * (`countBatch = false` semantics — the only contract an unbounded
  * stream can honor); the ENCODE tokenizes the CLEAN text (lowercased
  * per the vocab's own fit params).
  *
  * Output: one row per ADMITTED document — `(doc_id[, url_canonical],
  * dsir_score, n_lines, n_kept_lines, clean_text, n_bpe_tokens,
  * bpe_ids)`.
  *
  * Index maintenance is deliberately OUTSIDE this operator (the
  * streaming family's documented horizon trade): fold each processed
  * batch into each persisted index EXACTLY ONCE at compaction cadence
  * — [[Dsir.foldBatch]], [[Corpus.IncrementalHotLines.foldBatch]],
  * [[Dedup.IncrementalMinHashLSH]]'s folds — then rebuild the stream
  * against the updated artifacts (StreamingCurationSpec walks the full
  * loop across micro-batch boundaries).
  *
  * Works on BATCH frames too (it is a stateless map pass — the same
  * duality as [[Tokenize.BpeEncode]]): the batch face is what the
  * `curation_recipe` oracle query gates, replaying gate, strip, vocab
  * derivation and encode in one SQL derivation.
  */
object Curation {

  /** Broadcast hot-line membership as SORTED 64-bit fingerprints
    * ([[Portable.lineHash64Local]]) instead of raw strings — 8 bytes
    * per hot line, so the 100 TB-corpus hot set (maxHotLines = 4M
    * default) broadcasts as ~32 MB where raw text would be multi-GB.
    * Membership is a binary search (no per-entry boxing, cache-dense).
    * False-positive bound: a non-hot probe line matches a hot
    * fingerprint with probability ~m/2^64 (m = hot-set size) — ~2e-13
    * per line even at the 4M cap; the batch face
    * ([[Corpus.HotLineStrip]]'s anti-join on the raw line) stays the
    * exact-string path. */
  private[graft] final class HotSet(private val hashes: Array[Long])
      extends Serializable {
    def contains(line: String): Boolean =
      java.util.Arrays.binarySearch(
        hashes, Portable.lineHash64Local(line)) >= 0
    def size: Int = hashes.length
  }

  /** The bounded, fail-loud hot-set collect shared by [[buildLegs]]
    * and [[graft.streaming.StreamingHotLineStrip]]: index lines with
    * `doc_freq > maxDocFreq`, fingerprinted EXECUTOR-side (only the
    * 8-byte hashes ever reach the driver), capped at `maxHotLines`. */
  private[graft] def collectHotSet(lineIndex: DataFrame,
                                   maxDocFreq: Long, maxHotLines: Int,
                                   who: String): HotSet = {
    SparkUtil.validateColumns(lineIndex, Seq("line", "doc_freq"))
    val spark = lineIndex.sparkSession
    import spark.implicits._
    val hashes = lineIndex
      .filter(col("doc_freq").cast("long") > maxDocFreq)
      .select(col("line").cast("string"))
      .limit(maxHotLines + 1)
      .as[String].map(Portable.lineHash64Local).collect()
    require(hashes.length <= maxHotLines,
      s"$who: hot set exceeds maxHotLines=$maxHotLines — a hot set is " +
        "bounded by corpus-lines / maxDocFreq; a set this large means " +
        "the threshold is misconfigured for the corpus")
    // distinct: two distinct hot lines colliding on the fingerprint is
    // harmless for membership, but keep the array canonical for search
    new HotSet(hashes.distinct.sorted)
  }

  /** The gate + strip legs as one serializable artifact bundle —
    * broadcast once, shared by [[Recipe]] and the probe leg
    * ([[graft.streaming.StreamingCuration.dupPairs]]) so the two can
    * never drift. `clfW` (nullable) is the OPTIONAL trained-gate leg:
    * the [[Classifier.weightsTable]] weights as a dense array — when
    * present, admission requires the classifier margin > 0 IN ADDITION
    * to the DSIR threshold (the CCNet shape: importance weights AND a
    * trained quality model). */
  private[graft] final class Legs(lr: Array[Long], hot: HotSet,
                                  nf: Int, minScore: Long,
                                  clfW: Array[Long], clfNgram: Int)
      extends Serializable {
    /** The [[graft.streaming.StreamingDsir]] scoring arithmetic —
      * null text scores exactly 0. */
    def score(text: String): Long = {
      val toks = Portable.tokensLocal(text)
      var s = 0L
      if (toks != null) {
        var i = 0
        while (i < toks.length) {
          s += lr((Portable.tokenHashLocal(toks(i)) % nf).toInt)
          i += 1
        }
      }
      s
    }

    def hasClassifier: Boolean = clfW != null

    /** The trained-gate margin — the local mirror of
      * [[Classifier.Score]]'s arithmetic (unigram or bigram features
      * over the SAME hash cells; null text scores exactly 0). */
    def clfMargin(text: String): Long = {
      val toks = Portable.tokensLocal(text)
      var m = 0L
      if (toks != null) {
        val cnf = clfW.length
        if (clfNgram == 1) {
          var i = 0
          while (i < toks.length) {
            m += clfW((Portable.tokenHashLocal(toks(i)) % cnf).toInt)
            i += 1
          }
        } else {
          var i = 0
          while (i < toks.length - 1) {
            m += clfW((Portable.tokenHashLocal(
              toks(i) + " " + toks(i + 1)) % cnf).toInt)
            i += 1
          }
        }
      }
      m
    }

    def admits(score: Long): Boolean = score >= minScore

    /** The [[graft.streaming.StreamingHotLineStrip]] arithmetic:
      * `(n_lines, n_kept_lines, clean_text)`. */
    def strip(text: String): (Long, Long, String) =
      if (text == null) (0L, 0L, "")
      else {
        val ls = text.split("\n", -1)
        val kept = ls.filterNot(hot.contains)
        (ls.length.toLong, kept.length.toLong, kept.mkString("\n"))
      }
  }

  /** Wire the gate + strip artifacts (all fail loud: ratio-table fit
    * params, the bounded hot-set collect, the classifier weights'
    * self-description). */
  private[graft] def buildLegs(lineIndex: DataFrame, counts: DataFrame,
                               numFeatures: Int, minScore: Long,
                               maxDocFreq: Long, maxHotLines: Int,
                               who: String,
                               clfWeights: Option[DataFrame] = None,
                               clfNumFeatures: Int = 1024,
                               clfNgram: Int = 1): Legs = {
    val spark = lineIndex.sparkSession
    import spark.implicits._
    val lr = Dsir.ratioTable(counts, numFeatures, who)
    val hotSet = collectHotSet(lineIndex, maxDocFreq, maxHotLines, who)
    val clfW = clfWeights.map { wdf =>
      SparkUtil.validateColumns(wdf, Seq("feature", "weight"))
      SparkUtil.requireFitParam(wdf, "feature", "numFeatures",
        clfNumFeatures.toLong, who)
      SparkUtil.requireFitParam(wdf, "feature", "ngram",
        clfNgram.toLong, who)
      val w = new Array[Long](clfNumFeatures)
      wdf.select(col("feature").cast("long"), col("weight").cast("long"))
        .as[(Long, Long)].collect().foreach { case (f, wt) =>
          require(f >= 0 && f < clfNumFeatures,
            s"$who: classifier feature $f out of [0, $clfNumFeatures) " +
              "— the weights were trained with a different numFeatures")
          w(f.toInt) = wt
        }
      w
    }.orNull
    new Legs(lr, hotSet, numFeatures, minScore, clfW, clfNgram)
  }

  final case class Recipe(lineIndex: DataFrame,
                          counts: DataFrame,
                          vocab: DataFrame,
                          minScore: Long,
                          idColumn: String = "doc_id",
                          textColumn: String = "text",
                          urlColumn: Option[String] = None,
                          maxDocFreq: Long = 100L,
                          numFeatures: Int = 4096,
                          maxHotLines: Int = 1 << 22,
                          pieceColumn: String = "piece",
                          vocabIdColumn: String = "id",
                          continuationPrefix: String = "##",
                          lowercase: Boolean = true,
                          byteLevel: Boolean = false,
                          unkId: Option[Long] = None,
                          maxVocab: Int = 1 << 22,
                          classifierWeights: Option[DataFrame] = None,
                          clfNumFeatures: Int = 1024,
                          clfNgram: Int = 1)
      extends Wrangler {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    require(maxHotLines >= 1, "maxHotLines must be positive")
    require(clfNgram == 1 || clfNgram == 2,
      s"clfNgram must be 1 or 2, got $clfNgram")
    // the artifact frames are structural inputs, not tunables
    override def getParams: Seq[(String, Any)] = Seq(
      "minScore" -> minScore, "idColumn" -> idColumn,
      "textColumn" -> textColumn, "urlColumn" -> urlColumn,
      "maxDocFreq" -> maxDocFreq, "numFeatures" -> numFeatures,
      "maxHotLines" -> maxHotLines, "pieceColumn" -> pieceColumn,
      "vocabIdColumn" -> vocabIdColumn,
      "continuationPrefix" -> continuationPrefix,
      "lowercase" -> lowercase, "byteLevel" -> byteLevel,
      "unkId" -> unkId, "maxVocab" -> maxVocab,
      "clfNumFeatures" -> clfNumFeatures, "clfNgram" -> clfNgram)
    override def preservesSampleSize: Boolean = false

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df,
        Seq(idColumn, textColumn) ++ urlColumn)
      val spark = df.sparkSession
      import spark.implicits._
      // ---- artifact wiring, once at plan-build time (all fail loud)
      val legs = buildLegs(lineIndex, counts, numFeatures, minScore,
        maxDocFreq, maxHotLines, "Curation.Recipe", classifierWeights,
        clfNumFeatures, clfNgram)
      val (firstArr, contArr) = Tokenize.collectEncodeVocab(vocab,
        pieceColumn, vocabIdColumn, continuationPrefix, lowercase,
        byteLevel, maxVocab, unkId, "Curation.Recipe")
      val bcLegs = spark.sparkContext.broadcast(legs)
      val bcFirst = spark.sparkContext.broadcast(firstArr)
      val bcCont = spark.sparkContext.broadcast(contArr)
      val (pfx, unk, lc, bl) =
        (continuationPrefix, unkId, lowercase, byteLevel)
      val hasClf = legs.hasClassifier

      // the fused per-doc leg chain; None for gated-out docs. The
      // trained-gate leg composes as an AND when weights are wired
      // (the CCNet shape: importance weights AND a trained quality
      // model must both pass).
      def curateOne(lg: Legs, enc: Tokenize.WordEncoder,
                    out: ArrayBuffer[Long])(docId: Long, text: String)
          : Option[(Long, Long, Long, Long, Long, String, Long,
            Array[Long])] = {
        val score = lg.score(text)
        if (!lg.admits(score)) None
        else {
          val margin = if (lg.hasClassifier) lg.clfMargin(text) else 0L
          if (lg.hasClassifier && margin <= 0L) None
          else {
            val (nLines, nKept, clean) = lg.strip(text)
            out.clear()
            // BpeEncode lowercases via a column expression; the local
            // mirror is Locale.ROOT (the Portable.tokensLocal
            // convention)
            val encText =
              if (lc) clean.toLowerCase(java.util.Locale.ROOT) else clean
            enc.encodeInto(docId, encText, out, null)
            Some((docId, score, margin, nLines, nKept, clean,
              out.length.toLong, out.toArray))
          }
        }
      }

      val raw = urlColumn match {
        case None =>
          df.select(col(idColumn).cast("long"),
              col(textColumn).cast("string"))
            .as[(Long, String)]
            .mapPartitions { it =>
              val enc = new Tokenize.WordEncoder(bcFirst.value,
                bcCont.value, pfx, bl, unk, "<unk>")
              val one = curateOne(bcLegs.value, enc,
                new ArrayBuffer[Long](256)) _
              it.flatMap { case (id, text) => one(id, text) }
            }
            .toDF(idColumn, "dsir_score", "quality_margin", "n_lines",
              "n_kept_lines", "clean_text", "n_bpe_tokens", "bpe_ids")
        case Some(uc) =>
          // CANONICALIZE first — the codegen'd column chain, then the
          // fused typed legs; url_canonical threads to the output
          Web.UrlCanonicalize(uc).transform(df)
            .select(col(idColumn).cast("long"),
              col("url_canonical").cast("string"),
              col(textColumn).cast("string"))
            .as[(Long, String, String)]
            .mapPartitions { it =>
              val enc = new Tokenize.WordEncoder(bcFirst.value,
                bcCont.value, pfx, bl, unk, "<unk>")
              val one = curateOne(bcLegs.value, enc,
                new ArrayBuffer[Long](256)) _
              it.flatMap { case (id, url, text) =>
                one(id, text).map { r =>
                  (r._1, url, r._2, r._3, r._4, r._5, r._6, r._7, r._8)
                }
              }
            }
            .toDF(idColumn, "url_canonical", "dsir_score",
              "quality_margin", "n_lines", "n_kept_lines", "clean_text",
              "n_bpe_tokens", "bpe_ids")
      }
      // the margin column exists only when the trained gate is wired —
      // the classifier-less output schema stays exactly the r15 one
      if (hasClf) raw else raw.drop("quality_margin")
    }
  }
}
