package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

import graft.core.Wrangler
import graft.functions.Portable._
import graft.util.SparkUtil

/** Text-analysis wranglers for large-scale document pipelines: token
  * counting, quality scoring, stopword-based language identification and
  * document fingerprinting. All are pure narrow map-side column
  * expressions (no shuffle, full whole-stage codegen), so they scale
  * linearly with input splits — the right shape for a 100 TB corpus.
  *
  * Framework shape follows the reference wrangler contract
  * (reference: src/pywrangler/base.py:12-131); the text operators
  * themselves extend the reference's surface for training-data pipelines.
  */
object TextAnalysis {

  /** Whitespace + distinct token counts and raw char length. */
  final case class TokenCount(textColumn: String = "text")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(textColumn))
      val toks = tokens(col(textColumn))
      df.withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("n_distinct_tokens", size(array_distinct(toks)).cast("long"))
        .withColumn("n_chars", length(col(textColumn)).cast("long"))
        // BPE-ish regex tokenization: letter runs, digit runs, and single
        // non-space symbols each count as one token
        .withColumn("n_regex_tokens", size(regexp_extract_all(
          lower(col(textColumn)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
          .cast("long"))
    }
  }

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  /** Heuristic quality signals: token counts, average token length,
    * stopword ratio and a composite score in [0, 1]. All ratios derive
    * from exact integer counts, so they are engine-deterministic.
    */
  final case class QualityScore(textColumn: String = "text")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(textColumn))
      val toks = tokens(col(textColumn))
      val stopArr = array(Stopwords.map(lit): _*)
      val nTok = size(toks).cast("long")
      val charSum = aggregate(F.transform(toks, t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x)
      val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("long")
      val nChars = length(col(textColumn)).cast("long")
      val nPunct = (nChars - length(regexp_replace(col(textColumn),
        "[^a-zA-Z0-9\\s]", ""))).cast("long")
      val avgLen = charSum.cast("double") / nTok.cast("double")
      val stopRatio = nStop.cast("double") / nTok.cast("double")
      df.withColumn("n_tokens", nTok)
        .withColumn("avg_token_len", round(avgLen, 6))
        .withColumn("stopword_ratio", round(stopRatio, 6))
        .withColumn("punct_ratio",
          round(nPunct.cast("double") / nChars.cast("double"), 6))
        .withColumn("quality_score",
          round(least(nTok.cast("double") / lit(100.0), lit(1.0)) *
            (lit(1.0) - stopRatio), 6))
    }
  }

  /** Per-language marker-token lists for the n-gram/stopword language-ID
    * heuristic. Order defines the deterministic argmax tie-break.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "los", "y", "una", "que", "en"),
  )

  /** Stopword-hit language identification: score each language by marker
    * token hits; predict the max-scoring language (ties resolved in
    * [[LangMarkers]] order), `und` (undetermined) when no marker hits.
    */
  final case class LanguageId(textColumn: String = "text")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(textColumn))
      val toks = tokens(col(textColumn))
      val scores = LangMarkers.map { case (lang, words) =>
        val arr = array(words.map(lit): _*)
        lang -> size(filter(toks, t => array_contains(arr, t))).cast("long")
      }
      val withScores = scores.foldLeft(df) { case (d, (lang, s)) =>
        d.withColumn(s"score_$lang", s)
      }
      // argmax with first-wins tie-break: a language is predicted when its
      // score is positive and >= every LATER language's score (evaluated
      // in LangMarkers order); 'und' when all scores are zero
      val pred = scores.reverse.foldLeft(lit("und"): Column) {
        case (acc, (lang, _)) =>
          val c = col(s"score_$lang")
          val later = scores.dropWhile(_._1 != lang).drop(1)
          val wins = later.foldLeft(c > 0) {
            case (p, (m, _)) => p && c >= col(s"score_$m")
          }
          when(wins, lit(lang)).otherwise(acc)
      }
      withScores.withColumn("pred_lang", pred)
    }
  }

  /** Text normalization for ingest pipelines: strip HTML-ish tags,
    * collapse whitespace runs, trim, optionally lowercase — pure
    * map-side regex expressions. Emits the normalized text plus its
    * length and md5 (the stable join/dedup keys downstream stages use).
    */
  final case class Normalize(textColumn: String = "text",
                             lowercase: Boolean = true)
      extends Wrangler {
    override def preservesSampleSize: Boolean = true
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(textColumn))
      val stripped = regexp_replace(col(textColumn), "<[^>]*>", " ")
      val collapsed = trim(regexp_replace(stripped, "\\s+", " "))
      val norm = if (lowercase) lower(collapsed) else collapsed
      df.withColumn("norm_text", norm)
        .withColumn("norm_len", length(col("norm_text")).cast("long"))
        .withColumn("norm_fp", md5(col("norm_text")))
    }
  }

  /** Document fingerprints: an md5 content fingerprint over
    * whitespace-normalized text plus a 31-base rolling token hash
    * (mod 1e9+7) — both portable across engines and cheap at scale.
    */
  final case class Fingerprint(textColumn: String = "text")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(textColumn))
      val norm = regexp_replace(trim(lower(col(textColumn))), "\\s+", " ")
      val roll = aggregate(tokens(col(textColumn)), lit(0L),
        (acc, t) => (acc * 31L + tokenHash(t)) % 1000000007L)
      df.withColumn("md5_fp", md5(norm))
        .withColumn("roll_fp", roll)
    }
  }

  /** Within-document repetition signals — the standard web-corpus
    * "repetitious document" filter family: the fraction of duplicate
    * word 2-grams / 3-grams (1 - distinct/total). Pure map-side array
    * expressions over bounded per-row token lists; ratios are a single
    * IEEE division of exact integer counts, so engine-deterministic.
    */
  final case class RepetitionScore(textColumn: String = "text")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true

    /** NON-distinct word n-grams (the dedup shingles collapse dupes;
      * repetition scoring is precisely about the dupes).
      */
    private def grams(toks: Column, n: Int): Column =
      when(size(toks) >= n,
        F.transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))

    private def dupRatio(g: Column): Column =
      round(when(size(g) > 0,
        (size(g) - size(array_distinct(g))).cast("double")
          / size(g).cast("double")).otherwise(lit(0.0)), 6)

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(textColumn))
      val toks = tokens(col(textColumn))
      val g2 = grams(toks, 2)
      val g3 = grams(toks, 3)
      df.withColumn("n_2grams", size(g2).cast("long"))
        .withColumn("dup_2gram_ratio", dupRatio(g2))
        .withColumn("n_3grams", size(g3).cast("long"))
        .withColumn("dup_3gram_ratio", dupRatio(g3))
        .withColumn("repetition_score",
          greatest(col("dup_2gram_ratio"), col("dup_3gram_ratio")))
    }
  }

  /** PII redaction for training-data pipelines: emails, IPv4 addresses
    * and international-format phone numbers are replaced with typed
    * placeholder tokens, with match counts emitted for audit. Pure
    * map-side regex (codegen'd), zero shuffle; the patterns are
    * RE2-compatible so the DuckDB oracle replays them verbatim.
    * Redaction order (email, then IP, then phone) is fixed, and each
    * count is taken on the text AS THAT PASS SEES IT — so the audit
    * counts equal the replacements actually performed even when
    * patterns overlap (e.g. an all-digit email local part that the
    * IPv4 regex would also match is counted once, as an email).
    */
  final case class PiiScrub(textColumn: String = "text")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(textColumn))
      val t = col(textColumn)
      def count(on: Column, re: String): Column =
        size(regexp_extract_all(on, lit(re), lit(0))).cast("long")
      val afterEmail = regexp_replace(t, PiiScrub.EmailRe, "<EMAIL>")
      val afterIp = regexp_replace(afterEmail, PiiScrub.Ipv4Re, "<IP>")
      val scrubbed = regexp_replace(afterIp, PiiScrub.PhoneRe, "<PHONE>")
      df.withColumn("n_emails", count(t, PiiScrub.EmailRe))
        .withColumn("n_ips", count(afterEmail, PiiScrub.Ipv4Re))
        .withColumn("n_phones", count(afterIp, PiiScrub.PhoneRe))
        .withColumn("scrubbed", scrubbed)
        .withColumn("scrub_len", length(col("scrubbed")).cast("long"))
        .withColumn("scrub_fp", md5(col("scrubbed")))
    }
  }

  object PiiScrub {
    val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val Ipv4Re =
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val PhoneRe = "\\+[0-9][0-9 -]{6,}[0-9]"
  }
}
