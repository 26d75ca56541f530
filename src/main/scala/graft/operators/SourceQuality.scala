package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Per-source (per-domain) quality rollups and gating — the
  * Gopher/RefinedWeb-style curation move where filtering decisions are
  * made at the SOURCE level (a spammy domain poisons all its documents)
  * rather than per document.
  *
  * Scale shape: the rollup is one `groupBy(source)` over a narrow
  * projection (source, chars, fingerprint, lang) — sums and counts
  * partial-aggregate map-side, so a corpus-hot source collapses per
  * partition before the shuffle; the distinct counts ride Catalyst's
  * Expand-based partial-distinct plan, keyed by (source, value), which
  * is skew-free because fingerprints are uniform. The gate then joins
  * the (|sources|-row) stats table back — AQE broadcasts it when it
  * fits (domains in the millions still fit; the stats row is ~50
  * bytes).
  *
  * All emitted doubles are a single IEEE division of exact 64-bit
  * integers, so the DuckDB oracle reproduces them bit-for-bit.
  */
object SourceQuality {

  private def fp(textColumn: String) =
    md5(regexp_replace(trim(lower(col(textColumn))), "\\s+", " "))

  /** Per-source stats: document count, mean chars, distinct content
    * classes (null text is one class, like [[Dedup.ExactDedup]]),
    * exact-duplicate ratio, distinct (non-null) language tags.
    */
  final case class SourceStats(sourceColumn: String = "source",
                               textColumn: String = "text",
                               charsColumn: String = "n_chars",
                               langColumn: String = "lang")
      extends Wrangler {
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df,
        Seq(sourceColumn, textColumn, charsColumn, langColumn))
      val classes = (count_distinct(col("__fp")) +
        when(count(lit(1)) > count(col("__fp")), lit(1L)).otherwise(lit(0L)))
      df.select(col(sourceColumn).as("source"),
          col(charsColumn).cast("long").as("__chars"),
          fp(textColumn).as("__fp"),
          col(langColumn).as("__lang"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          (sum(col("__chars")).cast("double") / count(lit(1)))
            .as("mean_chars"),
          classes.as("distinct_classes"),
          ((count(lit(1)) - classes).cast("double") / count(lit(1)))
            .as("dup_ratio"),
          count_distinct(col("__lang")).as("n_langs"))
    }
  }

  /** Source-level gate: keep documents whose SOURCE passes the rollup
    * thresholds, attaching the deciding stats (`source_mean_chars`,
    * `source_dup_ratio`) to every surviving row so downstream mixing /
    * reporting can reuse them without recomputing the rollup.
    */
  final case class SourceFilter(minMeanChars: Double = 0.0,
                                maxDupRatio: Double = 1.0,
                                minDocs: Long = 1L,
                                sourceColumn: String = "source",
                                textColumn: String = "text",
                                charsColumn: String = "n_chars",
                                langColumn: String = "lang")
      extends Wrangler {
    require(minDocs >= 1, "minDocs must be positive")
    override def preservesSampleSize: Boolean = false

    def transform(df: DataFrame): DataFrame = {
      Seq("source_mean_chars", "source_dup_ratio").foreach { c =>
        require(!df.columns.exists(_.equalsIgnoreCase(c)),
          s"Output column `$c` already exists in the input; rename it first")
      }
      require(!df.columns.exists(_.equalsIgnoreCase("__src")),
        "input must not carry the reserved working column `__src`")
      val stats = SourceStats(sourceColumn, textColumn, charsColumn,
          langColumn).transform(df)
        .filter(col("mean_chars") >= minMeanChars &&
          col("dup_ratio") <= maxDupRatio && col("n_docs") >= minDocs)
        .select(col("source").as("__src"),
          col("mean_chars").as("source_mean_chars"),
          col("dup_ratio").as("source_dup_ratio"))
      // NULL-SAFE equi-join: a null source is a real source class (the
      // stats rollup groups it like any other), so a doc whose null
      // source PASSES the gate must survive — a plain `===` would
      // silently drop it through the join (the ExactDedup round-10
      // null-text class). AQE broadcasts the stats side when it fits;
      // an explicit broadcast hint would pin millions-of-domains
      // corpora into driver memory instead of letting runtime stats
      // decide
      df.join(stats, col(sourceColumn) <=> col("__src"))
        .drop("__src")
    }
  }

  /** ONE-ROW corpus summary — the whole-corpus analyst table, the same
    * motif as `funnel_report` over the funnel and `session_stats` over
    * sessionization: document/source/language counts, char totals,
    * null-text count and the exact-duplicate ratio (content classes via
    * the family's normalized md5 fingerprint, null text one class).
    *
    * Scale shape: a single global aggregation over a narrow projection —
    * every measure partial-aggregates map-side (the distinct counts ride
    * Catalyst's Expand-based partial-distinct, keyed by the uniform
    * fingerprint/source/lang values), so the one-row result costs one
    * shuffle of pre-aggregated partials, never a row-level collect.
    * Doubles are single IEEE divisions of exact 64-bit integers.
    */
  final case class CorpusReport(sourceColumn: String = "source",
                                textColumn: String = "text",
                                charsColumn: String = "n_chars",
                                langColumn: String = "lang")
      extends Wrangler {
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df,
        Seq(sourceColumn, textColumn, charsColumn, langColumn))
      val classes = (count_distinct(col("__fp")) +
        when(count(lit(1)) > count(col("__fp")), lit(1L)).otherwise(lit(0L)))
      df.select(col(sourceColumn).as("__source"),
          col(charsColumn).cast("long").as("__chars"),
          fp(textColumn).as("__fp"),
          col(langColumn).as("__lang"),
          col(textColumn).isNull.as("__tnull"))
        .agg(
          count(lit(1)).as("n_docs"),
          count_distinct(col("__source")).as("n_sources"),
          count_distinct(col("__lang")).as("n_langs"),
          sum(col("__chars")).as("total_chars"),
          (sum(col("__chars")).cast("double") / count(lit(1)))
            .as("mean_chars"),
          sum(when(col("__tnull"), 1L).otherwise(0L)).as("n_null_text"),
          classes.as("distinct_classes"),
          ((count(lit(1)) - classes).cast("double") / count(lit(1)))
            .as("dup_ratio"))
    }
  }
}
