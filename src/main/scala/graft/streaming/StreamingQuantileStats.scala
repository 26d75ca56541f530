package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Windowed streaming quantiles — the streaming sibling of the batch
  * quality-gate family ([[graft.operators.Corpus.QuantileStats]] /
  * `QuantileBandFilter`), round-9 verdict stretch #7: per event-time
  * window and group, the approximate quantiles of a numeric column,
  * emitted once (append mode) when the watermark closes the window.
  * This is what lets a streaming curation chain gate on "drop each
  * language's length outliers against its own current distribution"
  * the way the batch chain does — the emitted per-(window, group)
  * thresholds join onto the next window's stream as the gate.
  *
  * Spark-first shape: a plain watermarked `groupBy(window, group)`
  * aggregation with the built-in Greenwald–Khanna sketch
  * (`percentile_approx`) as the aggregate — the sketch buffer IS the
  * state-store row, so state is one bounded sketch per open
  * (window, group) pair (O(accuracy) entries each), eviction is
  * watermark-driven and Spark-managed, and recovery is exactly-once
  * for free. No custom `flatMapGroupsWithState` state to get wrong.
  *
  * ERROR BOUND (documented, inherent): GK with `accuracy` guarantees
  * each reported quantile is an ACTUAL element of the window whose
  * rank differs from the target `ceil(q * n)` by at most
  * `n / accuracy` (default 10000 -> 0.01% of the window's rows; for
  * windows smaller than ~`accuracy` rows the sketch holds every value
  * and the result is exact percentile_disc). The batch family is
  * exact by construction; this is the price of single-pass bounded
  * state on an unbounded stream, and the knob is explicit. The bound
  * is MEASURED in its approximate regime, not just stated: the
  * StressCorpus `win_quantiles approx-regime` row streams 250x the
  * accuracy per window over a modular-bijection value layout and
  * asserts every reported quantile's true rank lands within the bound.
  *
  * Output: (window_start, window_end, group columns..., n,
  * p<q> columns named exactly like the batch operator) — one FINAL
  * row per closed (window, group), never retracted.
  */
final class StreamingQuantileStats(groupColumns: Seq[String],
                                   valueColumn: String,
                                   quantiles: Seq[Double] =
                                     Seq(0.5, 0.9, 0.99),
                                   tsColumn: String = "ts",
                                   windowDuration: String = "1 minute",
                                   accuracy: Int = 10000) {
  require(groupColumns.nonEmpty, "groupColumns must be non-empty")
  require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
    "quantiles must be within (0, 1]")
  require(quantiles.distinct.size == quantiles.size,
    s"quantiles must be distinct, got $quantiles")
  require(quantiles.map(Corpus.quantileName).distinct.size ==
    quantiles.size, s"quantiles $quantiles collide after p-formatting")
  require(accuracy >= 100, "accuracy must be >= 100")

  /** `df` must be a streaming DataFrame with an event-time watermark
    * on `tsColumn` (append mode needs it to finalize windows).
    */
  def transform(df: DataFrame): DataFrame = {
    graft.util.SparkUtil.validateColumns(df,
      groupColumns ++ Seq(tsColumn, valueColumn))
    require(df.isStreaming,
      "StreamingQuantileStats.transform needs a streaming DataFrame " +
        s"(with a watermark on `$tsColumn`); got a batch frame — use " +
        "Corpus.QuantileStats there, which is exact")
    val keys = window(col(tsColumn), windowDuration) +:
      groupColumns.map(col)
    val qCols = quantiles.zipWithIndex.map { case (q, i) =>
      element_at(col("__qs"), i + 1).as(Corpus.quantileName(q))
    }
    // same fail-loud value contract as the batch QuantileStats: a null
    // would be silently SKIPPED by percentile_approx while count(*)
    // counts it — `n` and the p-columns would describe different
    // populations — and a NaN corrupts the GK sketch's ordering
    val vd = col(valueColumn).cast("double")
    val guarded = when(col(valueColumn).isNull || vd.isNull || isnan(vd),
      raise_error(concat(
        lit(s"StreamingQuantileStats: `$valueColumn` must be non-null, " +
          "numeric-castable and non-NaN; got: "),
        coalesce(col(valueColumn).cast("string"), lit("NULL"))))
        .cast("double"))
      .otherwise(vd)
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        percentile_approx(guarded,
          array(quantiles.map(lit): _*), lit(accuracy)).as("__qs"))
      .select((col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        groupColumns.map(col) :+ col("n")) ++ qCols: _*)
  }
}
