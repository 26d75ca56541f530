package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Gap-based sessionization: rows of an entity belong to the same session
  * while the gap between consecutive timestamps stays <= `maxGap`; a
  * larger gap opens a new session. Session ids enumerate 1..n per entity
  * in time order.
  *
  * The natural sibling of interval identification on the same ordered,
  * grouped event model (reference data model:
  * src/pywrangler/wranglers.py:64-74) and the standard building block of
  * behavioral training-data pipelines.
  *
  * Execution: one ordered window per group — a single shuffle on the
  * groupby keys, cumulative sum with an explicit rows-frame (same scale
  * characteristics as the interval identifier's main window).
  *
  * @param tsColumn       numeric or timestamp column measuring event time.
  *                       Numeric columns compare gaps in their own units;
  *                       TIMESTAMP / TIMESTAMP_NTZ columns are normalized
  *                       to epoch MICROSECONDS for the gap test (raw
  *                       timestamp subtraction yields an interval type
  *                       that cannot be compared to `maxGap`; NTZ is read
  *                       in the session time zone). Other types fail loud.
  * @param maxGap         largest in-session gap, in `tsColumn` units
  *                       (microseconds for timestamp columns)
  * @param orderTiebreak  extra columns ordering ties deterministically
  * @param allowGlobalWindow opt-in for empty `groupbyColumns`: a global
  *                       `Window.partitionBy()` funnels EVERY row through
  *                       one task — a scale foot-gun that must never be
  *                       reachable by accident (same stance as the
  *                       interval identifier's mandatory orderby)
  */
final case class Sessionize(tsColumn: String,
                            maxGap: Long,
                            groupbyColumns: Seq[String] = Nil,
                            orderTiebreak: Seq[String] = Nil,
                            targetColumnName: String = "session_id",
                            allowGlobalWindow: Boolean = false)
    extends Wrangler {
  override def preservesSampleSize: Boolean = true

  def transform(df: DataFrame): DataFrame = {
    require(groupbyColumns.nonEmpty || allowGlobalWindow,
      "Sessionize with empty `groupbyColumns` sorts ALL rows in a single " +
        "task (global window). Pass the entity columns, or opt in " +
        "explicitly with allowGlobalWindow = true for small data.")
    SparkUtil.validateColumns(df,
      Seq(tsColumn) ++ groupbyColumns ++ orderTiebreak)
    val tsNum = Sessionize.numericTs(df, tsColumn)
    val order = (tsColumn +: orderTiebreak).map(col)
    val w =
      (if (groupbyColumns.nonEmpty) Window.partitionBy(groupbyColumns.map(col): _*)
       else Window.partitionBy())
        .orderBy(order: _*)
    val gap = tsNum - lag(tsNum, 1).over(w)
    val isNew = when(gap.isNull || gap > maxGap, 1).otherwise(0)
    df.withColumn(targetColumnName,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).cast("long"))
  }
}

object Sessionize {
  /** Numeric view of an event-time column: numeric types pass through
    * (gaps/durations in their own units); TIMESTAMP / TIMESTAMP_NTZ
    * normalize to epoch MICROSECONDS (raw timestamp subtraction yields
    * `DayTimeIntervalType`, which silently changes output schemas and
    * cannot be compared to a long gap — round-10 ADVICE). Anything else
    * fails loud up front.
    */
  private[operators] def numericTs(df: DataFrame, tsColumn: String)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{NumericType, TimestampNTZType, TimestampType}
    df.select(col(tsColumn)).schema.head.dataType match {
      case _: NumericType => col(tsColumn)
      case TimestampType => unix_micros(col(tsColumn))
      case TimestampNTZType =>
        // NTZ has no instant; interpret in the session time zone (UTC in
        // this library's session builders) — deterministic given the conf
        unix_micros(col(tsColumn).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"`$tsColumn` is $other; event time needs a numeric or timestamp " +
          "column (numeric → native units, timestamp → microseconds)")
    }
  }
}

/** Per-session rollup over [[Sessionize]]'s output — the table an
  * analyst reads after sessionizing (the sibling of
  * [[FunnelReport]] over [[Funnel]]): one row per (entity, session)
  * with the event count, first/last event time and duration.
  *
  * `duration` typing is explicit, never engine-implicit: a NUMERIC
  * `tsColumn` yields `session_end - session_start` in the column's own
  * units (long for integral inputs); a TIMESTAMP `tsColumn` yields
  * MICROSECONDS as a long (`unix_micros` difference — raw subtraction
  * would silently return a `DayTimeIntervalType` and change the output
  * schema contract). Any other type fails loud up front.
  *
  * Scale shape: [[Sessionize]]'s ONE keyed window shuffle, then a
  * `groupBy(entity, session_id)` aggregation that introduces NO second
  * exchange — the window's hash partitioning on the entity columns
  * already clusters every (entity, session) pair, and Spark's
  * EnsureRequirements recognizes the subset partitioning (pinned in
  * the spec). Map-side partial aggregation bounds a hot session by its
  * own event count.
  */
final case class SessionStats(tsColumn: String,
                              maxGap: Long,
                              groupbyColumns: Seq[String] = Nil,
                              orderTiebreak: Seq[String] = Nil,
                              allowGlobalWindow: Boolean = false)
    extends Wrangler {
  override def preservesSampleSize: Boolean = false

  def transform(df: DataFrame): DataFrame = {
    Seq("session_id", "n_events", "session_start", "session_end",
      "duration").foreach { c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input must not carry `$c` (an output / working column)")
    }
    SparkUtil.validateColumns(df, Seq(tsColumn))
    // resolves the duration typing up front (fail-loud on non-numeric,
    // non-timestamp columns) — the same normalization Sessionize's gap
    // test uses, so the two stay unit-consistent by construction
    val tsNum = Sessionize.numericTs(df, tsColumn)
    Sessionize(tsColumn, maxGap, groupbyColumns, orderTiebreak,
        allowGlobalWindow = allowGlobalWindow)
      .transform(df)
      .groupBy((groupbyColumns :+ "session_id").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsColumn)).as("session_start"),
        max(col(tsColumn)).as("session_end"),
        (max(tsNum) - min(tsNum)).as("duration"))
  }
}
