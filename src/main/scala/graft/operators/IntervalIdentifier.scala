package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.{CacheMode, ColumnCacher, SparkUtil}

/** Result shape of the interval identifier
  * (reference: src/pywrangler/wranglers.py:75-83).
  */
sealed trait ResultType
object ResultType {
  /** Increasing ids for all intervals, valid or not (up to relabeling). */
  case object Raw extends ResultType
  /** Like Raw but invalid intervals (missing start or end) are set to 0. */
  case object Valid extends ResultType
  /** Valid intervals renumbered 1..n in sort order; invalid rows are 0. */
  case object Enumerated extends ResultType

  def fromString(s: String): ResultType = s.toLowerCase match {
    case "raw"        => Raw
    case "valid"      => Valid
    case "enumerated" => Enumerated
    case other => throw new IllegalArgumentException(
      s"Parameter `resultType` is invalid with: $other. " +
        "Allowed arguments are: raw, valid, enumerated")
  }
}

/** Interval identification over ordered, grouped event sequences.
  *
  * An interval is a run of rows beginning with a start marker and ending
  * with an end marker (both inclusive); all rows of the same interval get
  * the same id, non-interval rows get 0. Messy data may repeat markers, so
  * four span selections exist via `markerStartUseFirst`/`markerEndUseFirst`
  * (reference interface: src/pywrangler/wranglers.py:14-141).
  *
  * This is the generic window-function algorithm ("VectorizedCumSum",
  * reference: src/pywrangler/pyspark/wranglers/interval_identifier.py:14-462):
  *   1. optionally nullify duplicated start/end markers so every interval
  *      has exactly one of each (preprocessing),
  *   2. raw ids = cumulative sum of (isStart + lag(isEnd, 1, default 1))
  *      over the groupby/orderby window,
  *   3. valid ids = raw ids whose interval contains both markers, else 0,
  *   4. enumerated ids = valid ids renumbered 1..n via change-point cumsum.
  *
  * All steps are native Catalyst window expressions — no UDFs — so the plan
  * stays inside whole-stage codegen and scales with per-group sort-based
  * window execution. The whole pipeline costs ONE shuffle: the per-raw-iid
  * window clusters on (groupby, raw_iid), which the existing
  * hashpartitioning(groupby) already satisfies, so EnsureRequirements adds
  * only a sort (pinned by PlanShapeSpec).
  *
  * @param markerColumn   name of the column holding start/end markers
  * @param markerStart    value marking an interval start
  * @param markerEnd      value marking an interval end; None means identical
  *                       start/end semantics (every start closes + opens)
  * @param markerStartUseFirst use first (true) or last (false) of repeated
  *                       start markers; default false (last)
  * @param markerEndUseFirst   use first (true) or last (false) of repeated
  *                       end markers; default true (first)
  * @param orderbyColumns order within a group — mandatory, Spark dataframes
  *                       have no implicit row order
  * @param groupbyColumns entity partition keys (ideally partition-aligned
  *                       at scale to reduce shuffle skew)
  * @param ascending      per-orderby-column sort direction, default all true
  * @param resultType     Raw | Valid | Enumerated
  * @param targetColumnName name of the appended id column
  */
class IntervalIdentifier(
    val markerColumn: String,
    val markerStart: Any,
    val markerEnd: Option[Any] = None,
    val markerStartUseFirst: Boolean = false,
    val markerEndUseFirst: Boolean = true,
    val orderbyColumns: Seq[String] = Nil,
    val groupbyColumns: Seq[String] = Nil,
    val ascending: Seq[Boolean] = Nil,
    val resultType: ResultType = ResultType.Enumerated,
    val targetColumnName: String = "iids") extends Wrangler {

  require(orderbyColumns.nonEmpty,
    "Please define an order column. Spark dataframes have no implicit " +
      "order unlike pandas dataframes.")
  if (ascending.nonEmpty)
    require(ascending.size == orderbyColumns.size,
      "`orderbyColumns` and `ascending` must have equal number of items.")

  /** Identical start/end semantics: no explicit end marker, or equal ones
    * (reference: wranglers.py:118-120).
    */
  val identicalStartEndMarkers: Boolean =
    markerEnd.isEmpty || markerEnd.contains(markerStart)

  private def markerEndValue: Any = markerEnd.getOrElse(markerStart)

  override def preservesSampleSize: Boolean = true

  /** Primary-constructor-ordered params (get_params surface; reference:
    * base.py:56-103). Inherited by [[IntervalIdentifierAdjusted]], whose
    * constructor mirrors this one.
    */
  override def getParams: Seq[(String, Any)] = Seq(
    "markerColumn" -> markerColumn,
    "markerStart" -> markerStart,
    "markerEnd" -> markerEnd,
    "markerStartUseFirst" -> markerStartUseFirst,
    "markerEndUseFirst" -> markerEndUseFirst,
    "orderbyColumns" -> orderbyColumns,
    "groupbyColumns" -> groupbyColumns,
    "ascending" -> ascending,
    "resultType" -> resultType,
    "targetColumnName" -> targetColumnName)

  // ---------------------------------------------------------------- windows

  /** Main window: partition by groupby, order by orderby (optionally with
    * every direction flipped). One fresh-but-structurally-equal WindowSpec
    * per call keeps Catalyst's CollapseWindow merging adjacent same-spec
    * Window nodes.
    */
  protected def windowGroupby(reverse: Boolean = false): WindowSpec =
    Window
      .partitionBy(groupbyColumns.map(col): _*)
      .orderBy(SparkUtil.prepareOrderby(orderbyColumns, ascending, reverse): _*)

  /** Running-total frame. The reference relies on the default RANGE frame of
    * an ordered window; we pin ROWS explicitly so duplicate order keys can
    * never silently switch semantics (SURVEY §7.4.2).
    */
  private def running(w: WindowSpec): WindowSpec =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Per-interval window: partition by groupby + the materialized raw-iid
    * column, whole-partition frame (no ordering needed).
    */
  private def windowRawIids(rawIidColumn: String): WindowSpec =
    Window.partitionBy((groupbyColumns :+ rawIidColumn).map(col): _*)

  // ------------------------------------------------------------ marker prep

  /** Marker as 0/1 integer, null-safe (NULL and non-matching NaN are noise;
    * reference: interval_identifier.py:58-69).
    */
  private def boolifyMarker(marker: Column, start: Boolean): Column = {
    val v = if (start) markerStart else markerEndValue
    (marker <=> lit(v)).cast("integer")
  }

  /** Noise values -> null, then forward-fill (start) or backward-fill (end)
    * with the surviving markers (reference: :96-130).
    *
    * The backward fill is a running forward fill over the REVERSED
    * window, not a `(currentRow, unboundedFollowing)` frame: Spark
    * re-evaluates unbounded-FOLLOWING aggregate frames from scratch at
    * every row — O(rows²) per partition, ruinous on a large group —
    * while the reversed running frame is O(rows) plus one in-partition
    * sort and computes the identical column.
    */
  private def denoiseMarkerColumn(start: Boolean): Column = {
    val m = col(markerColumn)
    val denoised = when(m.isin(markerStart, markerEndValue), m)
    last(denoised, ignoreNulls = true)
      .over(windowGroupby(reverse = !start)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** Nullify consecutive duplicate start markers (keeping the first) or end
    * markers (keeping the last) so the core last-start/first-end algorithm
    * yields the requested span (reference: :132-178). The "next marker"
    * lead for the end side is a lag over the reversed window, matching
    * the reversed denoise direction.
    */
  private def dropDuplicatedMarker(marker: Column, start: Boolean): Column = {
    val markerValue = if (start) markerStart else markerEndValue
    val wEff = windowGroupby(reverse = !start)
    val denoised = denoiseMarkerColumn(start)
    val shifted = lag(denoised, 1).over(wEff)
    val shiftedMarkerOnly = when(denoised === lit(markerValue), shifted)
    when(shiftedMarkerOnly === marker, lit(null)).otherwise(marker)
  }

  /** Apply duplicate-marker removal as demanded by the first/last flags
    * (reference: :221-244).
    *
    * The END drop is applied FIRST (the reference applies start first;
    * the two commute: each drop only nullifies rows whose ORIGINAL
    * marker equals its own marker value — disjoint row sets — and both
    * denoise fills read the original column, so neither's condition sees
    * the other's nulls). Order matters only to the physical plan: the
    * end drop's windows run over the REVERSED order; running it first
    * and MATERIALIZING its result before the start drop keeps each
    * direction's window pair (denoise fill + its lag) adjacent, so the
    * physical plan is reversed → forward → forward. Inlined as one
    * nested expression, the analyzer splits the `lag(last(...))` chains
    * into dependency layers and alternates sort directions per layer —
    * two extra in-partition sorts on the both-drop (first-start/
    * last-end) config. Same trick as the salted identifier's
    * reversed-scan-first layout.
    */
  protected def preprocessMarkerColumn(cc: ColumnCacher): Column = {
    var m: Column = col(markerColumn)
    if (!identicalStartEndMarkers) {
      val bothDrops = !markerEndUseFirst && markerStartUseFirst
      if (!markerEndUseFirst) m = dropDuplicatedMarker(m, start = false)
      if (bothDrops) m = cc.add("marker_edrop", m, force = true)
      if (markerStartUseFirst) m = dropDuplicatedMarker(m, start = true)
    }
    m
  }

  // ------------------------------------------------------------- id algebra

  /** Raw interval ids: running sum of isStart + lagged isEnd. Lagging the
    * end marker keeps it inside its own interval; lag default 1 makes ids
    * start at 1 once the first marker appears (reference: :246-273).
    */
  protected def generateRawIids(marker: Column): Column = {
    val w = windowGroupby()
    val boolStart = boolifyMarker(marker, start = true)
    val boolEndShifted = lag(boolifyMarker(marker, start = false), 1, 1).over(w)
    sum(boolStart + boolEndShifted).over(running(w))
  }

  /** Valid ids: a raw interval is valid iff it contains both a start and an
    * end marker — exactly once each when `exact` (post-preprocessing), at
    * least once each otherwise. Invalid intervals become 0
    * (reference: :275-315).
    */
  private def generateValidIids(marker: Column, rawIids: Column,
                                exact: Boolean, rawIidColumn: String): Column = {
    val boolStart = boolifyMarker(marker, start = true)
    val boolEnd = boolifyMarker(marker, start = false)
    val w = windowRawIids(rawIidColumn)
    val summed =
      if (exact) sum(boolStart + boolEnd).over(w)
      else max(boolStart).over(w) + max(boolEnd).over(w)
    when(summed === 2, rawIids).otherwise(0)
  }

  /** Enumerate valid intervals 1..n in window order: a decrease-to-increase
    * change point (lag(valid) - valid < 0) marks each new valid interval;
    * running sum numbers them; invalid rows reset to 0 (reference: :317-352).
    */
  private def generateRenumeratedIids(validIids: Column,
                                      reverse: Boolean): Column = {
    val w = windowGroupby(reverse)
    val shifted = lag(validIids, 1, 0).over(w)
    val increase = ((shifted - validIids) < 0).cast("integer")
    val renumerated0 = sum(increase).over(running(w))
    val renumerated =
      if (reverse) reverseEnumeration(renumerated0, w) else renumerated0
    when(validIids =!= 0, renumerated).otherwise(0)
  }

  /** Map an enumeration k -> max-k+1 over the whole partition, flipping a
    * reversed-order numbering back to ascending (reference: :71-94).
    */
  private def reverseEnumeration(column: Column, w: WindowSpec): Column = {
    val wholePartition =
      w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    (column - (max(column).over(wholePartition) + 1)) * -1
  }

  /** Identical start/end markers: id = running count of start markers; rows
    * before the first marker get 0; every interval is valid by construction
    * so all result types coincide (reference: :354-373).
    */
  protected def generateIidsIdentical(marker: Column): Column = {
    val w = windowGroupby()
    sum(boolifyMarker(marker, start = true)).over(running(w))
  }

  /** Dispatch raw -> valid -> enumerated, materializing the intermediate id
    * columns the downstream windows must partition by / lag over
    * (reference: :375-425).
    */
  protected def computeValidRenumeratedIids(
      marker: Column, rawIids: Column, cc: ColumnCacher,
      validIidsExact: Boolean, renumeratedReverse: Boolean): DataFrame = {
    if (resultType == ResultType.Raw)
      return cc.finish(targetColumnName, rawIids)

    val rawRef = cc.add("raw_iids", rawIids, force = true)
    val validIids =
      generateValidIids(marker, rawRef, validIidsExact, cc.columns("raw_iids"))
    if (resultType == ResultType.Valid)
      return cc.finish(targetColumnName, validIids)

    val validRef = cc.add("valid_iids", validIids, force = true)
    cc.finish(targetColumnName,
      generateRenumeratedIids(validRef, renumeratedReverse))
  }

  protected def validateInput(df: DataFrame): Unit = {
    SparkUtil.validateColumns(df, Seq(markerColumn))
    SparkUtil.validateColumns(df, orderbyColumns)
    SparkUtil.validateColumns(df, groupbyColumns)
  }

  /** True when the first/last flags demand duplicate-marker removal (the
    * preprocessed marker is then a stack of denoise/lag windows).
    */
  private def preprocessingApplies: Boolean =
    !identicalStartEndMarkers && (markerStartUseFirst || !markerEndUseFirst)

  /** Append the interval-id column; all other columns pass through
    * unchanged and row count is preserved (reference: :427-462).
    */
  def transform(df: DataFrame): DataFrame = {
    validateInput(df)
    val cc = new ColumnCacher(df, CacheMode.Enabled)
    val marker0 = preprocessMarkerColumn(cc)
    // materialize the preprocessed marker ONCE (the reference assigns it
    // back to the dataframe, interval_identifier.py:221-244): raw-id and
    // valid-id generation each reference the marker several times, and an
    // inlined expression replicates its denoise/lag Window nodes — and
    // their in-partition sorts — per use (observed: 14 Window nodes and
    // 6.4x the LSFE wall time for the both-drop FSLE config before this)
    val marker =
      if (preprocessingApplies) cc.add("marker_pre", marker0, force = true)
      else marker0
    if (identicalStartEndMarkers)
      df.withColumn(targetColumnName, generateIidsIdentical(marker))
    else
      computeValidRenumeratedIids(marker, generateRawIids(marker), cc,
        validIidsExact = true, renumeratedReverse = false)
  }
}

/** Adjusted variant with shorter plans for the first-start/first-end and
  * last-start/last-end span selections: a single forward-filled marker-state
  * column replaces the duplicate-marker preprocessing, saving 2-3 window
  * steps. Other configurations delegate to the generic algorithm
  * (reference: src/pywrangler/pyspark/wranglers/interval_identifier.py:465-623).
  */
class IntervalIdentifierAdjusted(
    markerColumn: String,
    markerStart: Any,
    markerEnd: Option[Any] = None,
    markerStartUseFirst: Boolean = false,
    markerEndUseFirst: Boolean = true,
    orderbyColumns: Seq[String] = Nil,
    groupbyColumns: Seq[String] = Nil,
    ascending: Seq[Boolean] = Nil,
    resultType: ResultType = ResultType.Enumerated,
    targetColumnName: String = "iids")
  extends IntervalIdentifier(markerColumn, markerStart, markerEnd,
    markerStartUseFirst, markerEndUseFirst, orderbyColumns, groupbyColumns,
    ascending, resultType, targetColumnName) {

  override def transform(df: DataFrame): DataFrame = {
    val fastPath = !identicalStartEndMarkers &&
      resultType != ResultType.Raw &&
      markerStartUseFirst == markerEndUseFirst
    if (!fastPath) return super.transform(df)
    validateInput(df)
    if (markerStartUseFirst) firstStartFirstEnd(df) else lastStartLastEnd(df)
  }

  /** Raw ids from a forward-filled open/closed interval state: state flips
    * to 1 at the governing marker and 0 at its counterpart; a row whose
    * state differs from its predecessor's starts (or, negated, ends) an
    * interval; the running sum of those change indicators numbers the
    * intervals (reference: :506-564).
    */
  private def generateRawIidsSpecial(startFirst: Boolean,
                                     addNegateShiftCol: Boolean,
                                     reverse: Boolean = false): Column = {
    val m = col(markerColumn)
    val w = windowGroupby(reverse)
    val (default, forwardFill) =
      if (startFirst)
        (0, when(m === lit(markerStart), 1)
          .when(m === lit(markerEnd.get), 0).otherwise(lit(null)))
      else
        (1, when(m === lit(markerEnd.get), 1)
          .when(m === lit(markerStart), 0).otherwise(lit(null)))

    val state = last(forwardFill, ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val stateShifted = lag(state, 1, default).over(w).cast("integer")
    val openedHere = when(stateShifted === state, 0).otherwise(state)
    val increment =
      if (addNegateShiftCol)
        openedHere + when(stateShifted === 0, 1).otherwise(0)
      else openedHere
    sum(increment).over(w.rowsBetween(Window.unboundedPreceding,
      Window.currentRow))
  }

  /** FSFE fast path: forward state keyed on the start marker, non-exact
    * validity (markers may repeat inside a raw interval; reference: :566-593).
    */
  private def firstStartFirstEnd(df: DataFrame): DataFrame = {
    val cc = new ColumnCacher(df, CacheMode.Enabled)
    val rawIids = generateRawIidsSpecial(startFirst = true,
      addNegateShiftCol = true)
    computeValidRenumeratedIids(col(markerColumn), rawIids, cc,
      validIidsExact = false, renumeratedReverse = false)
  }

  /** LSLE fast path: run the FSFE machinery on the reversed window (so
    * "last" becomes "first"), then shift ids by one and flip the final
    * enumeration back to ascending order (reference: :595-623).
    */
  private def lastStartLastEnd(df: DataFrame): DataFrame = {
    val cc = new ColumnCacher(df, CacheMode.Enabled)
    val rawIids = generateRawIidsSpecial(startFirst = false,
      addNegateShiftCol = true, reverse = true) + 1
    computeValidRenumeratedIids(col(markerColumn), rawIids, cc,
      validIidsExact = false, renumeratedReverse = true)
  }
}
