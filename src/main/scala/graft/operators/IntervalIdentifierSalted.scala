package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.util.SparkUtil

/** Skew-immune interval identification: bit-identical semantics to
  * [[IntervalIdentifier]], executed as a salted two-phase window algebra
  * so that no single task ever processes a whole group.
  *
  * The generic window formulation partitions by the groupby keys, so one
  * giant entity (the documented 100x-scale risk, SURVEY §7.4/9) lands in
  * ONE task: a sequential sort + scan of potentially billions of rows.
  * This variant splits every group into `saltBuckets` contiguous chunks
  * by value range of the (numeric) first orderby column and decomposes
  * each sequential pass into:
  *
  *   1. chunk-local windows over (groupby, bucket) — bounded work per
  *      task regardless of group size;
  *   2. a per-chunk summary table (a few rows per group) where the
  *      cross-chunk carries resolve with windows over bucket order:
  *      duplicate-marker state in (`L_in` = last marker kind before the
  *      chunk, `R_in` = first marker kind after it — each can flip at
  *      most ONE boundary marker per chunk, because in-chunk markers see
  *      in-chunk state), the lagged end-marker bit feeding the first row,
  *      and the raw-id prefix offsets;
  *   3. validity as an aggregation keyed by (groupby, raw id) — one
  *      partition per interval, intrinsically fine-grained;
  *   4. enumeration as a dense rank of valid segments, itself chunked
  *      (local rank within the segment's origin bucket + a tiny per-group
  *      prefix over bucket totals).
  *
  * Cost: two balanced data shuffles (bucket window, raw-id aggregation)
  * plus tiny summary shuffles, versus ONE shuffle for the plain path — so
  * keep the plain operator for well-distributed entities and reach for
  * this one when a group can exceed a single executor's sort budget.
  * Chunk boundaries are value-range based, so bucket balance follows the
  * order-column distribution (ids/timestamps are near-uniform in
  * practice).
  *
  * Semantics are pinned by the golden corpus + oracle queries running
  * with the salt on (reference semantics:
  * src/pywrangler/pyspark/wranglers/interval_identifier.py:96-352).
  *
  * Contract deviations from the plain operator, both inherent to the
  * multi-pass formulation:
  *   - `transform` is EAGER (the tiny carry tables, and for Enumerated
  *     the clustered row frame, are localCheckpointed at call time) —
  *     compose it last, not inside plan-only pipelines;
  *   - the (groupby, orderby) key must uniquely order rows WITHIN each
  *     group. The plain path is also undefined on order ties (the
  *     window tie-break is arbitrary) but at least self-consistent; here
  *     the carry tables and the row side are evaluated independently,
  *     so a tie broken differently across evaluations could misplace a
  *     boundary-drop correction. Unique event ids / timestamps satisfy
  *     this.
  */
class IntervalIdentifierSalted(
    markerColumn: String,
    markerStart: Any,
    markerEnd: Option[Any] = None,
    markerStartUseFirst: Boolean = false,
    markerEndUseFirst: Boolean = true,
    orderbyColumns: Seq[String] = Nil,
    groupbyColumns: Seq[String] = Nil,
    ascending: Seq[Boolean] = Nil,
    resultType: ResultType = ResultType.Enumerated,
    targetColumnName: String = "iids",
    val saltBuckets: Int = 64)
  extends IntervalIdentifier(markerColumn, markerStart, markerEnd,
    markerStartUseFirst, markerEndUseFirst, orderbyColumns, groupbyColumns,
    ascending, resultType, targetColumnName) {

  require(saltBuckets > 1, "saltBuckets must be > 1")

  override def getParams: Seq[(String, Any)] =
    super.getParams :+ ("saltBuckets" -> saltBuckets)

  private val P = "__iis_"

  override def transform(df0: DataFrame): DataFrame = {
    validateInput(df0)
    val o1Field = df0.schema.find(_.name.equalsIgnoreCase(orderbyColumns.head))
    require(o1Field.exists(_.dataType.isInstanceOf[NumericType]),
      s"saltBuckets requires a numeric first orderby column; " +
        s"`${orderbyColumns.head}` is ${o1Field.map(_.dataType).orNull}")

    val originalCols = df0.columns.toSeq
    val g = groupbyColumns.map(col)
    val asc1 = ascending.headOption.getOrElse(true)

    // contiguous value-range chunks of the first orderby column; bounds
    // come from a broadcast 1-row min/max subplan (no separate driver
    // action — the checkpoints below are what make transform eager).
    // Bucket 0 is reserved for NULL order values (asc = nulls first; with
    // bucketSeq = -bucket under desc, 0 sorts last = desc nulls-last).
    val o1 = col(orderbyColumns.head).cast("double")
    val bounds = df0.agg(min(o1).as(P + "mn"), max(o1).as(P + "mx"))
    val mn = col(P + "mn")
    val mx = col(P + "mx")
    val bucket = when(o1.isNull || mn.isNull, lit(0))
      .when(mx === mn, lit(1))
      .otherwise(least(
        floor((o1 - mn) / ((mx - mn) / lit(saltBuckets.toDouble)))
          .cast("int") + 1,
        lit(saltBuckets)))
    val rows0 = df0.crossJoin(broadcast(bounds))
      .withColumn(P + "b", bucket)
      .withColumn(P + "bs",
        if (asc1) col(P + "b") else -col(P + "b"))
      .drop(P + "mn", P + "mx")

    val ord = SparkUtil.prepareOrderby(orderbyColumns, ascending)
    val wC = Window.partitionBy(g :+ col(P + "b"): _*).orderBy(ord: _*)
    val wCAll =
      wC.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCRun = wC.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def joinBack(left: DataFrame, right: DataFrame, extraKey: String,
                 fields: Seq[String]): DataFrame = {
      // null-safe equi-join on (groupby..., extraKey); right side renamed
      val sel = groupbyColumns.zipWithIndex.map { case (n, i) =>
        col(n).as(P + s"jg$i")
      } ++ (col(extraKey).as(P + "jk") +: fields.map(col))
      val cond = groupbyColumns.zipWithIndex
        .map { case (n, i) => col(n) <=> col(P + s"jg$i") }
        .foldLeft(col(extraKey) === col(P + "jk"))(_ && _)
      left.join(right.select(sel: _*), cond)
        .drop(groupbyColumns.indices.map(i => P + s"jg$i") :+ P + "jk": _*)
    }
    def finish(withId: DataFrame, id: Column): DataFrame =
      withId.select(originalCols.map(col) :+ id.as(targetColumnName): _*)

    val wG = Window.partitionBy(g: _*).orderBy(col(P + "sbs"))
    val wGPrev = wG.rowsBetween(Window.unboundedPreceding, -1)
    val wGNext = wG.rowsBetween(1, Window.unboundedFollowing)

    if (identicalStartEndMarkers) {
      // running count of starts; the only carry is the additive prefix.
      // Only the tiny per-chunk offset table is materialized; the row
      // side is evaluated once per consumer with column pruning.
      val isS0 = (col(markerColumn) <=> lit(markerStart)).cast("int")
      val rows1 = rows0.withColumn(P + "rawl", sum(isS0).over(wCRun))
      val summ = rows1.groupBy(g :+ col(P + "b"): _*).agg(
        max(col(P + "bs")).as(P + "sbs"),
        max(col(P + "rawl")).as(P + "sdelta"))
      val offs = summ.withColumn(P + "roff",
        coalesce(sum(col(P + "sdelta")).over(wGPrev), lit(0L)))
        .localCheckpoint()
      val joined = joinBack(rows1, offs, P + "b", Seq(P + "roff"))
      return finish(joined, col(P + "rawl") + col(P + "roff"))
    }

    val endV = markerEnd.get
    val isS0 = col(markerColumn) <=> lit(markerStart)
    val isE0 = col(markerColumn) <=> lit(endV)
    // pre-drop marker kind; the duplicate-drop STATE always evolves on
    // pre-drop markers (matching the window formulation, which computes
    // ffill/bfill denoise on the ORIGINAL marker column), so in-chunk
    // drop decisions are final except for one boundary marker per side
    val kind = when(isS0, lit(1)).when(isE0, lit(2))
      .otherwise(lit(null).cast("int"))

    // "next marker kind" must NOT use a (1, unboundedFollowing) frame:
    // Spark re-evaluates unbounded-FOLLOWING aggregate frames per row —
    // O(rows²) per partition (measured 226 s on a 2M-row group). The
    // running frame over the REVERSED window order computes the same
    // value in O(rows) with one extra in-partition sort, no shuffle.
    val wCRev = Window.partitionBy(g :+ col(P + "b"): _*)
      .orderBy(SparkUtil.prepareOrderby(orderbyColumns, ascending,
        reverse = true): _*)
    // the duplicate-drop machinery (prev/next marker scans, first/last
    // marker positions, boundary-drop carries) exists per SIDE only when
    // that side's config drops markers; the default last-start/first-end
    // config statically compiles to the plain increment algebra
    val needDropS = markerStartUseFirst
    val needDropE = !markerEndUseFirst
    // the reversed-order scan comes FIRST so the plan needs exactly one
    // reverse sort followed by one forward sort per partition — placed
    // between forward windows it would force a third in-partition sort
    val rows1 = rows0
      .withColumn(P + "kind", kind)
      .withColumn(P + "isEl",
        if (needDropE)
          isE0 && !coalesce(
            last(col(P + "kind"), ignoreNulls = true)
              .over(wCRev.rowsBetween(Window.unboundedPreceding, -1)) === 2,
            lit(false))
        else isE0)
      .withColumn(P + "pos", row_number().over(wC))
      .withColumn(P + "isSl",
        if (needDropS)
          isS0 && !coalesce(
            last(col(P + "kind"), ignoreNulls = true)
              .over(wC.rowsBetween(Window.unboundedPreceding, -1)) === 1,
            lit(false))
        else isS0)
      // local raw prefix, assuming no carry-in lagged end (fixed later)
      .withColumn(P + "incl", col(P + "isSl").cast("int") +
        lag(col(P + "isEl").cast("int"), 1, 0).over(wC))
      .withColumn(P + "rawl", sum(col(P + "incl")).over(wCRun))
      // chunk-constant fields for the summary; the marker-position /
      // marker-kind fields only exist when a boundary drop can happen
      .withColumn(P + "fk",
        if (needDropS || needDropE)
          first(col(P + "kind"), ignoreNulls = true).over(wCAll)
        else lit(null).cast("int"))
      .withColumn(P + "lk",
        if (needDropS || needDropE)
          last(col(P + "kind"), ignoreNulls = true).over(wCAll)
        else lit(null).cast("int"))
      .withColumn(P + "fmp",
        if (needDropS)
          min(when(col(P + "kind").isNotNull, col(P + "pos"))).over(wCAll)
        else lit(null).cast("int"))
      .withColumn(P + "lmp",
        if (needDropE)
          max(when(col(P + "kind").isNotNull, col(P + "pos"))).over(wCAll)
        else lit(null).cast("int"))
      .withColumn(P + "lastE",
        last(col(P + "isEl").cast("int")).over(wCAll))
    // NOT materialized: each consumer (the summary aggregation, the
    // row-side join) re-evaluates this pipeline with column pruning, so
    // only the expressions it needs run. Only the TINY carry tables and
    // (for Enumerated) the final clustered frame are checkpointed —
    // materializing this wide frame measured slower at every probed
    // scale than one extra pruned window pass.

    // one summary row per (group, chunk); all fields chunk-constant
    val summ = rows1.groupBy(g :+ col(P + "b"): _*).agg(
      max(col(P + "bs")).as(P + "sbs"),
      max(col(P + "fk")).as(P + "sfk"),
      max(col(P + "lk")).as(P + "slk"),
      max(col(P + "fmp")).as(P + "sfmp"),
      max(col(P + "lmp")).as(P + "slmp"),
      max(col(P + "pos")).as(P + "slast"),
      max(col(P + "rawl")).as(P + "sdeltab"),
      max(col(P + "lastE")).as(P + "slastE"))

    // cross-chunk carries, all non-recursive window expressions over the
    // tiny summary table:
    //   L_in  = kind of the last marker in any earlier chunk
    //   R_in  = kind of the first marker in any later chunk
    //   dropF = this chunk's FIRST marker is a start preceded (cross-
    //           chunk) by a start -> drop it (markerStartUseFirst)
    //   dropL = this chunk's LAST marker is an end followed (cross-chunk)
    //           by an end -> drop it (!markerEndUseFirst)
    //   lagEout = final end-bit of the chunk's last row (feeds the next
    //           chunk's first increment); group-first chunks default to 1
    //   sdelta  = the chunk's total raw increment after corrections
    val carr = summ
      .withColumn(P + "Lin",
        last(col(P + "slk"), ignoreNulls = true).over(wGPrev))
      .withColumn(P + "Rin",
        first(col(P + "sfk"), ignoreNulls = true).over(wGNext))
      .withColumn(P + "dropF", lit(needDropS) &&
        coalesce(col(P + "sfk") === 1 && col(P + "Lin") === 1, lit(false)))
      .withColumn(P + "dropL", lit(needDropE) &&
        coalesce(col(P + "slk") === 2 && col(P + "Rin") === 2, lit(false)))
      .withColumn(P + "lagEout", (col(P + "slastE") === 1) &&
        !(col(P + "dropL") && col(P + "slmp") === col(P + "slast")))
      .withColumn(P + "lagEin",
        coalesce(lag(col(P + "lagEout").cast("int"), 1).over(wG), lit(1)))
      .withColumn(P + "sdelta",
        col(P + "sdeltab") + col(P + "lagEin")
          - col(P + "dropF").cast("int")
          - (col(P + "dropL") && col(P + "slmp") < col(P + "slast"))
            .cast("int"))
      .withColumn(P + "roff",
        coalesce(sum(col(P + "sdelta")).over(wGPrev), lit(0L)))
      // tiny (one row per chunk); the cut stops the carry windows from
      // re-running per consumer and gives AQE an exact size, so the
      // join-back reliably picks broadcast in the skew regime
      .localCheckpoint()

    // resolve final flags and raw ids per row: a dropped boundary marker
    // shifts the raw ids of every row at/after its increment position
    val rows2 = joinBack(rows1, carr, P + "b",
      Seq(P + "dropF", P + "dropL", P + "lagEin", P + "roff"))
      .withColumn(P + "isS", col(P + "isSl") &&
        !(col(P + "dropF") && col(P + "pos") === col(P + "fmp")))
      .withColumn(P + "isE", col(P + "isEl") &&
        !(col(P + "dropL") && col(P + "pos") === col(P + "lmp")))
      .withColumn(P + "raw",
        col(P + "rawl") + col(P + "lagEin") + col(P + "roff")
          - (col(P + "dropF") && col(P + "pos") >= col(P + "fmp"))
            .cast("int")
          - (col(P + "dropL") && col(P + "pos") > col(P + "lmp"))
            .cast("int"))

    if (resultType == ResultType.Raw) return finish(rows2, col(P + "raw"))

    // validity: an interval is valid iff it contains exactly one kept
    // start + one kept end (exact semantics, matching the generic path
    // post-preprocessing). Computed as a whole-partition window keyed by
    // (group, raw) — one fine-grained partition per interval, no skew,
    // no join; this is the second (and last) full-data shuffle.
    val wSeg = Window.partitionBy(g :+ col(P + "raw"): _*)
    val rows2v0 = rows2.withColumn(P + "vi",
      (sum(col(P + "isS").cast("int") + col(P + "isE").cast("int"))
        .over(wSeg) === 2).cast("int"))

    if (resultType == ResultType.Valid)
      return finish(rows2v0,
        when(col(P + "vi") === 1, col(P + "raw")).otherwise(lit(0L)))

    // Enumerated needs the frame twice (segment ranking + final join);
    // one materialization, which also preserves the (group, raw) hash
    // clustering so the final left join shuffles only the segment side
    val rows2v = rows2v0
      .select((originalCols ++ Seq(P + "b", P + "bs", P + "raw", P + "vi"))
        .map(col): _*)
      .localCheckpoint()

    // enumeration = dense rank of VALID segments in raw order (raw ids
    // are monotone in effective row order), chunked via the segment's
    // origin bucket + a per-group prefix over bucket totals. Only valid
    // segments are ranked and joined back (left join, 0 elsewhere); the
    // join's big side is already hash-clustered by (group, raw) from the
    // validity window, so only the small segment side shuffles.
    val segs = rows2v.where(col(P + "vi") === 1)
      .groupBy(g :+ col(P + "raw"): _*)
      .agg(min(col(P + "bs")).as(P + "segbs"))
      // one row per valid interval; cut so the rank/prefix/join diamond
      // reads it once instead of re-running the big aggregation
      .localCheckpoint()
    val wSC = Window.partitionBy(g :+ col(P + "segbs"): _*)
      .orderBy(col(P + "raw"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segTot = segs.groupBy(g :+ col(P + "segbs"): _*)
      .agg(count(lit(1)).as(P + "scnt"))
      .withColumn(P + "soff", coalesce(
        sum(col(P + "scnt")).over(Window.partitionBy(g: _*)
          .orderBy(col(P + "segbs"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val segEnum = joinBack(
      segs.withColumn(P + "lrank", count(lit(1)).over(wSC)),
      segTot, P + "segbs", Seq(P + "soff"))
      .withColumn(P + "enum", col(P + "lrank") + col(P + "soff"))

    // left join: rows of invalid segments match nothing and enumerate 0
    val segSel = groupbyColumns.zipWithIndex.map { case (n, i) =>
      col(n).as(P + s"jg$i")
    } ++ Seq(col(P + "raw").as(P + "jk"), col(P + "enum"))
    val segCond = groupbyColumns.zipWithIndex
      .map { case (n, i) => col(n) <=> col(P + s"jg$i") }
      .foldLeft(col(P + "raw") === col(P + "jk"))(_ && _)
    val rows3 = rows2v.join(segEnum.select(segSel: _*), segCond, "left")
    finish(rows3, coalesce(col(P + "enum"), lit(0L)))
  }
}
