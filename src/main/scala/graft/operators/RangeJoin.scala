package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Distributed binned range join: match every point row to the range
  * rows whose `[lo, hi]` interval contains the point's time, within the
  * same key group — "which promotion windows was this click inside",
  * "which session span does this log line belong to".
  *
  * Spark plans a raw range predicate as a nested-loop join (keyless) or
  * as an equi-join whose per-key residual filter is a cross section of
  * every point x every range of the key (hot keys go quadratic). The
  * scale shape here is bin bucketing instead: time is cut into
  * fixed-width bins, each range explodes into the bins it overlaps
  * (bounded by `maxBinsPerRange` — fail-loud, a silent wide range would
  * multiply the row count), each point maps to exactly ONE bin, and the
  * match is a plain equi-join on (keys, bin) plus the exact residual
  * `t BETWEEN lo AND hi` — AQE-splittable, no pair expansion beyond a
  * bin's own cross section, and no duplicate matches by construction
  * (a range meets a point only in the point's single bin).
  *
  * `binWidth` trades explode factor against residual selectivity: bins
  * ~the typical range width give ~2 bins per range and residual cross
  * sections bounded by a bin's population. Bin indices use integral
  * `div` (exact on 64-bit epoch-nanos where double floor would lose
  * precision past 2^53); the time domain is assumed non-negative.
  *
  * Output: every matched (point, range) pair — the point side's columns
  * plus the range side's `lo`/`hi` and `rangePayload` columns. Aggregate
  * or left-join back downstream for per-point / per-range rollups.
  */
object RangeJoin {

  def join(points: DataFrame, ranges: DataFrame, keyColumns: Seq[String],
           timeColumn: String, loColumn: String, hiColumn: String,
           binWidth: Long, rangePayload: Seq[String] = Nil,
           maxBinsPerRange: Long = 4096L): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    require(maxBinsPerRange >= 1, "maxBinsPerRange must be >= 1")
    SparkUtil.validateColumns(points, keyColumns :+ timeColumn)
    SparkUtil.validateColumns(ranges,
      keyColumns ++ (loColumn +: hiColumn +: rangePayload))
    val bin = "__rj_bin"
    // the joined frame resolves `lo`/`hi`/payload names from the range
    // side — a same-named point column would make them ambiguous
    (loColumn +: hiColumn +: rangePayload).foreach { c =>
      require(!points.columns.exists(_.equalsIgnoreCase(c)),
        s"points side must not carry range-side column `$c`")
    }
    val pb = points.withColumn(bin,
      expr(s"`$timeColumn` div ${binWidth}L"))
    // fail-loudly: an inverted range is upstream corruption (sequence()
    // would silently count down), and a range spanning more than
    // `maxBinsPerRange` bins multiplies the exploded row count
    val lob = col(loColumn).cast("long")
    val hib = col(hiColumn).cast("long")
    val rb = ranges
      .withColumn("__rj_lo_b", expr(s"CAST(`$loColumn` AS BIGINT) div ${binWidth}L"))
      .withColumn("__rj_hi_b", expr(s"CAST(`$hiColumn` AS BIGINT) div ${binWidth}L"))
      .withColumn("__rj_guard",
        when(lob.isNull || hib.isNull || hib < lob,
          raise_error(lit(s"RangeJoin: `$loColumn` <= `$hiColumn` and " +
            "non-null required")).cast("long"))
          .when(col("__rj_hi_b") - col("__rj_lo_b") >= maxBinsPerRange,
            raise_error(concat(lit("RangeJoin: range spans "),
              col("__rj_hi_b") - col("__rj_lo_b") + 1L,
              lit(s" bins (> maxBinsPerRange=$maxBinsPerRange) — widen " +
                "binWidth or raise the cap explicitly"))).cast("long"))
          .otherwise(lit(0L)))
      .withColumn(bin,
        explode(sequence(col("__rj_lo_b") + col("__rj_guard"),
          col("__rj_hi_b"))))
      .select((((keyColumns :+ loColumn :+ hiColumn) ++ rangePayload)
        :+ bin).map(col): _*)
    pb.join(rb, keyColumns :+ bin)
      .filter(col(timeColumn) >= lob && col(timeColumn) <= hib)
      .drop(bin)
  }

  /** Unary [[Wrangler]] wrapper (same shape as [[AsOfJoin.AsOfJoinOp]]):
    * both sides are selections of the input frame.
    */
  final case class RangeJoinOp(pointSide: DataFrame => DataFrame,
                               rangeSide: DataFrame => DataFrame,
                               keyColumns: Seq[String],
                               timeColumn: String,
                               loColumn: String,
                               hiColumn: String,
                               binWidth: Long,
                               rangePayload: Seq[String] = Nil,
                               maxBinsPerRange: Long = 4096L)
      extends Wrangler {
    def transform(df: DataFrame): DataFrame =
      join(pointSide(df), rangeSide(df), keyColumns, timeColumn,
        loColumn, hiColumn, binWidth, rangePayload, maxBinsPerRange)
  }

  /** Distributed binned INTERVAL-OVERLAP join: match every left range
    * `[leftLo, leftHi]` to the right ranges `[rightLo, rightHi]` it
    * overlaps (closed intervals, `lLo <= rHi AND rLo <= lHi`) within the
    * same key group — "which promotion windows intersect which outage
    * windows", "which session spans overlap which experiment windows".
    *
    * Same bin algebra as [[join]], extended to two exploded sides: each
    * side explodes into the fixed-width bins its interval covers
    * (bounded by `maxBinsPerRange`, fail-loud), the candidate match is a
    * plain equi-join on (keys, bin), and each overlapping pair then
    * survives in EXACTLY one bin — the bin of the later of the two
    * interval starts, `bin == greatest(lLoBin, rLoBin)` — so no
    * distinct/dedup pass is ever needed (a distinct over the matched
    * pair stream would re-shuffle the whole join output at corpus
    * scale). That canonical bin lies inside both intervals' bin spans
    * precisely when the spans intersect, so no true overlap is lost; the
    * exact residual predicate removes same-bin near-misses. AQE can
    * split a hot (key, bin) like any equi-join; there is no nested-loop
    * fallback anywhere in the plan.
    *
    * The time domain is assumed non-negative (integral `div` truncates
    * toward zero, which is floor only for non-negative values — same
    * contract as [[join]]).
    *
    * Output: every matched (left, right) pair with both sides' columns;
    * the sides must not share non-key column names (fail-loud, an
    * ambiguous pair would poison downstream selects).
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  keyColumns: Seq[String],
                  leftLo: String, leftHi: String,
                  rightLo: String, rightHi: String,
                  binWidth: Long,
                  maxBinsPerRange: Long = 4096L): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    require(maxBinsPerRange >= 1, "maxBinsPerRange must be >= 1")
    SparkUtil.validateColumns(left, keyColumns ++ Seq(leftLo, leftHi))
    SparkUtil.validateColumns(right, keyColumns ++ Seq(rightLo, rightHi))
    val keySet = keyColumns.map(_.toLowerCase).toSet
    val clash = left.columns.filterNot(c => keySet(c.toLowerCase))
      .map(_.toLowerCase).toSet
      .intersect(right.columns.filterNot(c => keySet(c.toLowerCase))
        .map(_.toLowerCase).toSet)
    require(clash.isEmpty,
      s"left and right sides share non-key column(s) ${clash.mkString(", ")}" +
        " — rename before joining (the matched pair would be ambiguous)")
    // reserved working names (round-9 ADVICE): an input already carrying
    // one would be silently overwritten by withColumn and then dropped —
    // fail loudly instead, like PercentileRank/QuantileStats do
    val reserved = Set("__oj_bin", "__oj_llo_b", "__oj_rlo_b", "__oj_hi_b",
      "__oj_guard")
    for ((df, side) <- Seq((left, "left"), (right, "right"));
         c <- df.columns if reserved(c.toLowerCase))
      throw new IllegalArgumentException(
        s"OverlapJoin: $side side must not carry reserved working " +
          s"column `$c` (${reserved.mkString("/")}; matching is " +
          "case-insensitive, like Spark's resolution)")

    val bin = "__oj_bin"
    // explode one side into its covered bins, carrying its own lo-bin
    // for the canonical-bin dedupe predicate
    def binned(df: DataFrame, lo: String, hi: String,
               loBin: String): DataFrame = {
      val lob = col(lo).cast("long")
      val hib = col(hi).cast("long")
      df.withColumn(loBin, expr(s"CAST(`$lo` AS BIGINT) div ${binWidth}L"))
        .withColumn("__oj_hi_b",
          expr(s"CAST(`$hi` AS BIGINT) div ${binWidth}L"))
        .withColumn("__oj_guard",
          when(lob.isNull || hib.isNull || hib < lob,
            raise_error(lit(s"OverlapJoin: `$lo` <= `$hi` and non-null " +
              "required")).cast("long"))
            .when(col("__oj_hi_b") - col(loBin) >= maxBinsPerRange,
              raise_error(concat(lit("OverlapJoin: range spans "),
                col("__oj_hi_b") - col(loBin) + 1L,
                lit(s" bins (> maxBinsPerRange=$maxBinsPerRange) — widen " +
                  "binWidth or raise the cap explicitly"))).cast("long"))
            .otherwise(lit(0L)))
        .withColumn(bin,
          explode(sequence(col(loBin) + col("__oj_guard"),
            col("__oj_hi_b"))))
        .drop("__oj_hi_b", "__oj_guard")
    }
    val lb = binned(left, leftLo, leftHi, "__oj_llo_b")
    val rb = binned(right, rightLo, rightHi, "__oj_rlo_b")
    lb.join(rb, keyColumns :+ bin)
      // canonical bin: keep the pair only in the bin where the later
      // interval starts — exactly-once by construction
      .filter(col(bin) === greatest(col("__oj_llo_b"), col("__oj_rlo_b")))
      // exact residual: closed-interval overlap
      .filter(col(leftLo).cast("long") <= col(rightHi).cast("long") &&
        col(rightLo).cast("long") <= col(leftHi).cast("long"))
      .drop(bin, "__oj_llo_b", "__oj_rlo_b")
  }

  /** Unary [[Wrangler]] wrapper for [[overlapJoin]]. */
  final case class OverlapJoinOp(leftSide: DataFrame => DataFrame,
                                 rightSide: DataFrame => DataFrame,
                                 keyColumns: Seq[String],
                                 leftLo: String, leftHi: String,
                                 rightLo: String, rightHi: String,
                                 binWidth: Long,
                                 maxBinsPerRange: Long = 4096L)
      extends Wrangler {
    def transform(df: DataFrame): DataFrame =
      overlapJoin(leftSide(df), rightSide(df), keyColumns, leftLo, leftHi,
        rightLo, rightHi, binWidth, maxBinsPerRange)
  }
}
