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
}
