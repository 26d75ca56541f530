package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Distributed as-of join: for every left row, attach the right row with
  * the greatest `rightTime <= leftTime` within the same key group (the
  * point-in-time lookup every feature/label pipeline needs — "the last
  * purchase before this click", "the model version live at this event").
  *
  * Spark has no native ASOF JOIN, and the naive range-join
  * (`l.key = r.key AND r.t <= l.t` + max-per-row) explodes to a cartesian
  * per key. This implementation is the union-window formulation instead:
  * tag both sides, union them, and run ONE running `last(ignoreNulls)`
  * window ordered by (time, side) — right rows sort before left rows at
  * equal time, so `last` over the unbounded-preceding frame IS the as-of
  * match under `>=` semantics. Cost: a single hash-partition shuffle on
  * the key columns (plan-pinned in PlanShapeSpec), linear in |L| + |R|,
  * no pair expansion anywhere — the shape that survives 100 TB, where a
  * range join would not.
  *
  * The matched payload travels as ONE struct (right time + payload
  * columns), so a genuinely-NULL payload value in the matched row stays
  * NULL instead of looking through to an older right row.
  *
  * Contract: right rows with NULL `rightTime` never match (same as SQL
  * ASOF, where the inequality is never true); left rows with no earlier
  * right row get NULL payloads (LEFT semantics). `rightTime` should be
  * unique per key — duplicate right times make "the" latest match
  * ambiguous (DuckDB ASOF picks one arbitrarily too).
  */
object AsOfJoin {

  def join(left: DataFrame, right: DataFrame, keyColumns: Seq[String],
           leftTime: String, rightTime: String,
           payloadColumns: Seq[String], prefix: String = "asof_"): DataFrame = {
    SparkUtil.validateColumns(left, keyColumns :+ leftTime)
    SparkUtil.validateColumns(right, keyColumns ++ (rightTime +: payloadColumns))
    val t = "__asof_t"
    val side = "__asof_side"
    val pay = "__asof_pay"

    val payStruct = struct(
      col(rightTime).as(prefix + rightTime) +:
        payloadColumns.map(c => col(c).as(prefix + c)): _*)
    val payType = right.select(payStruct).schema.head.dataType
    val payFields = (rightTime +: payloadColumns).map(prefix + _)

    val leftCols = left.columns.toSeq
    val l2 = left.select(
      leftCols.map(col) ++ Seq(col(leftTime).as(t), lit(1).as(side),
        lit(null).cast(payType).as(pay)): _*)
    // NULL right times can never satisfy `rightTime <= leftTime`
    val r2 = right.filter(col(rightTime).isNotNull).select(
      leftCols.map { c =>
        if (keyColumns.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(col(rightTime).as(t), lit(0).as(side), payStruct.as(pay)): _*)

    val w = Window.partitionBy(keyColumns.map(col): _*)
      .orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(leftCols.map(col) ++
        payFields.map(f => col(pay).getField(f).as(f)): _*)
  }

  /** Unary [[Wrangler]] wrapper (same shape as the ANN operators): the
    * two sides are selections of the input frame.
    */
  final case class AsOfJoinOp(
      leftSide: DataFrame => DataFrame,
      rightSide: DataFrame => DataFrame,
      keyColumns: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadColumns: Seq[String],
      prefix: String = "asof_") extends Wrangler {
    override def preservesSampleSize: Boolean = false
    def transform(df: DataFrame): DataFrame =
      join(leftSide(df), rightSide(df), keyColumns, leftTime, rightTime,
        payloadColumns, prefix)
  }
}
