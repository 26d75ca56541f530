package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Ordered funnel analysis: for each key (user), the earliest time each
  * step of an ordered event sequence completes — step i counts only if
  * it happens AT OR AFTER the time step i-1 completed ("signup, then a
  * view after the signup, then a purchase after that view"). The
  * classic product-analytics / event-pipeline rollup, and the batch
  * sibling of the sessionization family.
  *
  * Semantics: `t_<step1>` is the key's earliest step-1 event;
  * `t_<stepi>` the earliest step-i event with `ts >= t_<step(i-1)>`
  * (ties at the same timestamp chain — a view in the same instant as
  * the signup counts, matching the closed-interval convention of the
  * join operators here); `steps_completed` counts the longest prefix
  * reached. Keys with no step-1 event report 0 with all-null times.
  *
  * Scale shape: ONE keyed shuffle — the step times are a chain of
  * conditional-min windows over the SAME key partitioning (Spark plans
  * them as stacked Window nodes over one Exchange), followed by one
  * map-side-partial aggregation per key. A hot key's cost is bounded by
  * its own event count, never the corpus; no joins, no driver state.
  * The step list is a plan-time constant (funnels are a handful of
  * steps — each adds one window expression, not a pass over the data).
  */
final case class Funnel(steps: Seq[String],
                        typeColumn: String = "event_type",
                        tsColumn: String = "ts",
                        keyColumns: Seq[String] = Seq("user_id"))
    extends Wrangler {
  require(steps.size >= 2, "a funnel needs at least 2 steps")
  require(steps.distinct.size == steps.size,
    s"steps must be distinct, got $steps (a repeated step would shadow " +
      "its earlier column)")
  require(keyColumns.nonEmpty, "keyColumns must be non-empty")

  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, keyColumns ++ Seq(typeColumn, tsColumn))
    val stepCols = steps.map(s => s"t_$s")
    stepCols.foreach { c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input must not carry `$c` (an output column)")
    }
    val w = Window.partitionBy(keyColumns.map(col): _*)
    // chain of conditional mins: each references the previous step's
    // windowed time — same partitioning, so EnsureRequirements inserts
    // ONE exchange for the whole stack
    val chained = steps.zip(stepCols).zipWithIndex
      .foldLeft(df) { case (acc, ((step, c), i)) =>
        val cond =
          if (i == 0) col(typeColumn) === step
          else col(typeColumn) === step &&
            col(tsColumn) >= col(stepCols(i - 1))
        acc.withColumn(c, min(when(cond, col(tsColumn))).over(w))
      }
    // the step times are per-key constants: collapse to one row per key
    // (map-side-partial agg; max of a constant is the constant)
    val agged = chained.groupBy(keyColumns.map(col): _*)
      .agg(max(col(stepCols.head)).as(stepCols.head),
        stepCols.tail.map(c => max(col(c)).as(c)): _*)
    // forward fold so the HIGHEST completed step is the outermost
    // branch: when(t_stepN, N).otherwise(when(t_step(N-1), N-1)...)
    val completed = stepCols.zipWithIndex
      .foldLeft(lit(0L): Column) { case (acc, (c, i)) =>
        when(col(c).isNotNull, lit((i + 1).toLong)).otherwise(acc)
      }
    agged.withColumn("steps_completed", completed)
  }
}

/** Aggregate funnel conversion report (round-9 verdict #4): one row
  * per funnel step with the number of keys reaching it and the
  * conversion rate from the previous step (step 1 converts from the
  * universe of keys that produced any event). The classic funnel
  * dashboard table, derived from [[Funnel]]'s per-key output.
  *
  * Scale shape: [[Funnel]]'s ONE keyed shuffle, then a single global
  * aggregation (map-side partial, one row) — `steps_completed >= i`
  * counts every step in the same pass — and a plan-time `explode`
  * that pivots the 1-row aggregate into the per-step rows. No second
  * keyed shuffle, no join, nothing driver-side.
  *
  * `conversion` is `round(n_reached / n_prev, 6)`, null when the
  * previous step (or the universe) is empty — never a division by
  * zero under ANSI.
  */
final case class FunnelReport(steps: Seq[String],
                              typeColumn: String = "event_type",
                              tsColumn: String = "ts",
                              keyColumns: Seq[String] = Seq("user_id"))
    extends Wrangler {
  override def preservesSampleSize: Boolean = false

  def transform(df: DataFrame): DataFrame = {
    val perKey = Funnel(steps, typeColumn, tsColumn, keyColumns)
      .transform(df)
    // n_0 = every key with any event; n_i = keys whose completed
    // prefix reaches step i — all counted in ONE aggregate row
    // coalesce: sum() over an EMPTY per-key frame is null, but the
    // report's contract (and the DuckDB oracle's COUNT) is 0 reached
    val aggs = count(lit(1)).as("n_0") +: steps.indices.map { i =>
      coalesce(sum(when(col("steps_completed") >= (i + 1).toLong, 1L)
        .otherwise(0L)), lit(0L)).as(s"n_${i + 1}")
    }
    val one = perKey.agg(aggs.head, aggs.tail: _*)
    val stepRows = steps.indices.map { i =>
      struct(lit((i + 1).toLong).as("step_index"),
        lit(steps(i)).as("step"),
        col(s"n_${i + 1}").as("n_reached"),
        col(s"n_$i").as("n_prev"))
    }
    one.select(explode(array(stepRows: _*)).as("r"))
      .select(col("r.step_index").as("step_index"),
        col("r.step").as("step"),
        col("r.n_reached").as("n_reached"),
        when(col("r.n_prev") > 0L,
          round(col("r.n_reached").cast("double") /
            col("r.n_prev").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("conversion"))
  }
}
