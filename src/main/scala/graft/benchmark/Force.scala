package graft.benchmark

import org.apache.spark.sql.DataFrame

/** Honest benchmark forcing.
  *
  * A bare `count()` does NOT measure a row-preserving transformation:
  * Catalyst prunes every column the action never references, so windows,
  * regexes and projections vanish and the timed job degenerates to a
  * zero-column parquet-footer scan (`FileScan parquet []`). The
  * reference's own count-forcing has the same flaw
  * (reference: src/pywrangler/pyspark/benchmark.py:21-35) — parity is no
  * defense for a number published as a regression gate.
  *
  * The `noop` DataSource-V2 sink consumes EVERY output row and column
  * with no serialization or I/O on the write side, so the timed plan is
  * the operator's real plan: windows, joins, regexes, sorts and all.
  */
object Force {

  /** Execute `df`'s full plan (all rows, all columns) and discard the
    * output.
    */
  def apply(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** The physical plan the forced execution runs (minus the trailing
    * no-op append): used by plan self-checks that keep vacuous
    * measurement from ever silently returning.
    */
  def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
}
