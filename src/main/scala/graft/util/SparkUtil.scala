package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Utility helpers shared by pyspark-style wranglers
  * (reference: src/pywrangler/pyspark/util.py:38-102).
  */
object SparkUtil {

  /** Check that all `columns` exist in `df` (case-insensitive, matching
    * Spark's default resolver; reference: pyspark/util.py:38-57).
    */
  def validateColumns(df: DataFrame, columns: Seq[String]): Unit = {
    val existing = df.columns.map(_.toLowerCase).toSet
    columns.foreach { c =>
      if (!existing.contains(c.toLowerCase))
        throw new IllegalArgumentException(
          s"Column with name `$c` does not exist. Please check parameter settings.")
    }
  }

  /** The data type of `column`, resolved CASE-INSENSITIVELY like Spark's
    * own column resolution (and like [[validateColumns]]) — `df.schema(c)`
    * is case-sensitive and would crash on a differently-cased name that
    * `col(c)` resolves fine.
    */
  def fieldType(df: DataFrame, column: String)
      : org.apache.spark.sql.types.DataType =
    df.schema.fields.find(_.name.equalsIgnoreCase(column))
      .getOrElse(throw new IllegalArgumentException(
        s"Column with name `$column` does not exist. Please check " +
          "parameter settings."))
      .dataType

  /** Build sort-order Column list from names + per-column ascending flags.
    * `reverse = true` flips every direction (used by the last-start/last-end
    * fast path; reference: pyspark/util.py:60-102).
    */
  def prepareOrderby(orderbyColumns: Seq[String],
                     ascending: Seq[Boolean],
                     reverse: Boolean = false): Seq[Column] = {
    val asc =
      if (ascending.isEmpty) Seq.fill(orderbyColumns.size)(true) else ascending
    require(asc.size == orderbyColumns.size,
      "`orderby_columns` and `ascending` must have equal number of items.")
    orderbyColumns.zip(asc).map { case (name, a) =>
      if (a != reverse) col(name).asc else col(name).desc
    }
  }
}

/** Caching mode for [[ColumnCacher]]. */
sealed trait CacheMode
object CacheMode {
  /** Materialize intermediates as real columns, drop them at finish. */
  case object Enabled extends CacheMode
  /** Keep pure column expressions (no intermediate columns). */
  case object Disabled extends CacheMode
  /** Materialize intermediates and KEEP them in the result (debugging). */
  case object Debug extends CacheMode
}

/** Materializes intermediate Column expressions as real dataframe columns.
  *
  * Two reasons to do this: (a) window specs that partition by a computed
  * value need an actual column to reference; (b) very deep stacked window
  * expression trees stress the analyzer (see SPARK-30552). Reference:
  * src/pywrangler/pyspark/util.py:105-204.
  */
final class ColumnCacher(initial: DataFrame, val mode: CacheMode) {
  var df: DataFrame = initial
  /** logical name -> generated unique physical column name */
  val columns = scala.collection.mutable.LinkedHashMap.empty[String, String]

  /** Add `column` under a fresh unique name derived from `name`; returns a
    * reference to the materialized column. With mode Disabled and
    * `force = false` the expression is returned untouched.
    */
  def add(name: String, column: Column, force: Boolean = false): Column = {
    if (mode == CacheMode.Disabled && !force) return column
    var colName = s"${name}_${columns.size}"
    while (df.columns.contains(colName)) colName += "_"
    columns(name) = colName
    df = df.withColumn(colName, column)
    col(colName)
  }

  /** Attach the final result column and drop intermediates (unless Debug). */
  def finish(name: String, column: Column): DataFrame = {
    df = df.withColumn(name, column)
    if (mode != CacheMode.Debug) df = df.drop(columns.values.toSeq: _*)
    df
  }
}
