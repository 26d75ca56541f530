package graft.core

import org.apache.spark.sql.DataFrame

/** Base abstraction for all data wranglers: a named, parameterized
  * dataframe-in / dataframe-out transformer with an (optional) fit step.
  *
  * Mirrors the sklearn-style fit/transform contract of the reference
  * framework (reference: src/pywrangler/base.py:12-131) re-expressed as a
  * plain Scala trait. Parameter introspection is provided by implementing
  * wranglers as case classes (`productElementNames` replaces the
  * `get_params` __init__ introspection of base.py:56-103).
  */
trait Wrangler extends Serializable {

  /** True if the transformation keeps the number of rows unchanged. */
  def preservesSampleSize: Boolean = false

  /** Fit step. Stateless wranglers return `this` unchanged
    * (reference: src/pywrangler/pyspark/base.py:20-53 `PySparkSingleNoFit`).
    */
  def fit(df: DataFrame): this.type = this

  /** Apply the transformation, returning a new DataFrame (lazy plan). */
  def transform(df: DataFrame): DataFrame

  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)
}
