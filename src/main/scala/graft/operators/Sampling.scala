package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Deterministic hash-based sampling — the training-mix primitive
  * ("keep 50% of English, 10% of everything else") that must be
  * reproducible across reruns, engines and cluster sizes, which rules
  * out `DataFrame.sample` (RNG seeded per partition => resample on any
  * repartition).
  *
  * A row is kept iff the first 8 hex chars of `md5(salt:key)` compare
  * below the stratum's threshold. Fixed-width lowercase hex compares
  * lexicographically == numerically, md5 is identical in every engine,
  * and the decision depends only on (salt, key), so samples are stable,
  * per-row independent, and nested: `rate=0.1` is a subset of
  * `rate=0.5` under the same salt. Pure map-side codegen filter — zero
  * shuffles, pushes past the scan at any scale.
  */
object Sampling {

  /** 32-bit hex threshold for a rate in [0, 1]: keep iff bucket < this.
    * "g" sorts above every hex digit, so rate >= 1 keeps all rows.
    */
  private[graft] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0, s"rate must be >= 0, got $rate")
    if (rate >= 1.0) "g"
    else f"${(rate * 4294967296L).toLong}%08x"
  }

  /** The uniform-[0,1) hex bucket for a key column. */
  private[graft] def bucketHex(salt: String, key: Column): Column =
    substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8)

  /** Per-stratum deterministic sampler: `rates` maps stratum values of
    * `strataColumn` to keep-rates; unlisted strata use `defaultRate`.
    * Appends the audit column `sample_bucket` (the hex bucket that made
    * the decision) and keeps matching rows.
    */
  final case class StratifiedSample(
      rates: Map[String, Double],
      strataColumn: String = "lang",
      keyColumn: String = "doc_id",
      defaultRate: Double = 0.0,
      salt: String = "graft") extends Wrangler {
    override def preservesSampleSize: Boolean = false

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(strataColumn, keyColumn))
      val threshold = rates.foldLeft(lit(thresholdHex(defaultRate))) {
        case (acc, (stratum, rate)) =>
          when(col(strataColumn) === stratum, lit(thresholdHex(rate)))
            .otherwise(acc)
      }
      df.withColumn("sample_bucket", bucketHex(salt, col(keyColumn)))
        .filter(col("sample_bucket") < threshold)
    }
  }
}
