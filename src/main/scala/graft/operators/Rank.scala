package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Exact per-group cumulative rank / percentile normalization — the
  * feature-engineering step that turns a raw score into its position
  * within the group's own distribution ("this doc is longer than 83%
  * of its language"): for every row, `value_rank` = the count of rows
  * in its group with value <= its value (ties share the rank — the
  * cume-dist convention, deterministic without a tiebreak column), and
  * `pct_rank` = `round(value_rank / group_count, 6)`.
  *
  * Scale shape — the [[Corpus.QuantileStats]] chunked-rank algebra
  * generalized from locating a handful of quantile ranks to ranking
  * EVERY row, still with no whole-group window (the naive
  * `count(*) over (partition by group order by value range unbounded
  * preceding)` sorts each group in ONE task — with low-cardinality
  * groups like `lang` that is the corpus in a handful of tasks):
  *   1. rows bucket by a monotone equal-width function of the value
  *      (global min/max broadcast as a 1-row aggregate — fully lazy);
  *   2. per-(group, bucket) counts aggregate map-side; exclusive
  *      bucket offsets and group totals come from windows over at most
  *      `valueBuckets` rows per group;
  *   3. the in-bucket cumulative count runs per (group, bucket) with a
  *      RANGE frame (ties share), tasks bounded by the bucket width;
  *      identical values always share a bucket, so no tie can span a
  *      bucket border;
  *   4. only the narrow (id, group, value) triple rides the rank
  *      machinery; the full row joins back by id (AQE-splittable).
  *
  * Row-preserving: every input column passes through plus `value_rank`
  * and `pct_rank` (same-named input columns overwritten, round-8
  * convention). `valueColumn` must be non-null numeric-castable
  * (fail-loud, cf. QuantileStats); group cardinality is assumed
  * broadcastable (the per-stratum contract shared by every grouped
  * operator here).
  */
final case class PercentileRank(groupColumns: Seq[String],
                                valueColumn: String,
                                idColumn: String = "doc_id",
                                valueBuckets: Int = 256)
    extends Wrangler {
  require(groupColumns.nonEmpty,
    "`groupColumns` must be non-empty: a global rank would sort the " +
      "whole input in one task; group by a constant explicitly if that " +
      "is really wanted")
  require(valueBuckets >= 1, "`valueBuckets` must be >= 1")
  override def preservesSampleSize: Boolean = true

  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, groupColumns ++ Seq(valueColumn, idColumn))
    val reserved = Set("__vmin", "__vmax", "__w", "__b", "__bc", "__off",
      "__cnt", "__pr_k")
    require(!df.columns.exists(c => reserved(c.toLowerCase)),
      s"input must not carry ${reserved.mkString("/")} columns " +
        "(matching is case-insensitive, like Spark's resolution)")
    val gCols = groupColumns.map(col)
    val narrow = df.select((gCols :+
      when(col(idColumn).isNull || col(idColumn).cast("long").isNull,
        raise_error(lit(s"PercentileRank: `$idColumn` must be non-null " +
          "and castable to long")).cast("long"))
        .otherwise(col(idColumn).cast("long")).as("__pr_k") :+
      col(valueColumn)): _*)
    // global value range as a broadcast 1-row aggregate (cf. TfIdf's N)
    val vb = narrow.agg(min(col(valueColumn)).cast("double").as("__vmin"),
      max(col(valueColumn)).cast("double").as("__vmax"))
    // floor((v - vmin)/w) is monotone non-decreasing in v under IEEE
    // rounding, so within a group bucket order IS value order — the
    // property the offset merge depends on (cf. QuantileStats)
    val bucketed = narrow.crossJoin(broadcast(vb))
      .withColumn("__w",
        (col("__vmax") - col("__vmin")) / lit(valueBuckets.toDouble))
      .withColumn("__b",
        when(col(valueColumn).isNull ||
            col(valueColumn).cast("double").isNull,
          raise_error(concat(
            lit(s"PercentileRank: `$valueColumn` must be non-null and " +
              "numeric-castable; got: "),
            coalesce(col(valueColumn).cast("string"), lit("NULL"))))
            .cast("long"))
        .otherwise(
          when(col("__w") > 0.0,
            least(floor((col(valueColumn).cast("double") - col("__vmin"))
              / col("__w")), lit(valueBuckets - 1L)))
            .otherwise(lit(0L))))
      .drop("__vmin", "__vmax", "__w")
    val offs = bucketed
      .groupBy((gCols :+ col("__b")): _*)
      .agg(count(lit(1)).as("__bc"))
      .withColumn("__off", coalesce(
        sum("__bc").over(Window.partitionBy(gCols: _*).orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__cnt",
        sum("__bc").over(Window.partitionBy(gCols: _*)))
      .select((gCols :+ col("__b") :+ col("__off") :+ col("__cnt")): _*)
    // in-bucket cumulative count with a RANGE frame: ties share the
    // rank; identical values share a bucket, so no tie spans buckets
    val wB = Window.partitionBy((gCols :+ col("__b")): _*)
      .orderBy(col(valueColumn).cast("double"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = bucketed
      .join(broadcast(offs), groupColumns :+ "__b")
      .withColumn("value_rank", col("__off") + count(lit(1)).over(wB))
      .withColumn("pct_rank",
        round(col("value_rank").cast("double") /
          col("__cnt").cast("double"), 6))
      .select(col("__pr_k"), col("value_rank"), col("pct_rank"))
    df.drop("value_rank", "pct_rank")
      .join(ranked, col(idColumn).cast("long") === col("__pr_k"))
      .drop("__pr_k")
  }
}
