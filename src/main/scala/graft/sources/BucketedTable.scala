package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table source/sink helpers: the co-located-join primitive.
  *
  * At ~100 TB the dominant cost of a fact-to-fact equi-join is shuffling
  * both sides on the join key. Writing each table ONCE bucketed (and
  * per-bucket sorted) on that key moves the shuffle to write time and
  * amortizes it over every downstream join and aggregation: Spark's scan
  * reports `HashClusteredDistribution` over the bucket key, so
  * EnsureRequirements inserts NO Exchange for joins between tables with
  * the same bucket count, nor for `groupBy(bucketKey)` aggregations
  * (pinned by BucketedJoinSpec).
  *
  * Bucketing rules of thumb encoded here:
  *   - both join sides must use the SAME bucket count (Spark does not
  *     coalesce mismatched bucket counts without
  *     `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
  *   - size buckets so one bucket's rows fit one task's memory at the
  *     target scale (buckets ~= table bytes / 128 MB is a sane start);
  *   - `sortBy` the join key too: per-bucket sorted files let the
  *     sort-merge join skip its sort when each bucket holds one file.
  */
object BucketedTable {

  /** Table names reach `spark.sql` interpolated (the DROP path), so they
    * are validated against a plain identifier pattern up front — a name
    * like `t; DROP TABLE x` must fail as a bad identifier, never parse
    * as SQL (round-5 ADVICE).
    */
  private def validateName(table: String): Unit =
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?"),
      s"table name `$table` is not a plain [db.]identifier")

  /** Write `df` as a bucketed, per-bucket-sorted table in the session
    * catalog (parquet files under `spark.sql.warehouse.dir`).
    */
  def write(df: DataFrame, table: String, bucketColumn: String,
            buckets: Int, sortColumns: Seq[String] = Nil,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    writeMulti(df, table, Seq(bucketColumn), buckets, sortColumns, mode)

  /** Compound-key variant: bucket (and by default sort) on MULTIPLE
    * columns. A join on exactly those columns in the same order plans
    * with no Exchange on the bucketed side — the shape the incremental
    * near-dup band index (`(band, key)` buckets) relies on: a batch
    * probe shuffles only the batch, never the corpus-sized index.
    */
  def writeMulti(df: DataFrame, table: String, bucketColumns: Seq[String],
                 buckets: Int, sortColumns: Seq[String] = Nil,
                 mode: SaveMode = SaveMode.Overwrite): Unit = {
    validateName(table)
    require(buckets > 0, "`buckets` must be positive")
    require(bucketColumns.nonEmpty, "need at least one bucket column")
    bucketColumns.foreach(c =>
      require(df.columns.exists(_.equalsIgnoreCase(c)),
        s"bucket column `$c` not in ${df.columns.mkString(", ")}"))
    val sorts = if (sortColumns.isEmpty) bucketColumns else sortColumns
    df.write.mode(mode)
      .bucketBy(buckets, bucketColumns.head, bucketColumns.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Read a catalog table (bucket metadata rides along from the catalog,
    * which is what lets the planner drop the Exchange).
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    validateName(table)
    spark.table(table)
  }

  def drop(spark: SparkSession, table: String): Unit = {
    validateName(table)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
