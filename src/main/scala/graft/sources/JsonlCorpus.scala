package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Ingest side of the JSONL story ([[ShardedSink.writeJsonl]] is the
  * export side): read newline-delimited JSON — the format web corpora
  * actually arrive in — with an EXPLICIT caller schema and fail-loud
  * semantics.
  *
  * Why no schema inference: `spark.read.json` without a schema runs a
  * full extra pass over the data to infer one (a second 100 TB scan),
  * and the inferred types drift with the sample (a numeric id column
  * becomes a string the day one record quotes it) — silent schema
  * drift is exactly the class of bug the oracle gate exists to catch.
  * The schema is part of the ingest CONTRACT, so it is a required
  * argument.
  *
  * Modes:
  *   - `failFast = true` (default): any malformed record aborts the
  *     read — the fail-loud house default; a corrupt shard should stop
  *     the ingest, not silently shrink it.
  *   - `failFast = false`: PERMISSIVE with the corrupt record captured
  *     in `_corrupt_json` — the quarantine path; the caller filters
  *     and routes the rejects (malformed rows have every schema column
  *     null and `_corrupt_json` non-null).
  *
  * Scale notes: gzip is NOT splittable — one task per .gz file, so
  * shard-sized files (the [[ShardedSink]] layout) are the unit of
  * parallelism; zstd/bzip2 or uncompressed splits normally. Column
  * pruning still applies (Spark's JSON reader parses only requested
  * fields); predicate pushdown does not — filter-heavy pipelines
  * should convert to parquet/bucketed tables after ingest
  * ([[BucketedTable]]).
  */
object JsonlCorpus {

  val CorruptColumn = "_corrupt_json"

  def read(spark: SparkSession, path: String, schema: StructType,
           failFast: Boolean = true): DataFrame = {
    require(schema.fields.nonEmpty, "schema must have at least one field")
    require(!schema.fieldNames.contains(CorruptColumn),
      s"`$CorruptColumn` is reserved for the quarantine column")
    if (failFast)
      spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    else
      spark.read
        .schema(schema.add(CorruptColumn, "string"))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptColumn)
        .json(path)
  }

  /** The quarantine split of a PERMISSIVE read: (clean rows without the
    * corrupt column, reject rows — schema columns null, the raw line in
    * `_corrupt_json`). The rejects keep the full row shape: Spark
    * refuses a scan whose only referenced column is the internal
    * corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    * RECORD_COLUMN), so projecting the raw line alone must happen after
    * a materialization the CALLER controls, not silently in here. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    require(df.columns.contains(CorruptColumn),
      s"`$CorruptColumn` not present — read with failFast = false")
    (df.filter(col(CorruptColumn).isNull).drop(CorruptColumn),
      df.filter(col(CorruptColumn).isNotNull))
  }
}
