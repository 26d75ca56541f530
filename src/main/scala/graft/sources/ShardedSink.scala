package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Sink side of [[graft.operators.Corpus.ShardPack]]: write a packed
  * frame as one parquet directory per shard (`shard=N/`), each shard's
  * rows co-located and sorted by the order key.
  *
  * Why not plain `write.partitionBy("shard")`: without a repartition,
  * EVERY task holding rows of a shard opens its own file for it —
  * input-partitions x shards small files, the classic layout killer at
  * 100 TB. Repartitioning by the shard column first co-locates each
  * shard into one task (shards are byte-balanced by construction, so
  * tasks are too — no skew), and `sortWithinPartitions` keeps the
  * within-shard order so downstream sequential readers stream documents
  * in key order from a single file.
  */
object ShardedSink {

  def write(packed: DataFrame, path: String,
            orderColumn: String = "doc_id",
            shardColumn: String = "shard",
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(packed.columns.contains(shardColumn),
      s"`$shardColumn` not in ${packed.columns.mkString(", ")} — run " +
        "Corpus.ShardPack first")
    require(packed.columns.contains(orderColumn),
      s"`$orderColumn` not in ${packed.columns.mkString(", ")}")
    packed
      .repartition(col(shardColumn))
      .sortWithinPartitions(col(shardColumn), col(orderColumn))
      .write.mode(mode)
      .partitionBy(shardColumn)
      .parquet(path)
  }

  /** JSONL export variant: most training-data loaders stream
    * newline-delimited JSON, not parquet — same layout discipline as
    * [[write]] (each shard co-located into ONE key-sorted file, never
    * tasks x shards small files). `compression` defaults to gzip: text
    * JSON is ~5-10x larger than parquet, so at corpus scale the codec
    * is not optional. JSON is schema-on-read (numbers/strings/booleans
    * only) — this is the EXPORT sink; parquet remains the round-trip
    * format.
    */
  def writeJsonl(packed: DataFrame, path: String,
                 orderColumn: String = "doc_id",
                 shardColumn: String = "shard",
                 mode: SaveMode = SaveMode.Overwrite,
                 compression: String = "gzip"): Unit = {
    require(packed.columns.contains(shardColumn),
      s"`$shardColumn` not in ${packed.columns.mkString(", ")} — run " +
        "Corpus.ShardPack first")
    require(packed.columns.contains(orderColumn),
      s"`$orderColumn` not in ${packed.columns.mkString(", ")}")
    packed
      .repartition(col(shardColumn))
      .sortWithinPartitions(col(shardColumn), col(orderColumn))
      .write.mode(mode)
      .option("compression", compression)
      .partitionBy(shardColumn)
      .json(path)
  }
}
