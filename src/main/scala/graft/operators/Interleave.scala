package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Deterministic training-order shuffle: assigns every row a
  * reproducible pseudo-random global position (`global_pos`, 0-based,
  * ordered by the md5 shuffle key) and round-robin interleaves the
  * permutation across `numShards` output shards (`shard`,
  * `pos_in_shard`) — the "shuffle the corpus before training, then
  * write N shard files whose concatenation-by-position replays the
  * permutation" step every large-scale training pipeline needs.
  * Reading shard s in `pos_in_shard` order visits positions
  * s, s+N, s+2N, ...: each shard is itself an unbiased sample of the
  * corpus in permutation order, so data-parallel readers get both
  * determinism and mixing without any coordination.
  *
  * Scale shape — exact distributed prefix sum, never a global sort in
  * one task: only (id, shuffle_key) pairs enter the machinery; rows
  * range-bucket by the key's leading 16 bits (uniform by construction —
  * md5 makes hot input keys impossible), per-bucket counts aggregate
  * map-side, exclusive bucket offsets come from a window over at most
  * `hashBuckets` rows, and in-bucket ranks come from one rank window
  * per bucket ordered by (shuffle_key, id) — the same order-preserving
  * hash-range-bucket algebra as [[Corpus.MixBudget]] / `ShardPack`, so
  * the global order (bucket, key, id) IS the lexicographic
  * (shuffle_key, id) order. The full row joins back by id at the end
  * (AQE-splittable equi-join): document text never rides the rank
  * shuffle. Beyond-reference surface; framework contract per
  * src/pywrangler/base.py:12-131.
  */
final case class InterleaveShuffle(numShards: Int = 8,
                                   idColumn: String = "doc_id",
                                   hashBuckets: Int = 256,
                                   salt: String = "graft")
    extends Wrangler {
  require(numShards >= 1, "numShards must be >= 1")
  require(hashBuckets >= 1 && hashBuckets <= 65536,
    "hashBuckets must be in [1, 65536]")
  override def preservesSampleSize: Boolean = true

  private val outCols = Seq("shuffle_key", "global_pos", "shard",
    "pos_in_shard")

  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, Seq(idColumn))
    require(!outCols.exists(_.equalsIgnoreCase(idColumn)),
      s"`$idColumn` collides with an output column")
    // fail-loudly: a null / non-long-castable id would silently drop the
    // row at the join-back (null keys never match)
    val keyed = df.select(
        when(col(idColumn).isNull || col(idColumn).cast("long").isNull,
          raise_error(lit(s"InterleaveShuffle: `$idColumn` must be " +
            "non-null and castable to long")).cast("long"))
          .otherwise(col(idColumn).cast("long")).as("__k"))
      .withColumn("shuffle_key", Sampling.bucketHex(salt, col("__k")))
      // leading 4 hex chars = uniform 16-bit int, scaled into
      // [0, hashBuckets) by DIVISION — monotone, so bucket order agrees
      // with lexicographic shuffle_key order (a mod would interleave
      // buckets and break the global prefix sum)
      .withColumn("__rb",
        (conv(substring(col("shuffle_key"), 1, 4), 16, 10).cast("long") *
          hashBuckets / 65536L).cast("long"))
    // phase 1: per-bucket counts (map-side partial) -> exclusive offsets
    // via a window over at most `hashBuckets` rows (single tiny task)
    val offsets = keyed.groupBy("__rb")
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(Window.orderBy("__rb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__rb", "__off")
    // phase 2: in-bucket rank + bucket offset = exact global position
    val pos = keyed.join(broadcast(offsets), Seq("__rb"))
      .withColumn("global_pos", col("__off") +
        row_number().over(Window.partitionBy("__rb")
          .orderBy(col("shuffle_key"), col("__k"))).cast("long") - 1L)
      .withColumn("shard", pmod(col("global_pos"), lit(numShards.toLong)))
      // integral `div`, not `/`: float division would lose exactness
      // past 2^53 positions
      .withColumn("pos_in_shard",
        expr(s"global_pos div ${numShards}L"))
      .select(col("__k"), col("shuffle_key"), col("global_pos"),
        col("shard"), col("pos_in_shard"))
    // re-attach the full row by id; output columns overwrite any
    // same-named input columns (round-8 convention)
    df.drop(outCols: _*)
      .join(pos.withColumnRenamed("__k", "__join_k"),
        col(idColumn).cast("long") === col("__join_k"))
      .drop("__join_k")
  }
}
