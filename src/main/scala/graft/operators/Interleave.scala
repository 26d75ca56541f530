package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Deterministic global-permutation machinery shared by
  * [[InterleaveShuffle]] (uniform shuffle) and [[CurriculumOrder]]
  * (phase-major curriculum ordering): assigns every row an exact,
  * reproducible 0-based `global_pos` under the lexicographic order
  * `(phase, shuffle_key, id)` without ever sorting the corpus in one
  * task, then round-robin interleaves the permutation across
  * `numShards` output shards.
  *
  * Scale shape — exact distributed prefix sum, never a global sort in
  * one task: only (id, phase, shuffle_key) triples enter the machinery;
  * rows range-bucket by the shuffle key's leading 16 bits (uniform by
  * construction — md5 makes hot input keys impossible), per-(phase,
  * bucket) counts aggregate map-side, exclusive offsets come from a
  * window over at most `phases x hashBuckets` rows, and in-bucket ranks
  * come from one rank window per (phase, bucket) ordered by
  * (shuffle_key, id). The full row joins back by id at the end
  * (AQE-splittable equi-join): document text never rides the rank
  * shuffle. Beyond-reference surface; framework contract per
  * src/pywrangler/base.py:12-131.
  */
private[operators] object Interleave {
  private[operators] val outCols = Seq("shuffle_key", "global_pos",
    "shard", "pos_in_shard")

  /** The shared permutation core. `phase` is the major sort key (a
    * non-null long expression over the input row; `lit(0L)` for the
    * pure shuffle). The offsets window runs over at most
    * `maxPhases x hashBuckets` rows; `maxPhases` is enforced in-plan by
    * a one-row broadcast aggregate (same discipline as
    * `Dedup.selectCanonical`'s size guard) because a high-cardinality
    * phase would silently turn that window's single task into a
    * corpus-sized sort.
    */
  private[operators] def permute(df: DataFrame, idColumn: String,
      phase: Column, phased: Boolean, numShards: Int, hashBuckets: Int,
      salt: String, maxPhases: Long, opName: String): DataFrame = {
    SparkUtil.validateColumns(df, Seq(idColumn))
    val out = if (phased) "phase" +: outCols else outCols
    require(!out.exists(_.equalsIgnoreCase(idColumn)),
      s"`$idColumn` collides with an output column")
    // fail-loudly: a null / non-long-castable id would silently drop the
    // row at the join-back (null keys never match); a null phase would
    // sort FIRST in the offset window and silently shift every position
    val keyed = df.select(
        when(col(idColumn).isNull || col(idColumn).cast("long").isNull,
          raise_error(lit(s"$opName: `$idColumn` must be " +
            "non-null and castable to long")).cast("long"))
          .otherwise(col(idColumn).cast("long")).as("__k"),
        when(phase.isNull,
          raise_error(lit(s"$opName: the phase expression must be " +
            "non-null")).cast("long"))
          .otherwise(phase.cast("long")).as("__ph"))
      .withColumn("shuffle_key", Sampling.bucketHex(salt, col("__k")))
      // leading 4 hex chars = uniform 16-bit int, scaled into
      // [0, hashBuckets) by DIVISION — monotone, so bucket order agrees
      // with lexicographic shuffle_key order (a mod would interleave
      // buckets and break the global prefix sum)
      .withColumn("__rb",
        (conv(substring(col("shuffle_key"), 1, 4), 16, 10).cast("long") *
          hashBuckets / 65536L).cast("long"))
    // phase 1: per-(phase, bucket) counts (map-side partial) ->
    // exclusive offsets via a window over at most phases x hashBuckets
    // rows (single tiny task, guarded below)
    val counts = keyed.groupBy("__ph", "__rb")
      .agg(count(lit(1)).as("__c"))
    val guarded =
      if (!phased) counts
      else {
        val nPhases = counts.select("__ph").distinct()
          .agg(count(lit(1)).as("__np"))
        counts.crossJoin(broadcast(nPhases))
          .withColumn("__ph",
            when(col("__np") > maxPhases,
              raise_error(concat(
                lit(s"$opName: "), col("__np"),
                lit(s" distinct phases (> maxPhases=$maxPhases) — the " +
                  "offset window would sort phases x hashBuckets rows " +
                  "in one task; bucket the phase expression coarser or " +
                  "raise maxPhases explicitly"))).cast("long"))
              .otherwise(col("__ph")))
          .select("__ph", "__rb", "__c")
      }
    val offsets = guarded
      .withColumn("__off", coalesce(
        sum("__c").over(Window.orderBy("__ph", "__rb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__ph", "__rb", "__off")
    // phase 2: in-bucket rank + bucket offset = exact global position
    val pos = keyed.join(broadcast(offsets), Seq("__ph", "__rb"))
      .withColumn("global_pos", col("__off") +
        row_number().over(Window.partitionBy("__ph", "__rb")
          .orderBy(col("shuffle_key"), col("__k"))).cast("long") - 1L)
      .withColumn("shard", pmod(col("global_pos"), lit(numShards.toLong)))
      // integral `div`, not `/`: float division would lose exactness
      // past 2^53 positions
      .withColumn("pos_in_shard",
        expr(s"global_pos div ${numShards}L"))
      .select(col("__k"), col("__ph").as("phase"), col("shuffle_key"),
        col("global_pos"), col("shard"), col("pos_in_shard"))
    // re-attach the full row by id; output columns overwrite any
    // same-named input columns (round-8 convention)
    val narrow = if (phased) pos else pos.drop("phase")
    df.drop(out: _*)
      .join(narrow.withColumnRenamed("__k", "__join_k"),
        col(idColumn).cast("long") === col("__join_k"))
      .drop("__join_k")
  }
}

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
  * Scale shape: see [[Interleave]] (this is the single-phase
  * specialization of the shared exact-prefix-sum permutation core).
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

  def transform(df: DataFrame): DataFrame =
    Interleave.permute(df, idColumn, lit(0L), phased = false, numShards,
      hashBuckets, salt, maxPhases = 1L, opName = "InterleaveShuffle")
}

/** Curriculum training order: a deterministic global order that visits
  * phases (difficulty bands — sequence-length buckets, quality deciles,
  * noise tiers) in ascending `phaseColumn` order, uniformly shuffled
  * WITHIN each phase — the "short-to-long length curriculum" /
  * "clean-to-noisy quality curriculum" schedule of LLM pretraining, as
  * one exact reproducible permutation (`global_pos`) interleaved across
  * `numShards` shards exactly like [[InterleaveShuffle]].
  *
  * `phaseColumn` must be a non-null long-castable column (fail-loud);
  * its cardinality is capped by `maxPhases` (a curriculum has a handful
  * of bands — a high-cardinality phase would degrade the offset window;
  * the cap is enforced in-plan by a one-row broadcast aggregate, no
  * driver action). Row-preserving: every input column passes through
  * plus `phase`, `shuffle_key`, `global_pos`, `shard`, `pos_in_shard`;
  * same-named input columns are overwritten (round-8 convention).
  *
  * Scale shape: see [[Interleave]] — identical exact-prefix-sum algebra
  * with `(phase, shuffle_key, id)` as the global order, so the
  * permutation needs ONE narrow keyed shuffle regardless of corpus
  * size, and a phase's rows are never concentrated into one task (each
  * phase still spreads over `hashBuckets` rank windows).
  */
final case class CurriculumOrder(phaseColumn: String,
                                 numShards: Int = 8,
                                 idColumn: String = "doc_id",
                                 hashBuckets: Int = 256,
                                 salt: String = "graft",
                                 maxPhases: Long = 4096L)
    extends Wrangler {
  require(numShards >= 1, "numShards must be >= 1")
  require(hashBuckets >= 1 && hashBuckets <= 65536,
    "hashBuckets must be in [1, 65536]")
  require(maxPhases >= 1, "maxPhases must be >= 1")
  override def preservesSampleSize: Boolean = true

  def transform(df: DataFrame): DataFrame = {
    SparkUtil.validateColumns(df, Seq(phaseColumn))
    require(!Seq("shuffle_key", "global_pos", "shard", "pos_in_shard")
        .exists(_.equalsIgnoreCase(phaseColumn)),
      s"`$phaseColumn` collides with an output column")
    Interleave.permute(df, idColumn, col(phaseColumn), phased = true,
      numShards, hashBuckets, salt, maxPhases, opName = "CurriculumOrder")
  }
}
