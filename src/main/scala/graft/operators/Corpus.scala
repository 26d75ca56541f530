package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.functions.Portable._
import graft.util.SparkUtil

/** Corpus-level operators for large-scale training-data curation:
  * benchmark decontamination, vocabulary extraction, exact grouped
  * quantiles and byte-balanced shard packing.
  *
  * All four are oracle-gated (DuckDB recomputes the same result from the
  * same parquet) and shaped for a 1000-executor cluster:
  *   - joins are equi-joins on narrow keys (shingle strings / group
  *     columns), never on document text;
  *   - global top-k is `TakeOrdered` (per-partition heaps + driver merge
  *     of k rows), never a single-partition rank window;
  *   - the only driver-side materializations are bounded by the
  *     partition count or by `k`, never by the corpus.
  */
object Corpus {

  /** Benchmark decontamination: flag training documents that share word
    * n-gram shingles with a held-out evaluation set (the standard
    * train/test-overlap guard for LLM corpora — e.g. the GPT-3 paper's
    * 13-gram overlap filter; here the shingle width is a parameter).
    *
    * `evalDocs` selects the evaluation subset from the input frame; every
    * other row is a training document. Output is one row per TRAINING
    * document: its distinct-shingle count, how many of those shingles
    * occur anywhere in the eval set, the overlap ratio, and the
    * `contaminated` flag (`n_overlap >= minOverlap`).
    *
    * Scale shape: eval shingles are deduplicated to a narrow single
    * column; the contamination join is a shingle equi-join of the
    * training posting stream against that (typically tiny) side — AQE
    * broadcasts it at runtime when it fits, and degrades to a shuffled
    * equi-join (never a cartesian) when an unusually large eval set does
    * not. One aggregation keyed by doc id follows; document text never
    * shuffles.
    */
  final case class Decontaminate(evalDocs: DataFrame => DataFrame,
                                 idColumn: String = "doc_id",
                                 textColumn: String = "text",
                                 n: Int = 3,
                                 minOverlap: Long = 1L)
      extends Wrangler {
    require(n >= 1, "shingle width `n` must be >= 1")
    require(minOverlap >= 1, "`minOverlap` must be >= 1")

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
      val evalSet = evalDocs(df)
      val evalIds = evalSet.select(col(idColumn).cast("long").as("doc_id"))
      val train = df.select(col(idColumn).cast("long").as("doc_id"),
          col(textColumn).as("text"))
        .join(evalIds, Seq("doc_id"), "left_anti")
      // (doc_id, sz, shingle) with shingles already distinct per doc, so
      // the per-doc overlap count below needs no distinct aggregate
      val trainSh = shingleRows(train, "doc_id", "text", n)
      val evalSh = shingleRows(
          evalSet.select(col(idColumn).cast("long").as("doc_id"),
            col(textColumn).as("text")), "doc_id", "text", n)
        .select("shingle").distinct()
        .withColumn("hit", lit(1L))
      val counted = trainSh
        .join(evalSh, Seq("shingle"), "left")
        .groupBy("doc_id")
        .agg(max(col("sz")).as("n_shingles"),
          sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      // short documents produce zero shingles (no trainSh rows): restore
      // them with explicit zero counts so the operator is row-complete
      // over the training set
      train.select("doc_id")
        .join(counted, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
        .withColumn("contamination_ratio",
          when(col("n_shingles") > 0,
            round(col("n_overlap").cast("double") /
              col("n_shingles").cast("double"), 6)).otherwise(0.0))
        .withColumn("contaminated", col("n_overlap") >= minOverlap)
    }
  }

  /** Boilerplate scoring: how much of each document is made of corpus-hot
    * n-gram shingles (shingles whose document frequency exceeds
    * `maxDocFreq` — navigation chrome, license headers, template text).
    * Output per document: distinct-shingle count, hot-shingle count and
    * the boilerplate ratio — the standard drop/keep quality signal next
    * to [[TextAnalysis.QualityScore]].
    *
    * Scale shape: identical to [[Decontaminate]] with the hot set in
    * place of the eval set — a doc-frequency aggregation over the narrow
    * (shingle) projection, then a shingle equi-join of the posting
    * stream against the (small, by definition: df > cap) hot set and one
    * per-doc aggregation. Document text never shuffles.
    */
  final case class BoilerplateScore(idColumn: String = "doc_id",
                                    textColumn: String = "text",
                                    n: Int = 3,
                                    maxDocFreq: Long = 100L)
      extends Wrangler {
    require(n >= 1, "shingle width `n` must be >= 1")
    require(maxDocFreq >= 1, "`maxDocFreq` must be >= 1")

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
      val ids = df.select(col(idColumn).cast("long").as("doc_id"),
        col(textColumn).as("text"))
      val sh = shingleRows(ids, "doc_id", "text", n)
      val hot = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDocFreq)
        .select("shingle").withColumn("hit", lit(1L))
      val counted = sh.join(hot, Seq("shingle"), "left")
        .groupBy("doc_id")
        .agg(max(col("sz")).as("n_shingles"),
          sum(coalesce(col("hit"), lit(0L))).as("n_boiler"))
      ids.select("doc_id")
        .join(counted, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
        .withColumn("boiler_ratio",
          when(col("n_shingles") > 0,
            round(col("n_boiler").cast("double") /
              col("n_shingles").cast("double"), 6)).otherwise(0.0))
    }
  }

  /** Corpus vocabulary: the `k` most frequent whitespace tokens with term
    * and document frequencies, ties broken by token ascending.
    *
    * Scale shape: tokens explode map-side (codegen'd generator); the
    * (token, doc) pre-aggregation is partial map-side before its shuffle;
    * the final top-k is `orderBy(...).limit(k)` which Spark plans as
    * TakeOrdered — per-partition bounded heaps merged on the driver, k
    * rows total — NOT a single-partition rank window over the vocabulary.
    */
  final case class VocabTopK(idColumn: String = "doc_id",
                             textColumn: String = "text",
                             k: Int = 100)
      extends Wrangler {
    require(k >= 1, "`k` must be >= 1")

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
      val toks = df.select(col(idColumn).as("id"),
        explode(tokens(col(textColumn))).as("token"))
      // (token, doc) partial counts make the doc-frequency count a plain
      // count(*) — no count-distinct (its two-phase expansion shuffles
      // the token stream twice at corpus scale)
      val perDoc = toks.groupBy("token", "id").agg(count(lit(1)).as("c"))
      perDoc.groupBy("token")
        .agg(sum(col("c")).as("term_freq"),
          count(lit(1)).as("doc_freq"))
        .orderBy(col("term_freq").desc, col("token").asc)
        .limit(k)
    }
  }

  /** Exact discrete quantiles of a numeric column per group: the value at
    * 1-based rank `ceil(q * count)` of the group's ascending sort — the
    * classic `percentile_disc` definition, computed identically by the
    * DuckDB oracle (no approx-percentile sketches, whose merge order is
    * engine-specific).
    *
    * Scale shape: ONE shuffle — the rank window partitions by the group
    * columns, and the following aggregation groups by the same keys, so
    * EnsureRequirements reuses the window's hashpartitioning. Group
    * cardinality bounds the result, not the input. (A pathological
    * single giant group inherits the usual whole-group-window caveat —
    * see IntervalIdentifierSalted for the chunked escape hatch.)
    */
  final case class QuantileStats(groupColumns: Seq[String],
                                 valueColumn: String,
                                 quantiles: Seq[Double] =
                                   Seq(0.5, 0.9, 0.99))
      extends Wrangler {
    require(groupColumns.nonEmpty,
      "`groupColumns` must be non-empty: a global quantile would sort " +
        "the whole input in one task; group by a constant explicitly " +
        "if that is really wanted")
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
      "`quantiles` must be within (0, 1]")

    /** p50-style column name for a quantile (0.5 -> p50, 0.99 -> p99,
      * 0.999 -> p99_9). Decimal (not binary-double) arithmetic, so
      * 0.99 * 100 can never name itself p99_00000000000001.
      */
    private def quantileName(q: Double): String =
      "p" + (BigDecimal(q.toString) * 100).underlying.stripTrailingZeros
        .toPlainString.replace(".", "_")

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, groupColumns :+ valueColumn)
      val w = Window.partitionBy(groupColumns.map(col): _*)
        .orderBy(col(valueColumn).asc)
      val ranked = df
        .select((groupColumns :+ valueColumn).map(col): _*)
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy(groupColumns.map(col): _*)))
      val qCols = quantiles.map { q =>
        max(when(col("rn") === ceil(lit(q) * col("cnt")),
          col(valueColumn))).as(quantileName(q))
      }
      ranked.groupBy(groupColumns.map(col): _*)
        .agg(count(lit(1)).as("n"), qCols: _*)
    }
  }

  /** Byte-balanced shard packing: assign each row (ordered by a unique
    * key) the shard its cumulative-byte start offset falls in —
    * `shard = floor(bytes_before / targetBytes)` — the standard layout
    * step before writing fixed-size training shards.
    *
    * A naive formulation is a running sum over an UNPARTITIONED window —
    * one task holding the corpus. This one is the exact two-phase
    * distributed prefix sum instead:
    *   1. bucket every row by a PURE FUNCTION of the order key
    *      (`(k - min) / width`, key-range buckets) and aggregate
    *      per-bucket byte totals (a driver collect bounded by the bucket
    *      count, never the row count);
    *   2. broadcast the exclusive per-bucket offsets, shuffle rows by
    *      bucket, sort each partition by key, and stream it once —
    *      resetting the running sum to the bucket's offset at each
    *      bucket boundary (buckets are monotone in the key, so a sort
    *      by key keeps them contiguous even when several buckets hash
    *      into one partition).
    *
    * The bucket MUST be a pure key function, not `repartitionByRange`:
    * phase 1 and phase 2 are separate executions, and RangePartitioner
    * RESAMPLES imbalanced partitions with an RDD-id-derived seed, so two
    * runs of the same plan can place boundary rows differently —
    * per-partition offsets then double-count (caught by
    * `tools.StressCorpus` at 50M rows: 0.05% cumulative drift; invisible
    * at spec scale, where partitions stay under the sample size).
    *
    * The order key must be unique (ties make the running sum
    * order-dependent, same contract as the interval identifier).
    * Key-range buckets balance rows for roughly uniform key spaces (the
    * usual case for ids); a pathologically clustered key space
    * concentrates work in few buckets — pre-map the key (e.g. by rank)
    * if that matters at the call site.
    */
  final case class ShardPack(orderColumn: String = "doc_id",
                             sizeColumn: String = "n_chars",
                             targetBytes: Long = 100000L,
                             partitions: Int = 0)
      extends Wrangler {
    require(targetBytes >= 1, "`targetBytes` must be >= 1")

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(orderColumn, sizeColumn))
      val spark = df.sparkSession
      import spark.implicits._
      val p =
        if (partitions > 0) partitions
        else spark.sessionState.conf.numShufflePartitions
      val base = df
        .select(col(orderColumn).cast("long").as("k"),
          col(sizeColumn).cast("long").as("sz"))
      val bounds = base.agg(min("k"), max("k"), count(lit(1))).head()
      if (bounds.getLong(2) == 0L)
        return spark.emptyDataset[(Long, Long, Long, Long)]
          .toDF(orderColumn, sizeColumn, "cum_bytes", "shard")
      val minK = bounds.getLong(0)
      // width sized so bucket ids span 0 until p
      val width = math.max(1L, (bounds.getLong(1) - minK) / p + 1)
      // `div`, not `/`: Column./ is DOUBLE division (a 2^53+ key would
      // round) — div is exact 64-bit integer division
      val bucketed = base
        .withColumn("b", expr(s"(k - ${minK}L) div ${width}L"))
      val totals = bucketed.groupBy("b").agg(sum("sz").as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val offsets = Array.tabulate(p) { i =>
        (0 until i).map(b => totals.getOrElse(b.toLong, 0L)).sum
      }
      val bc = spark.sparkContext.broadcast(offsets)
      val target = targetBytes
      bucketed
        .repartition(p, col("b"))
        .sortWithinPartitions("k")
        .as[(Long, Long, Long)]
        .mapPartitions { it =>
          var curBucket = -1L
          var cum = 0L
          it.map { case (k, sz, b) =>
            if (b != curBucket) { curBucket = b; cum = bc.value(b.toInt) }
            val before = cum
            cum += sz
            (k, sz, cum, before / target)
          }
        }
        .toDF(orderColumn, sizeColumn, "cum_bytes", "shard")
    }
  }
}
