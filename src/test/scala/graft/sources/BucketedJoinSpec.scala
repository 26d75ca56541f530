package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the co-located-join contract of [[BucketedTable]]: equal-bucket
  * tables join and aggregate on the bucket key with NO Exchange in the
  * physical plan — the write-time shuffle is amortized over every
  * downstream join/agg, the core scale lever for repeated fact-to-fact
  * joins at 100 TB.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def withTables[A](f: => A): A =
    try f finally Seq("bj_docs", "bj_scores", "bj_docs16", "bj_bands")
      .foreach(BucketedTable.drop(spark, _))

  /** Disable broadcast so a missing Exchange can only mean bucketing
    * worked, not that the small side broadcast.
    */
  private def noBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-bucket-count join and bucket-key agg plan with NO Exchange") {
    withTables {
      noBroadcast {
        val docs = (0L until 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
        val scores = (0L until 500L).map(i => (i, i % 7)).toDF("doc_id", "score")
        BucketedTable.write(docs, "bj_docs", "doc_id", 8)
        BucketedTable.write(scores, "bj_scores", "doc_id", 8)

        val joined = BucketedTable.read(spark, "bj_docs")
          .join(BucketedTable.read(spark, "bj_scores"), "doc_id")
        val jPlan = joined.queryExecution.executedPlan.toString
        assert(!jPlan.contains("Exchange"), jPlan)
        assert(joined.count() == 500)

        val agg = BucketedTable.read(spark, "bj_docs")
          .groupBy("doc_id").agg(count(lit(1)).as("c"))
        val aPlan = agg.queryExecution.executedPlan.toString
        assert(!aPlan.contains("Exchange"), aPlan)

        // control: the same join from plain (unbucketed) frames DOES
        // shuffle — proves the assertion above is not vacuous
        val plain = docs.join(scores, "doc_id")
          .queryExecution.executedPlan.toString
        assert(plain.contains("Exchange"), plain)
      }
    }
  }

  test("compound-bucketed band index probes with NO index-side Exchange") {
    withTables {
      noBroadcast {
        // the real incremental near-dup index schema through writeMulti:
        // (band int, key string, doc_id long), bucketed by (band, key)
        val corpus = (0L until 120L)
          .map(i => (i, s"corpus document number $i with shared body text"))
          .toDF("doc_id", "text")
        val idx = graft.operators.Dedup.IncrementalMinHashLSH.bandIndex(
          graft.operators.Dedup.IncrementalMinHashLSH.signatureIndex(corpus))
        BucketedTable.writeMulti(idx, "bj_bands", Seq("band", "key"), 8)

        // batch bands computed by the real pipeline, then re-materialized
        // as a local frame so the probe plan's Exchange count isolates
        // the JOIN's shuffles (the signature pipeline has its own)
        val batchRows = graft.operators.Dedup.IncrementalMinHashLSH.bandIndex(
          (120L until 140L)
            .map(i => (i, s"corpus document number ${i - 120L} with shared body text"))
            .toDF("doc_id", "text")
            .transform(d => graft.operators.Dedup.IncrementalMinHashLSH
              .signatureIndex(d)))
          .select(col("band"), col("key"), col("doc_id").as("id_b"))
          .collect().toSeq
          .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        val batch = batchRows.toDF("band", "key", "id_b")

        // the candCorpus probe join from IncrementalMinHashLSH.transform:
        // exactly ONE Exchange — the batch side; the corpus-sized index
        // scan is consumed in place (its write-time shuffle amortized
        // over every ingest batch)
        def countExchanges(plan: String): Int =
          "Exchange".r.findAllMatchIn(plan).size
        val probe = BucketedTable.read(spark, "bj_bands")
          .select(col("band"), col("key"), col("doc_id").as("id_a"))
          .join(batch, Seq("band", "key"))
        val pPlan = probe.queryExecution.executedPlan.toString
        assert(countExchanges(pPlan) == 1, pPlan)
        assert(probe.count() > 0)

        // control: the same probe against a plain parquet copy of the
        // index shuffles BOTH sides — the assertion above is not vacuous
        val plainDir = java.nio.file.Files
          .createTempDirectory("bj_plain").toString
        try {
          idx.write.mode("overwrite").parquet(plainDir)
          val plain = spark.read.parquet(plainDir)
            .select(col("band"), col("key"), col("doc_id").as("id_a"))
            .join(batch, Seq("band", "key"))
            .queryExecution.executedPlan.toString
          assert(countExchanges(plain) == 2, plain)
        } finally {
          org.apache.commons.io.FileUtils
            .deleteDirectory(new java.io.File(plainDir))
        }
      }
    }
  }

  test("mismatched bucket counts fall back to a shuffle (documented rule)") {
    withTables {
      noBroadcast {
        val docs = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        BucketedTable.write(docs, "bj_docs", "doc_id", 8)
        BucketedTable.write(docs, "bj_docs16", "doc_id", 16)
        val joined = BucketedTable.read(spark, "bj_docs")
          .join(BucketedTable.read(spark, "bj_docs16"), "doc_id")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("Exchange"), plan)
        assert(joined.count() == 100)
      }
    }
  }

  test("write validates bucket column and count") {
    val d = Seq((1L, "a")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](
      BucketedTable.write(d, "bj_bad", "nope", 4))
    assertThrows[IllegalArgumentException](
      BucketedTable.write(d, "bj_bad", "doc_id", 0))
  }
}
