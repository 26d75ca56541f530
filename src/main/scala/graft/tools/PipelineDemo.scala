package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, TextAnalysis}
import graft.pipeline.{Pipeline, Stage}

/** Library-surface demo: compose text wranglers into a Pipeline over the
  * documents table, profile per-stage, print the describe() summary.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val pipe = Pipeline(
      Stage(TextAnalysis.TokenCount()),
      Stage(TextAnalysis.QualityScore()),
      Stage(TextAnalysis.Fingerprint()),
      Stage(Dedup.ExactDedup()),
      Stage.of("keep_canonical")(_.filter(!org.apache.spark.sql.functions
        .col("is_dup"))))
    pipe.cache("Fingerprint")

    println(pipe.describe(docs))
    println(s"[demo] final rows: ${pipe.transform(docs).count()}")
    println(s"[demo] fingerprint stage cols: ${pipe("Fingerprint").columns.mkString(",")}")
    spark.stop()
  }
}
