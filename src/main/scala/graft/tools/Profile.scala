package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Portable._
import org.apache.spark.sql.{functions => F}

/** Scratch profiling main for operator-stage timings. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  ($n rows)")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    val sh = docs.select(col("doc_id").as("id"),
        shingles(tokens(col("text")), 3).as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .select(col("id"), col("sz"), explode(col("sh")).as("shingle"))
    t("shingle explode")(sh.count())
    t("shingle explode x2")(sh.count())
    val joined = sh.as("a").join(sh.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
    t("self join")(joined.count())
    val grouped = joined.groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("common"))
    t("group pairs")(grouped.count())

    val ex2 = docs.select(col("doc_id").as("id"),
        F.transform(shingles(tokens(col("text")), 3), tokenHash _).as("h"))
      .filter(size(col("h")) > 0)
      .select(col("id"), explode(col("h")).as("hv"))
    t("hash explode")(ex2.count())
    val aggs = (0 until 32).map(i => min((lit(minHashA(i)) * col("hv") + lit(minHashB(i))) % MinHashP).as(s"s$i"))
    val sigs = ex2.groupBy("id").agg(aggs.head, aggs.tail: _*)
    t("minhash sigs")(sigs.count())
    spark.stop()
  }
}
