package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Portable._
import graft.operators.Dedup

/** Scratch profiling main for the n-gram Jaccard stages. */
object ProfileJaccard {
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
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    val v0 = Dedup.NGramJaccard().transform(docs)
    t("v0 uncapped")(v0.count())
    t("v0 uncapped x2")(v0.count())

    // V2': cap=10, broadcast hot anti-join, sz re-agg, 2-key pair groupBy
    def v2(cap: Long) = {
      val sh = shingleRows(docs.select(col("doc_id").as("id"), col("text")),
        "id", "text", 3).select("id", "shingle")
      val hot = sh.groupBy("shingle").count()
        .filter(col("count") > cap).select("shingle")
      val kept = sh.join(broadcast(hot), Seq("shingle"), "left_anti")
      val szT = kept.groupBy("id").agg(count(lit(1)).as("sz"))
      val pairs = kept.as("a").join(kept.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("common"))
      pairs
        .join(szT.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(szT.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
        .withColumn("uni", col("sz_a") + col("sz_b") - col("common"))
        .withColumn("jaccard",
          round(col("common").cast("double") / col("uni").cast("double"), 6))
        .filter(col("jaccard") >= 0.2)
        .select("id_a", "id_b", "common", "uni", "jaccard")
    }
    val c10 = v2(10L)
    t("v2 cap=10")(c10.count())
    t("v2 cap=10 x2")(c10.count())
    t("v2 cap=10 +orderBy")(c10.orderBy("id_a", "id_b").count())

    // V3: bounded posting lists -> map-side pair generation, no self-join
    def v3(cap: Long) = {
      import spark.implicits._
      val sh = shingleRows(docs.select(col("doc_id").as("id"), col("text")),
        "id", "text", 3).select("id", "shingle")
      val hot = sh.groupBy("shingle").count()
        .filter(col("count") > cap).select("shingle")
      val kept = sh.join(broadcast(hot), Seq("shingle"), "left_anti")
      val szT = kept.groupBy("id").agg(count(lit(1)).as("sz"))
      val lists = kept.groupBy("shingle")
        .agg(collect_list(col("id")).as("ids"))
      val pairs = lists.select(col("ids")).as[Seq[Long]]
        .flatMap { ids =>
          val n = ids.length
          val out = Seq.newBuilder[(Long, Long)]
          var i = 0
          while (i < n) {
            var j = i + 1
            while (j < n) {
              val a = ids(i); val b = ids(j)
              out += (if (a < b) (a, b) else (b, a))
              j += 1
            }
            i += 1
          }
          out.result()
        }
        .toDF("id_a", "id_b")
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      pairs
        .join(szT.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(szT.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
        .withColumn("uni", col("sz_a") + col("sz_b") - col("common"))
        .withColumn("jaccard",
          round(col("common").cast("double") / col("uni").cast("double"), 6))
        .filter(col("jaccard") >= 0.2)
        .select("id_a", "id_b", "common", "uni", "jaccard")
    }
    val d10 = v3(10L)
    t("v3 cap=10")(d10.count())
    t("v3 cap=10 x2")(d10.count())
    t("v3 cap=10 +orderBy")(d10.orderBy("id_a", "id_b").count())
    spark.stop()
  }
}
