package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Protocol — aligned with BASELINE.md's recorded rows so the 2x
  * regression gate is apples-to-apples (reference:
  * src/pywrangler/pyspark/benchmark.py:21-75 — force execution via count,
  * pre-warm before timing; src/pywrangler/benchmark.py:428-531 — report
  * the median over repeated runs): per query, one untimed warm-up run
  * (JIT, parquet footer/file-index caches, OS page cache), then `reps`
  * timed runs (default 5) reporting the MEDIAN — steady-state per-query
  * cost, not cold-start noise and not a lucky best.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores ts as INT64 TIMESTAMP(NANOS): read as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    // session warm-up: run the cheapest query once to init the stack
    try SparkEntry.queries.head._2(spark, sfDir).count()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> {
        try {
          fn(spark, sfDir).count() // per-query warm-up, untimed
          median((1 to reps).map(_ => time(fn(spark, sfDir).count())))
        } catch { case _: Throwable => -1.0 }
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
