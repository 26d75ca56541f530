package graft.tools

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: SparkEntry.entry(spark) must return >0
  * rows on sf0.001 with a session the driver would build (no custom
  * extensions, default configs apart from the nanos workaround).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0)
    spark.stop()
  }
}
