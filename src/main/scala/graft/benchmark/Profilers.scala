package graft.benchmark

import org.apache.spark.sql.DataFrame

/** Wall-time statistics over repeated measurements
  * (reference: src/pywrangler/benchmark.py:428-531 TimeProfiler —
  * best/median/worst +- std protocol).
  */
final case class TimeProfile(runs: Vector[Double]) {
  require(runs.nonEmpty)
  def best: Double = runs.min
  def worst: Double = runs.max
  def median: Double = {
    val s = runs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
  }
  def mean: Double = runs.sum / runs.size
  def std: Double =
    math.sqrt(runs.map(r => (r - mean) * (r - mean)).sum / runs.size)
  override def toString: String =
    f"best $best%.4fs median $median%.4fs worst $worst%.4fs (+- $std%.4fs, n=${runs.size})"
}

/** Time a thunk `reps` times after `warmups` discarded warm-up runs. */
final class TimeProfiler(reps: Int = 5, warmups: Int = 1) {
  require(reps > 0)
  def profile(f: => Unit): TimeProfile = {
    (1 to warmups).foreach(_ => f)
    TimeProfile((1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.toVector)
  }
}

/** Spark-specific wall-time profiler: forces plan execution with a
  * noop-sink write (all rows, all columns — see [[Force]]; the
  * reference's `count()` forcing lets Catalyst prune row-preserving
  * plans to nothing); optionally pre-warms the input via
  * `persist()+count()` and unpersists afterwards
  * (reference: src/pywrangler/pyspark/benchmark.py:21-75, 121-149).
  */
final class SparkTimeProfiler(reps: Int = 5, warmups: Int = 1,
                              cacheInput: Boolean = false) {
  def profile(input: DataFrame)(op: DataFrame => DataFrame): TimeProfile = {
    val df = if (cacheInput) { val c = input.persist(); c.count(); c } else input
    try new TimeProfiler(reps, warmups).profile(Force(op(df)))
    finally if (cacheInput) df.unpersist(blocking = true)
  }
}
