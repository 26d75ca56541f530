package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.benchmark.Force

/** Dev tool: executed-plan evidence beyond the lazy `Explain` dump —
  * run named queries at the bench's shape and report, per query, the
  * REAL job / stage / task counts and wall time of one forced
  * execution (warm-up run first, like the bench). Eager builders
  * (checkpoint-cut loops) hide their work from the returned plan; this
  * tool counts it, so "one fewer pass / one fewer job" claims are
  * verifiable (r17 VERDICT noted plan dumps alone cannot show them).
  *
  * Usage: runMain graft.tools.JobProfile q1,q2 /root/testdata/sf0.1
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val verbose = args.length > 2 && args(2) == "-v"
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    val cpuNs = new AtomicLong(0L)
    val runMs = new AtomicLong(0L)
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLines =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStart.put(j.jobId, (System.nanoTime(),
          Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("") + " stages=" + j.stageInfos.size))
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobStart.remove(e.jobId)
        if (st != null && verbose)
          jobLines.add(f"    job ${e.jobId}%3d ${
            (System.nanoTime() - st._1) / 1e6}%7.1f ms  ${st._2}")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          cpuNs.addAndGet(m.executorCpuTime)
          runMs.addAndGet(m.executorRunTime)
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      shuffleRead.set(0L); shuffleWrite.set(0L)
      cpuNs.set(0L); runMs.set(0L)
      jobLines.clear()
    }
    def drainListeners(): Unit = {
      // listener bus is async; let events settle before reading counters
      Thread.sleep(300)
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      Force(fn(spark, sfDir)) // warm-up, uncounted
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(500)
      drainListeners()
      reset()
      val t0 = System.nanoTime()
      Force(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      drainListeners()
      println(f"[jobprofile] $name%-28s jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%6d " +
        f"shufR=${shuffleRead.get / 1024}%8d KiB " +
        f"shufW=${shuffleWrite.get / 1024}%8d KiB " +
        f"cpu=${cpuNs.get / 1e9}%7.3f s run=${runMs.get / 1e3}%7.3f s " +
        f"wall=$sec%7.3f s")
      if (verbose) jobLines.forEach(l => println(l))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300)
    }
    spark.stop()
  }
}
