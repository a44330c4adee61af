package graft.examples

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task accounting (guide §1: find where the fixed
  * per-action overhead goes): runs each named query twice (first run
  * warms JIT/codegen) and reports, for the SECOND run, the number of
  * Spark jobs, stages, tasks and the wall clock. A query whose warm
  * wall-clock is dominated by job count × fixed scheduling latency
  * rather than task time is a plan-overhead case, not a data case.
  * Usage: sbt "runMain graft.examples.JobCountProbe <sfDir> [query ...]"
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      // listener events are async: give the warm run's tail a moment
      // to drain before zeroing (counts here feed a human, not a gate)
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobprobe] $name%-28s wall=$wall%7.3f jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d tasks=${tasks.get}%5d " +
        f"taskSec=${taskNanos.get / 1e9}%8.2f")
    }
    spark.stop()
  }
}
