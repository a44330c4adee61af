package graft.lake

import org.apache.spark.sql.SparkSession

/** Forked-JVM refresher for [[IncrementalViewSpec]]'s cross-process
  * race: opens the view from its persisted definition alone and
  * refreshes in a loop while the spec's JVM mutates the source and
  * refreshes its own handle. Losing a view-commit race throws
  * [[CommitConflictException]] (the removed files are gone) — EXPECTED
  * here, counted and swallowed: the spec asserts the commit-level
  * arbitration left the view exactly equal to the full aggregate,
  * whichever process won each round.
  */
object ViewRefreshRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(viewPath, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-view-race-worker")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(viewPath, "_worker_ready"))
    var ok = 0
    var conflicts = 0
    (0 until n).foreach { _ =>
      try { IncrementalView.open(spark, viewPath).refresh(); ok += 1 }
      catch { case _: CommitConflictException => conflicts += 1 }
      Thread.sleep(50)
    }
    spark.stop()
    println(s"[view-race-worker] refreshed=$ok conflicts=$conflicts")
  }
}
