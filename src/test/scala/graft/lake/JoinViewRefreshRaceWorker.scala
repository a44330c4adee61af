package graft.lake

import org.apache.spark.sql.SparkSession

/** Forked-JVM refresher for [[IncrementalJoinViewSpec]]'s cross-
  * process race — the join-view twin of [[ViewRefreshRaceWorker]]:
  * opens the join view from its persisted definition alone and
  * refreshes in a loop while the spec's JVM mutates the fact and
  * refreshes its own handle. Losing a view-commit race throws
  * [[CommitConflictException]] — expected, counted and swallowed; the
  * spec asserts the commit arbitration left the view exactly equal to
  * the full join aggregate, whichever process won each round.
  */
object JoinViewRefreshRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(viewPath, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-join-view-race-worker")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(viewPath, "_worker_ready"))
    var ok = 0
    var conflicts = 0
    (0 until n).foreach { _ =>
      try { IncrementalJoinView.open(spark, viewPath).refresh(); ok += 1 }
      catch { case _: CommitConflictException => conflicts += 1 }
      Thread.sleep(50)
    }
    spark.stop()
    println(s"[join-view-race-worker] refreshed=$ok conflicts=$conflicts")
  }
}
