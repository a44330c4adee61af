package graft.lake

import org.apache.spark.sql.SparkSession

/** Forked-JVM appender for [[CommitRaceSpec]]'s cross-process commit
  * arbitration test: appends `n` one-row batches to the table at
  * `path` from its OWN SparkSession/JVM, so the only arbitration
  * between it and the spec's writer is the on-disk commit protocol —
  * no shared locks, no shared caches.
  */
object CommitRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(path, id, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder().master("local[2]")
      .appName(s"graft-race-worker-$id")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = new IncrementalTable(spark, path)
    // signal readiness AFTER the session is up so the spec's writer
    // can race the append loop, not the ~15 s JVM/session boot
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(path, s"_worker_${id}_ready"))
    (0 until n).foreach { i =>
      t.append(Seq((s"$id-$i", id)).toDF("key", "writer").coalesce(1))
    }
    spark.stop()
    println(s"[race-worker] $id committed $n appends")
  }
}
