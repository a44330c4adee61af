package graft.lake

import org.apache.spark.sql.SparkSession

/** Forked-JVM appender for [[RowTrackingSpec]]'s cross-process
  * allocation race: appends `n` one-row batches to a row-tracked table
  * while the spec's JVM appends its own. Each append allocates row ids
  * from the manifest-carried watermark under the optimistic commit
  * loop — the spec asserts no id was issued twice and no row lost,
  * whichever JVM won each commit race.
  */
object RowIdRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(path, id, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder().master("local[2]")
      .appName(s"graft-rowid-race-worker-$id")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = new IncrementalTable(spark, path)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(path, s"_worker_${id}_ready"))
    (0 until n).foreach { i =>
      t.append(Seq((1000 + i, id)).toDF("k", "writer").coalesce(1))
    }
    spark.stop()
    println(s"[rowid-race-worker] $id committed $n appends")
  }
}
