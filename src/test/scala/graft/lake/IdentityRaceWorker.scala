package graft.lake

import org.apache.spark.sql.SparkSession

/** Forked-JVM identity allocator for [[CommitRaceSpec]]'s cross-process
  * identity race: appends `n` multi-row batches with NULL identity
  * slots to the table at `path` from its OWN JVM. The only thing
  * keeping its allocated ids disjoint from the spec writer's is the
  * committed `id_watermark` + the commit-time re-check — exactly the
  * invariant the round-5 watermark-rewind fixes protect.
  */
object IdentityRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(path, id, nStr, rowsStr) = args
    val n = nStr.toInt
    val rows = rowsStr.toInt
    val spark = SparkSession.builder().master("local[2]")
      .appName(s"graft-idrace-worker-$id")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = new IncrementalTable(spark, path)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(path, s"_worker_${id}_ready"))
    (0 until n).foreach { i =>
      t.append((0 until rows).map(j => (s"$id-$i-$j", id))
        .toDF("key", "writer").coalesce(1))
    }
    spark.stop()
    println(s"[idrace-worker] $id committed $n identity batches")
  }
}
