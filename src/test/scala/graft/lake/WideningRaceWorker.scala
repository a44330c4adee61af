package graft.lake

import org.apache.spark.sql.SparkSession

/** Forked-JVM appender for [[TypeWideningSpec]]'s cross-process
  * widening race: appends `n` NARROW (int) one-row batches while the
  * spec's JVM widens the same table mid-race. Its conformWidths runs
  * against whatever tracked schema it observes at stage time — which
  * may be the PRE-widening one — so some of its files legitimately
  * land narrow after the widening commit; the spec asserts the
  * protocol absorbs that (demand carried, values exact, no lost
  * commits).
  */
object WideningRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(path, id, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder().master("local[2]")
      .appName(s"graft-widen-race-worker-$id")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = new IncrementalTable(spark, path)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(path, s"_worker_${id}_ready"))
    (0 until n).foreach { i =>
      t.append(Seq((1000 + i, id)).toDF("k", "writer").coalesce(1)) // int k
    }
    spark.stop()
    println(s"[widen-race-worker] $id committed $n narrow appends")
  }
}
