package graft.examples

import org.apache.spark.sql.SparkSession

/** Warm-vs-cold timing probe: runs each named query twice in one JVM
  * and prints both wall-clocks, separating JIT/codegen/scan-cold costs
  * from steady-state. Usage:
  *   sbt "runMain graft.examples.WarmBench <sfDir> [query ...]"
  */
object WarmBench {
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
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"[warmbench] $name%-24s cold=$cold%7.2f warm=$warm%7.2f")
    }
    spark.stop()
  }
}
