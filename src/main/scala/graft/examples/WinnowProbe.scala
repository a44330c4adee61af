package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the winnowing pipeline — which of
  * canonicalize / explode / hash / window / distinct dominates?
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 8; val w = 16

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[winnowprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%,d")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("__canon"))
      .filter(length(col("__canon")) >= k)
      .repartition(col("doc_id"))
    val grams = docs
      .withColumn("__n", (length(col("__canon")) - (k - 1)).cast("int"))
      .withColumn("__i", explode(sequence(lit(1), col("__n"))))
    val hashed = grams.select(col("doc_id"), col("__n"), col("__i"),
      expr(s"cast(conv(substr(md5(substr(__canon, __i, $k)), 1, 8), 16, 10) as bigint)").as("__h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("__i").rowsBetween(0, w - 1)
    val mins = hashed.withColumn("__min", min(col("__h")).over(win))
      .filter(col("__i") <= greatest(col("__n") - (w - 1), lit(1)))
    val fps = mins.select(col("doc_id"), col("__min").as("fp")).distinct()

    (1 to 2).foreach { round =>
      println(s"[winnowprobe] --- round $round ---")
      time("canon+repartition")(docs.count())
      time("  +explode")(grams.count())
      time("  +substr only")(grams.select(col("doc_id"),
        expr(s"substr(__canon, __i, $k)").as("g")).count())
      time("  +md5")(grams.select(col("doc_id"),
        expr(s"md5(substr(__canon, __i, $k))").as("g")).count())
      time("  +conv+cast (full hash)")(hashed.count())
      time("  +window min")(mins.count())
      val mat = mins.select(col("doc_id"), col("__min").as("fp")).localCheckpoint()
      time("  distinct on materialized")(mat.distinct().count())
      time("  groupBy on materialized")(
        mat.groupBy("doc_id", "fp").agg(count(lit(1))).count())
      time("  +distinct (full chain)")(fps.count())
      time("  +exchange+distinct")(
        mins.select(col("doc_id"), col("__min").as("fp"))
          .repartition(col("doc_id"), col("fp")).distinct().count())
      time("  window-free (explode+agg)")(
        hashed
          .withColumn("__j", explode(sequence(
            greatest(col("__i") - (w - 1), lit(1)),
            least(col("__i"), greatest(col("__n") - (w - 1), lit(1))))))
          .groupBy(col("doc_id"), col("__j")).agg(min(col("__h")).as("fp"))
          .select("doc_id", "fp").distinct().count())
    }
    println(fps.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
