package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline demo over the `documents` /
  * `embeddings` testdata — the composition a corpus run ships, wired
  * from the library's operators:
  *
  *   inventory → quality metrics → near-dup pairs → clusters →
  *   keep/drop → cleaned corpus → term salience → embedding ANN probe
  *
  * Run: sbt "runMain graft.examples.CorpusDemo [sfDir]"
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.load(spark, sfDir, "documents")
    println(s"=== corpus inventory (${docs.count()} docs) ===")
    graft.ops.PipelineQueries.sourceStats(spark, sfDir).show(5, truncate = false)

    println("=== near-dup detection -> clusters ===")
    val pairs = graft.dedup.MinHashLSH.nearDuplicates(
      docs, "doc_id", "text", 3, k = 8, bands = 4, num = 3, den = 10)
    val clusters = graft.dedup.Clusters.connectedComponents(pairs)
    val drop = clusters.filter(col("id") =!= col("cluster_id"))
    println(s"pairs=${pairs.count()} clustered_docs=${clusters.count()} dropped=${drop.count()}")

    println("=== cleaned corpus ===")
    val cleaned = graft.ops.PipelineQueries.corpusCleanNearDup(spark, sfDir)
    println(s"surviving docs: ${cleaned.count()}")
    cleaned.show(3, truncate = false)

    println("=== quality: most repetitive docs ===")
    graft.ops.PipelineQueries.docRepetition(spark, sfDir)
      .filter(col("total_ngrams") > 0)
      .withColumn("rep_pct",
        (lit(100) * (col("total_ngrams") - col("distinct_ngrams")) / col("total_ngrams")).cast("int"))
      .orderBy(col("rep_pct").desc, col("doc_id"))
      .show(3)

    println("=== embedding ANN probe (IVF) ===")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    graft.sim.IvfAnn.topK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3).show(9)

    println("=== curation: score -> token-budget selection ===")
    val budgets = Seq("web" -> 20000L, "books" -> 10000L)
    graft.ops.Curation.selectByTokenBudget(
      docs, "doc_id", "text", "source", budgets)
      .groupBy("source").agg(count(lit(1)).as("docs_kept"),
        max("cum_tokens").as("tokens_used"))
      .show()

    println("=== semantic clustering -> cluster-balanced mix ===")
    val assigned = graft.sim.KMeans.assign(emb, "vec_id", "embedding", k = 8)
    assigned.groupBy("cluster_id").count().orderBy("cluster_id").show()
    val balanced = graft.ops.Curation.balanceClusters(assigned, "vec_id")
    println(s"balanced corpus: ${balanced.count()} of ${emb.count()} vectors")

    println("=== frequent boilerplate bigrams (bounded-state) ===")
    graft.ops.PipelineQueries.heavyHitters(spark, sfDir).show(6, truncate = false)

    spark.stop()
  }
}
