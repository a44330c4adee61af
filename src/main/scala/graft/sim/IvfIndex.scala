package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the at-rest form of [[IvfAnn]]'s claim that
  * probes prune storage: the quantized corpus is written
  * hive-partitioned by `list_id`, centroids sit beside it, and a query
  * reads ONLY the `list_id=` directories its probes select
  * (`PartitionFilters` in the scan — asserted in IvfIndexSpec). At
  * nprobe/C = 4/64 that is a 94% I/O cut before any scoring happens.
  *
  * Layout:
  * {{{
  *   <path>/index/list_id=<c>/...parquet   (nn_id, cq, nb)
  *   <path>/centroids/...parquet           (cid, cvec, cnorm)
  * }}}
  */
final class IvfIndex private (
    spark: SparkSession, path: String, centroids: Array[Array[Long]]) {

  /** Top-k over the persisted index: probe lists are computed from the
    * query set, collected (nprobe × |queries| small ints — a model-side
    * value, not data), and pushed as a partition filter.
    */
  def topK(
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int = 4): DataFrame = {
    val cdf = IvfAnn.centroidsDf(spark, centroids)
    val qs = queries.select(col(idCol).as("q_id"),
      CosineSim.quantize(col(vecCol)).as("qq"))
      .withColumn("na", CosineSim.normQ(col("qq")))
      .crossJoin(broadcast(cdf))
      .withColumn("neg_sim",
        -CosineSim.dotQ(col("qq"), col("cvec")).cast("double") / col("cnorm"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("neg_sim").asc, col("cid").asc)
    val probes = qs.withColumn("rn", row_number().over(pw))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("qq"), col("na"), col("cid").as("list_id"))
      .localCheckpoint()
    val probedLists = probes.select("list_id").distinct()
      .collect().map(_.getInt(0)).toSeq
    val index = spark.read.parquet(s"$path/index")
      .filter(col("list_id").isin(probedLists: _*))
    val cand = index.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("nn_id"))
    val scored = cand.select(col("q_id"), col("nn_id"),
      CosineSim.dotQ(col("qq"), col("cq")).as("dot"), col("na"), col("nb"))
      .withColumn("sim",
        col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
    CosineSim.finishTopK(scored, k)
  }

  /** Append new vectors WITHOUT retraining: each is assigned to its
    * nearest EXISTING centroid and lands in that list's partition — one
    * small partitioned write, O(batch) regardless of index size (the
    * FAISS train-once-add-many contract). Centroids drift from optimal
    * as the corpus grows; recall degrades gracefully and a periodic
    * [[IvfIndex.build]] rebuild restores it.
    */
  def append(newVectors: DataFrame, idCol: String, vecCol: String): IvfIndex = {
    val q = newVectors.select(col(idCol).as("nn_id"),
      CosineSim.quantize(col(vecCol)).as("cq"))
      .withColumn("nb", CosineSim.normQ(col("cq")))
    val assigned = IvfAnn.assignLists(
      q, IvfAnn.centroidsDf(spark, centroids), "nn_id", "cq")
    assigned.write.mode("append").partitionBy("list_id").parquet(s"$path/index")
    this
  }

  /** The pruned index scan for a given probe-list set (plan inspection
    * hook for tests).
    */
  def probedScan(lists: Seq[Int]): DataFrame =
    spark.read.parquet(s"$path/index").filter(col("list_id").isin(lists: _*))
}

object IvfIndex {

  /** Train + assign + persist. Returns the ready-to-query index. */
  def build(
      corpus: DataFrame, idCol: String, vecCol: String, path: String,
      nCentroids: Int = 16, iterations: Int = 3): IvfIndex = {
    val spark = corpus.sparkSession
    val q = corpus.select(col(idCol).as("nn_id"),
      CosineSim.quantize(col(vecCol)).as("cq"))
      .withColumn("nb", CosineSim.normQ(col("cq")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = IvfAnn.train(
      q.select(col("nn_id").as("id"), col("cq").as("qv")), nCentroids, iterations)
    val assigned = IvfAnn.assignLists(
      q, IvfAnn.centroidsDf(spark, centroids), "nn_id", "cq")
    assigned.write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/index")
    IvfAnn.centroidsDf(spark, centroids)
      .write.mode("overwrite").parquet(s"$path/centroids")
    q.unpersist()
    new IvfIndex(spark, path, centroids)
  }

  /** Open an existing index. */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("cid").collect()
      .map(_.getSeq[Long](1).toArray)
    new IvfIndex(spark, path, centroids)
  }
}
