package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Int8

/** Persisted IVF index — the at-rest form of [[IvfAnn]]'s claim that
  * probes prune storage: the corpus is written hive-partitioned by
  * `list_id`, centroids sit beside it, and a query reads ONLY the
  * `list_id=` directories its probes select (`PartitionFilters` in the
  * scan — asserted in IvfIndexSpec). At nprobe/C = 4/64 that is a 94%
  * I/O cut before any scoring happens.
  *
  * ==Quantized lists + exact re-rank==
  * The LIST payload is int8-scalar-quantized ([[graft.functions.Int8]]):
  * 1 byte/dim codes plus per-vector `maxabs`/norm scalars. The win at
  * 100 TB is the probe-path WORKING SET — every candidate scored
  * decodes 1 byte/dim instead of an 8-byte/dim `array<long>` (8× less
  * memory bandwidth and cache per candidate, and 8× more list cached
  * per executor byte), and on disk the lists run ~3-4× under a
  * float32 source representation (measured in IvfIndexSpec; note
  * parquet dictionary-packs milli-quantized int64 to ~11 bits, so the
  * naive "1/8 of int64" does NOT show on disk — the honest disk
  * comparison is against the float source, and the decoded-bytes
  * ratio is the structural 8×). Probing scores candidates on the
  * codes (approximate), keeps the top `4·k` per query, and re-ranks
  * ONLY those from the raw vectors (side store `raw/`, fetched by id
  * with the small candidate set broadcast), so the SERVED scores and
  * order are exact over the probed lists — identical to un-quantized
  * lists whenever the true in-list top-k survives the 4·k approximate
  * cut (int8 on unit-norm vectors is far more precise than
  * inter-neighbor gaps; `ann_ivf_index_topk` stays hash-green against
  * the exact-replay oracle). Raw fetch cost is O(candidates) rows
  * joined against an id-clustered table — never a probe-path scan.
  *
  * Layout:
  * {{{
  *   <path>/index/list_id=<c>/...parquet   (nn_id, code BINARY, mx INT, nbf FLOAT)
  *   <path>/raw/...parquet                 (nn_id, cq, nb) id-clustered
  *   <path>/centroids/...parquet           (cid, cvec, cnorm)
  * }}}
  */
final class IvfIndex private (
    spark: SparkSession, path: String, centroids: Array[Array[Long]]) {

  /** Top-k over the persisted index: probe lists are computed from the
    * query set, collected (nprobe × |queries| small ints — a model-side
    * value, not data), and pushed as a partition filter; int8 approx
    * cut to `rerank`·k per query, exact re-rank from `raw/`.
    */
  def topK(
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int = 4, rerank: Int = 4): DataFrame = {
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
    // approximate scoring on the int8 codes: reconstructed dot =
    // byteDot · mx / 127; mx = 0 is the zero vector (byteDot 0)
    val cand = index.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("nn_id"))
      .withColumn("approx_sim",
        Int8.byteDot(col("qq"), col("code")).cast("double") * col("mx") /
          (lit(127.0) * sqrt(col("na").cast("double") *
            col("nbf").cast("double"))))
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("approx_sim").desc, col("nn_id").asc)
    val shortlist = cand.withColumn("crn", row_number().over(cw))
      .filter(col("crn") <= math.max(rerank * k, k + 16))
      .select("q_id", "nn_id", "qq", "na")
      .localCheckpoint() // feeds the id predicate AND the join probe
    // exact re-rank: fetch ONLY the shortlist's raw vectors by id. A
    // broadcast join alone would still SCAN all of raw/ (the hash probe
    // filters rows after the read); the candidate ids must also reach
    // the parquet scan as a pushed predicate so the id-clustered files
    // prune on min/max stats — the collect is shortlist-sized, the very
    // set the join broadcasts anyway. An oversized shortlist (huge
    // query batch) drops the predicate: never wrong, only slower.
    val ids = shortlist.select("nn_id").distinct()
      .limit(IvfIndex.MaxRerankIdPredicate + 1).collect().map(_.get(0))
    val raw0 = spark.read.parquet(s"$path/raw")
    val raw =
      if (ids.length > IvfIndex.MaxRerankIdPredicate) raw0
      else raw0.filter(col("nn_id").isInCollection(ids.toSeq))
    val scored = raw.join(broadcast(shortlist), Seq("nn_id"))
      .select(col("q_id"), col("nn_id"),
        CosineSim.dotQ(col("qq"), col("cq")).as("dot"), col("na"), col("nb"))
      .withColumn("sim",
        col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
    CosineSim.finishTopK(scored, k)
  }

  /** Append new vectors WITHOUT retraining: each is assigned to its
    * nearest EXISTING centroid and lands in that list's partition — one
    * small partitioned write plus a raw-store append, O(batch)
    * regardless of index size (the FAISS train-once-add-many
    * contract). Centroids drift from optimal as the corpus grows;
    * recall degrades gracefully and a periodic [[IvfIndex.build]]
    * rebuild restores it.
    */
  def append(newVectors: DataFrame, idCol: String, vecCol: String): IvfIndex = {
    val q = newVectors.select(col(idCol).as("nn_id"),
      CosineSim.quantize(col(vecCol)).as("cq"))
      .withColumn("nb", CosineSim.normQ(col("cq")))
      .localCheckpoint() // feeds lists AND raw; quantize once
    val assigned = IvfAnn.assignLists(
      q, IvfAnn.centroidsDf(spark, centroids), "nn_id", "cq")
    IvfIndex.writeLists(assigned, s"$path/index", overwrite = false)
    q.orderBy("nn_id").write.mode("append").parquet(s"$path/raw")
    this
  }

  /** The pruned index scan for a given probe-list set (plan inspection
    * hook for tests).
    */
  def probedScan(lists: Seq[Int]): DataFrame =
    spark.read.parquet(s"$path/index").filter(col("list_id").isin(lists: _*))
}

object IvfIndex {

  /** Cap on the re-rank id set pushed as a raw-scan predicate; above
    * it the predicate is dropped (the broadcast join stays correct).
    * The shortlist is `|queries| · max(rerank·k, k+16)` rows, so a
    * normal probe batch sits far below this.
    */
  val MaxRerankIdPredicate = 65536

  /** Quantize `(nn_id, cq, nb, list_id)` rows to the int8 list schema
    * and write them partitioned by list. `mx` (int) and `nbf` (float)
    * are ranking-precision scalars — the exact `nb` lives in `raw/`
    * and re-enters at re-rank.
    */
  private def writeLists(assigned: DataFrame, dir: String,
      overwrite: Boolean): Unit =
    assigned.select(col("nn_id"), Int8.encode(col("cq")).as("code"),
      Int8.maxAbs(col("cq")).cast("int").as("mx"),
      col("nb").cast("float").as("nbf"), col("list_id"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("list_id").parquet(dir)

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
    writeLists(assigned, s"$path/index", overwrite = true)
    // raw store, id-clustered so a candidate-id fetch can prune files
    q.orderBy("nn_id").write.mode("overwrite").parquet(s"$path/raw")
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
