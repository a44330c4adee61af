package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-means SEMANTIC CLUSTERING of an embedding column — the corpus-
  * organization primitive behind domain balancing ("sample each
  * semantic cluster proportionally"), SemDeDup-style pruning (dedup
  * WITHIN clusters instead of across the corpus), and topic-level
  * corpus inspection. Reuses the IVF coarse quantizer's machinery
  * ([[IvfAnn]]) — same bounded deterministic training (one corpus
  * pass + Lloyd iterations over a ≤max(256·k, 4096)-point sample, the
  * FAISS cap), same zero-shuffle broadcast-fold assignment — so
  * clustering 100 TB costs one training pass plus ONE narrow map pass
  * over the corpus, no shuffle of the vectors at all.
  *
  * Deterministic end-to-end: quantization is fixed-point milli
  * ([[CosineSim.quantize]]), init is the k smallest ids, assignment is
  * cosine argmin with ties to the lower cluster id, and the per-dim
  * centroid update is exact integer mean — so the full assignment
  * replays bit-for-bit in SQL (the `cluster_embeddings` oracle) when
  * the corpus fits the training cap, and remains reproducible
  * run-to-run (sample selection is hash-ordered, corpus-order-
  * independent) beyond it.
  */
object KMeans {

  /** `(idCol, cluster_id)` for every input row: train k centroids,
    * then one narrow assignment pass. Ids must be unique (the
    * [[IvfAnn.assignLists]] contract).
    *
    * The returned frame is LAZY on purpose: assignment is a pure
    * narrow map over the corpus (broadcast centroids, zero shuffle),
    * so materializing it here — a corpus-sized checkpoint — would be
    * the scale mistake. Training bounds and persists its own sample
    * internally; the corpus is scanned once for sample selection and
    * once per downstream consumption.
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 3): DataFrame = {
    val q = corpus
      .select(col(idCol).as("id"), CosineSim.quantize(col(vecCol)).as("qv"))
    val centroids = IvfAnn.train(q, k, iterations)
    IvfAnn.assignLists(q, IvfAnn.centroidsDf(corpus.sparkSession, centroids),
      "id", "qv")
      .select(col("id").as(idCol), col("list_id").cast("long").as("cluster_id"))
  }

  /** [[assign]] KEEPING every corpus column: `(corpus.*, cluster_id)`.
    * [[IvfAnn.assignLists]] already passes non-vector columns through
    * its narrow broadcast-fold map, so a consumer that needs the
    * original row next to its cluster (SemDeDup's scoped pair join)
    * gets it here for free — where `corpus.join(assign(...), idCol)`
    * re-pairs every row with its own assignment through a full
    * equi-join (two exchanges + sorts of the corpus, guide §2.4:
    * a shuffle that computes a per-row value).
    */
  def assignAll(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 3): DataFrame = {
    val q = corpus.withColumn("__qv", CosineSim.quantize(col(vecCol)))
    val centroids = IvfAnn.train(
      q.select(col(idCol).as("id"), col("__qv").as("qv")), k, iterations)
    IvfAnn.assignLists(q, IvfAnn.centroidsDf(corpus.sparkSession, centroids),
      idCol, "__qv")
      .withColumn("cluster_id", col("list_id").cast("long"))
      .drop("list_id", "__qv")
  }
}
