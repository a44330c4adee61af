package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * coarse-quantizer counterpart to [[AnnLsh]]:
  *
  *  1. TRAIN: k-means a small set of centroids (Lloyd iterations run as
  *     Spark aggregations; only the C centroid vectors — a model
  *     parameter, not data — ever reach the driver);
  *  2. INDEX: assign every corpus vector to its nearest centroid (one
  *     narrow pass; at scale the corpus is written partitioned by
  *     `list_id`, so a probe reads only nprobe/C of the files);
  *  3. QUERY: score each query against the centroids, take the `nprobe`
  *     nearest lists, then exact-rerank only the vectors in those lists
  *     (fixed-point cosine, codegen'd [[graft.functions.LongArrayDot]]).
  *
  * Plan-shape discipline: centroids travel as a BROADCAST C-row
  * DataFrame, never as literal arrays baked into expressions — baked
  * literals change every Lloyd iteration, forcing a whole-stage-codegen
  * recompile per iteration, while the join form compiles once and only
  * the broadcast DATA changes.
  *
  * Determinism: centroids are seeded from the C lowest vector ids and
  * Lloyd averaging is exact-integer (sum/count in int64 milli-units),
  * so training is reproducible run-to-run; the operator is still
  * statistical (recall, not identity), so the driver records a
  * rows-only check and IvfAnnSpec asserts recall vs brute force.
  */
object IvfAnn {

  /** Centroids as a C-row DataFrame `(cid, cvec, cnorm)`. */
  private[sim] def centroidsDf(
      spark: SparkSession, centroids: Array[Array[Long]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) =>
      (i, c, math.sqrt(c.map(x => x.toDouble * x.toDouble).sum))
    }.toSeq.toDF("cid", "cvec", "cnorm")
  }

  /** Nearest-centroid assignment: broadcast C-row cross join + an
    * argmin AGGREGATE (`min(struct(neg_sim, cid))` — partial-agg
    * friendly, so the shuffle carries ONE row per vector, not C; a
    * window here would shuffle the full C-fanout). Input must carry
    * (`idName`, `vecName`); all other columns pass through. Ties break
    * to the lower centroid id via the struct sort order.
    */
  private[sim] def assignLists(
      vecs: DataFrame, cdf: DataFrame, idName: String, vecName: String): DataFrame = {
    val passThrough = vecs.columns.filterNot(_ == idName)
    val scored = vecs.crossJoin(broadcast(cdf))
      .withColumn("neg_sim",
        -CosineSim.dotQ(col(vecName), col("cvec")).cast("double") / col("cnorm"))
    scored.groupBy(col(idName))
      .agg(min(struct(col("neg_sim"), col("cid"))).as("__best"),
        passThrough.map(c => first(col(c)).as(c)): _*)
      .withColumn("list_id", col("__best.cid"))
      .drop("__best")
  }

  /** Deterministic k-means centroids in quantized int64 milli-units.
    * Returns `nCentroids` arrays (may be fewer if the corpus is tiny).
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iterations: Int = 3): Array[Array[Long]] = {
    val q = corpus
      .select(col(idCol).as("id"), CosineSim.quantize(col(vecCol)).as("qv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val c = train(q, nCentroids, iterations)
    q.unpersist()
    c
  }

  /** Lloyd loop over an already-quantized, persisted `(id, qv)` table. */
  private[sim] def train(
      q: DataFrame, nCentroids: Int, iterations: Int): Array[Array[Long]] = {
    val spark = q.sparkSession
    var centroids: Array[Array[Long]] = q
      .orderBy("id").limit(nCentroids).collect()
      .map(_.getSeq[Long](1).toArray)
    val dim = centroids.head.length
    for (_ <- 1 to iterations) {
      val assigned = assignLists(q, centroidsDf(spark, centroids), "id", "qv")
      // exact integer mean per dimension: sum in int64, divide by count
      val sums = assigned.groupBy("list_id").agg(
        count(lit(1)).as("n"),
        (0 until dim).map(d =>
          sum(element_at(col("qv"), d + 1)).as(s"s$d")): _*)
      centroids = sums.collect().sortBy(_.getInt(0)).map { r =>
        val n = r.getLong(1)
        Array.tabulate(dim)(d => r.getLong(d + 2) / math.max(n, 1L))
      }
    }
    centroids
  }

  /** Top-k ANN: train + index + probe in one plan. Output matches
    * [[CosineSim.bruteForceTopK]]: `(q_id, rank, nn_id, dot, na, nb)`.
    */
  def topK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 16, nprobe: Int = 4,
      iterations: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val q = corpus.select(col(idCol).as("nn_id"),
      CosineSim.quantize(col(vecCol)).as("cq"))
      .withColumn("nb", CosineSim.normQ(col("cq")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids =
      train(q.select(col("nn_id").as("id"), col("cq").as("qv")), nCentroids, iterations)
    val cdf = centroidsDf(spark, centroids)

    val c = assignLists(q, cdf, "nn_id", "cq")
    // nprobe nearest lists per query: same broadcast cross join shape
    val qs = queries.select(col(idCol).as("q_id"),
      CosineSim.quantize(col(vecCol)).as("qq"))
      .withColumn("na", CosineSim.normQ(col("qq")))
      .crossJoin(broadcast(cdf))
      .withColumn("neg_sim",
        -CosineSim.dotQ(col("qq"), col("cvec")).cast("double") / col("cnorm"))
    val pw = Window.partitionBy("q_id").orderBy(col("neg_sim").asc, col("cid").asc)
    val probes = qs.withColumn("rn", row_number().over(pw))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("qq"), col("na"), col("cid").as("list_id"))

    val cand = c.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("nn_id"))
    val scored = cand.select(col("q_id"), col("nn_id"),
      CosineSim.dotQ(col("qq"), col("cq")).as("dot"), col("na"), col("nb"))
      .withColumn("sim",
        col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
    CosineSim.finishTopK(scored, k)
  }
}
