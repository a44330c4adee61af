package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Determinism: centroids are seeded from the C lowest vector ids and
  * Lloyd averaging is exact-integer (sum/count in int64 milli-units),
  * so training is reproducible run-to-run; the operator is still
  * statistical (recall, not identity), so the driver records a
  * rows-only check and AnnIvfSpec asserts recall vs brute force.
  */
object IvfAnn {

  /** Deterministic k-means centroids in quantized int64 milli-units.
    * Returns `nCentroids` arrays (may be fewer if the corpus is tiny).
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iterations: Int = 3): Array[Array[Long]] = {
    val q = corpus
      .select(col(idCol).as("id"), CosineSim.quantize(col(vecCol)).as("qv"))
    var centroids: Array[Array[Long]] = q
      .orderBy("id").limit(nCentroids).collect()
      .map(_.getSeq[Long](1).toArray)
    for (_ <- 1 to iterations) {
      val assigned = q.withColumn("list_id", nearestCentroid(col("qv"), centroids))
      // exact integer mean per dimension: sum in int64, divide by count
      val dim = centroids.head.length
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

  /** Nearest-centroid id by maximum cosine; the per-centroid dot runs
    * as one codegen'd LongArrayDot against a literal array. Ties break
    * to the lower centroid id via the struct sort key.
    */
  def nearestCentroid(qv: Column, centroids: Array[Array[Long]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cNorm = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      struct(
        (-CosineSim.dotQ(qv, lit(c)).cast("double") / lit(cNorm)).as("negSim"),
        lit(i).as("cid"))
    }
    array_min(array(scored: _*)).getField("cid")
  }

  /** `nprobe` nearest centroid ids for a query vector, as an array. */
  def probeLists(qv: Column, centroids: Array[Array[Long]], nprobe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cNorm = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      struct(
        (-CosineSim.dotQ(qv, lit(c)).cast("double") / lit(cNorm)).as("negSim"),
        lit(i).as("cid"))
    }
    slice(transform(array_sort(array(scored: _*)), s => s.getField("cid")),
      1, nprobe)
  }

  /** Top-k ANN: train + index + probe in one plan. Output matches
    * [[CosineSim.bruteForceTopK]]: `(q_id, rank, nn_id, dot, na, nb)`.
    */
  def topK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = trainCentroids(corpus, idCol, vecCol, nCentroids)
    val c = corpus.select(col(idCol).as("nn_id"),
      CosineSim.quantize(col(vecCol)).as("cq"))
      .withColumn("nb", CosineSim.normQ(col("cq")))
      .withColumn("list_id", nearestCentroid(col("cq"), centroids))
    val qs = queries.select(col(idCol).as("q_id"),
      CosineSim.quantize(col(vecCol)).as("qq"))
      .withColumn("na", CosineSim.normQ(col("qq")))
      .withColumn("list_id", explode(probeLists(col("qq"), centroids, nprobe)))
    val cand = c.join(broadcast(qs), Seq("list_id"))
      .filter(col("q_id") =!= col("nn_id"))
    val scored = cand.select(col("q_id"), col("nn_id"),
      CosineSim.dotQ(col("qq"), col("cq")).as("dot"), col("na"), col("nb"))
      .withColumn("sim",
        col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "nn_id", "dot", "na", "nb")
  }
}
