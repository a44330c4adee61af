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
  * Determinism: the training sample is a hash-ordered top-N (see
  * [[train]]), centroids are seeded from its C lowest vector ids, and
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

  /** Nearest-centroid assignment as a NARROW map pass: the C centroids
    * are packed into ONE broadcast row as a cid-sorted `array<struct>`
    * and an `aggregate()` fold computes the per-vector argmin in place
    * — zero shuffle. The fold is an INTERPRETED lambda (Spark evaluates
    * higher-order functions outside whole-stage codegen — the 15-35×
    * penalty Shingles.scala documents), a trade measured and accepted:
    * the eliminated full-corpus shuffle dominates at the coarse
    * quantizer's C (≤ a few hundred; [[MaxCentroids]] guards the
    * contract), whereas at fine-quantizer C (thousands) the per-row
    * C-element interpreted fold would dominate instead — that use case
    * wants a different kernel, not this one. (The previous shape —
    * C-row cross join + `min(struct(neg_sim, cid))` groupBy — was
    * partial-agg friendly but still shuffled every vector's payload
    * once per call; at index-build scale that is a full-corpus shuffle
    * spent computing a per-row value.) Input must carry (`idName`,
    * `vecName`) with UNIQUE ids — one output row per input row; the
    * pre-round-7 groupBy(id)+first() form silently collapsed duplicate
    * ids, this one passes them through. All other columns pass through
    * untouched. Tie-break matches the old `min(struct(...))` order:
    * the fold visits cids ASCENDING and replaces only on strictly
    * smaller distance, so ties keep the lower cid.
    */
  private[sim] def assignLists(
      vecs: DataFrame, cdf: DataFrame, idName: String, vecName: String): DataFrame = {
    val packed = cdf.agg(sort_array(collect_list(
      struct(col("cid"), col("cvec"), col("cnorm")))).as("__cents"))
    vecs.crossJoin(broadcast(packed))
      .withColumn("__best",
        aggregate(col("__cents"),
          struct(lit(Double.PositiveInfinity).as("s"), lit(-1).as("cid")),
          (acc, c) => {
            val s = (-CosineSim.dotQ(col(vecName), c("cvec")).cast("double")) /
              c("cnorm")
            when(s < acc("s"), struct(s.as("s"), c("cid").as("cid")))
              .otherwise(acc)
          }))
      .withColumn("list_id", col("__best.cid"))
      .drop("__best", "__cents")
  }

  /** Deterministic k-means centroids in quantized int64 milli-units.
    * Returns `nCentroids` arrays (may be fewer if the corpus is tiny).
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iterations: Int = 3): Array[Array[Long]] = {
    // no persist: train makes exactly ONE pass over the corpus (the
    // bounded sample selection) since the Lloyd loop went driver-local
    val q = corpus
      .select(col(idCol).as("id"), CosineSim.quantize(col(vecCol)).as("qv"))
    train(q, nCentroids, iterations)
  }

  /** Per-centroid training points: 256 (FAISS's `cp.max_points_per_
    * centroid` default), floored at 4096 total so tiny centroid counts
    * still train on a stable set.
    */
  private[sim] val TrainPointsPerCentroid = 256
  private[sim] val TrainSampleFloor = 4096

  /** Coarse-quantizer contract: [[assignLists]]' per-row argmin fold is
    * interpreted, so its cost is C struct comparisons per vector — fine
    * while C stays coarse, quadratic misuse if someone reaches for IVF
    * with fine-quantizer centroid counts. Guarded, not just documented.
    */
  val MaxCentroids = 4096

  /** Lloyd loop over an already-quantized, persisted `(id, qv)` table.
    *
    * Trains on a BOUNDED deterministic sample, not the corpus: a
    * coarse quantizer is a model-sized object (C centroids), and
    * `max(256·C, 4096)` points pin it as well as 10⁹ would — k-means
    * quality depends on points-per-centroid, not corpus size (FAISS
    * caps training at 256 points/centroid for the same reason). This
    * turns training cost from `iterations` full-corpus passes into ONE
    * corpus pass (the top-N-by-hash selection) plus iterations over a
    * driver-bounded set — at 100 TB the difference between hours and
    * seconds. Selection is `TakeOrderedAndProject` on `xxhash64(id)`
    * (per-partition top-N, then merge — no full sort, no full
    * shuffle), so the sample is reproducible run-to-run and
    * corpus-order-independent; when the corpus fits the cap the sample
    * IS the corpus and training is bit-identical to the unsampled
    * form (which keeps the DuckDB replay oracle exact at test scale).
    */
  private[sim] def train(
      q: DataFrame, nCentroids: Int, iterations: Int): Array[Array[Long]] = {
    require(nCentroids >= 1 && nCentroids <= MaxCentroids,
      s"nCentroids=$nCentroids outside [1, $MaxCentroids]: IvfAnn is a " +
        "coarse quantizer (interpreted per-row argmin over C centroids)")
    val cap = math.max(TrainPointsPerCentroid * nCentroids, TrainSampleFloor)
    // ONE Spark action: the hash-ordered top-N selection
    // (TakeOrderedAndProject — per-partition top-N then merge, no full
    // sort) lands the ENTIRE bounded sample on the driver — it is a
    // model-sized object by construction (≤ max(256·C, 4096) rows,
    // ~2 MB at dim 64), the same bound that already justified the
    // per-iteration centroid collects. The Lloyd loop then runs as
    // driver-local integer arithmetic: zero per-iteration Spark jobs,
    // where the previous shape paid persist + (assign + agg + collect)
    // per iteration — 4-5 fixed-latency jobs per train call
    // (optimization guide §1.2: fix the distributed algorithm first;
    // a bounded model fit is driver work, like building a broadcast).
    // The arithmetic REPLAYS the distributed form exactly — ascending
    // cid visit order with replace-on-strictly-smaller (ties keep the
    // lower cid), s = -(dot as double)/cnorm with cnorm =
    // sqrt(Σ c_d²) in doubles, exact int64 sums, truncating integer
    // mean, empty clusters dropped and renumbered by ascending old cid
    // — so centroids are bit-for-bit what the Spark-side loop produced
    // and every oracle replay still matches.
    // the id is read GENERICALLY (not getLong): public callers may
    // carry int/string id columns; the smallest-id init sort below
    // uses the Spark-equivalent ordering for the column's type
    // (ValueOrdering — unsigned UTF-8 bytes for strings), so init
    // centroids match what a Spark-side orderBy(id) would pick.
    implicit val idOrd: Ordering[Any] =
      graft.functions.ValueOrdering.forType(q.schema("id").dataType)
        .getOrElse(throw new IllegalArgumentException(
          s"id column type ${q.schema("id").dataType} has no " +
            "driver-side ordering; use an integral or string id"))
    val sample: Array[(Any, Array[Long])] =
      q.orderBy(xxhash64(col("id")), col("id")).limit(cap)
        .collect().map(r => (r.get(0), r.getSeq[Long](1).toArray))
    var centroids: Array[Array[Long]] =
      sample.sortBy(_._1).take(nCentroids).map(_._2)
    val dim = centroids.head.length
    for (_ <- 1 to iterations) {
      val cnorms = centroids.map(c =>
        math.sqrt(c.map(x => x.toDouble * x.toDouble).sum))
      // per-cluster accumulators keyed by assigned cid
      val counts = scala.collection.mutable.HashMap.empty[Int, Long]
      val sums = scala.collection.mutable.HashMap.empty[Int, Array[Long]]
      sample.foreach { case (_, v) =>
        var best = Double.PositiveInfinity
        var bestCid = -1
        var c = 0
        while (c < centroids.length) {
          val cv = centroids(c)
          var dot = 0L
          var d = 0
          while (d < dim) { dot += v(d) * cv(d); d += 1 }
          val s = -dot.toDouble / cnorms(c)
          if (s < best) { best = s; bestCid = c }
          c += 1
        }
        counts.update(bestCid, counts.getOrElse(bestCid, 0L) + 1L)
        val acc = sums.getOrElseUpdate(bestCid, new Array[Long](dim))
        var d = 0
        while (d < dim) { acc(d) += v(d); d += 1 }
      }
      // exact integer mean per dimension: sum in int64, divide by count
      centroids = counts.keys.toArray.sorted.map { cid =>
        val n = counts(cid)
        val s = sums(cid)
        Array.tabulate(dim)(d => s(d) / math.max(n, 1L))
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
