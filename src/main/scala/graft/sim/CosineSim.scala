package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity in fixed-point integer arithmetic.
  *
  * Floats are quantized once to integer milli-units
  * (`round(x·1000) : BIGINT`); dot products and squared norms are then
  * EXACT int64 sums (unit-norm dim-64 vectors ⇒ dot ≤ ~1e6, norms ≤
  * ~1e6 — far inside both int64 and double's 53-bit exact range), so
  * Spark and any oracle engine agree bit-for-bit, and cosine
  * thresholds become pure integer predicates:
  * `cos ≥ t  ⇔  dot ≥ 0 ∧ dot²·den² ≥ num²·na·nb`.
  *
  * Scale notes: [[bruteForceTopK]] broadcasts the (small) query set and
  * scans the corpus once — the right baseline shape. [[signBuckets]]
  * gives the LSH path: bucket by the sign pattern of d deterministic
  * pseudo-hyperplanes, search only matching buckets (see AnnLsh).
  */
object CosineSim {

  /** `array<long>` milli-quantized embedding — codegen'd single loop,
    * not an interpreted `transform` lambda (this runs on every corpus
    * row of every similarity operator; see
    * [[graft.functions.QuantizeMilli]]).
    */
  def quantize(vec: Column): Column =
    graft.functions.QuantizeMilli(vec.cast("array<double>"))

  /** Exact int64 dot product of two quantized vectors — a native
    * codegen'd expression, NOT `aggregate(zip_with(...))`: interpreted
    * higher-order functions are ~5× slower in the all-pairs hot loop
    * (see [[graft.functions.LongArrayDot]]).
    */
  def dotQ(a: Column, b: Column): Column = graft.functions.LongArrayDot(a, b)

  /** Exact int64 squared norm of a quantized vector. */
  def normQ(a: Column): Column = graft.functions.LongArrayDot(a, a)

  /** Pairs (a < b) with cosine ≥ num/den, exact integer predicate.
    * Norms are computed ONCE per vector before the join — never inside
    * the pair loop. `blockCol`: optional coarse blocking column (e.g.
    * label or LSH bucket) — at scale the all-pairs join must be blocked.
    */
  def similarPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      num: Long, den: Long, blockCol: Option[String] = None): DataFrame = {
    val q = emb.select(col(idCol) +: blockCol.map(col).toSeq :+
      quantize(col(vecCol)).as("q"): _*)
      .withColumn("nrm", normQ(col("q")))
    val joinCond = blockCol
      .map(bc => col(s"x.$bc") === col(s"y.$bc"))
      .getOrElse(lit(true)) && col(s"x.$idCol") < col(s"y.$idCol")
    q.as("x").join(q.as("y"), joinCond)
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        dotQ(col("x.q"), col("y.q")).as("dot"),
        col("x.nrm").as("na"), col("y.nrm").as("nb"))
      .filter(col("dot") >= 0 &&
        col("dot") * col("dot") * lit(den * den) >= lit(num * num) * col("na") * col("nb"))
  }

  /** Blocked (multi-table sign-LSH) near-duplicate pairs — the shape
    * [[similarPairs]]'s all-pairs self-join cannot take at 100 TB.
    * Every vector lands in `tables` buckets (one per independent
    * hyperplane set, same deterministic integer family as [[AnnLsh]]);
    * candidate pairs arise ONLY inside a matching (table, bucket) — an
    * equi-join whose cost is Σ bucket², never n² — then are verified
    * with the exact integer cosine predicate, so the result is the
    * subset of [[similarPairs]]'s pairs whose vectors collide in ≥1
    * table (recall 1−(1−s^planes)^tables: steep at near-dup
    * thresholds). The hyperplanes and the cap are deterministic, so an
    * oracle replays the blocking bit-for-bit. `maxBucketSize` bounds
    * adversarial skew (identical-embedding floods) exactly like
    * [[graft.dedup.MinHashLSH.candidates]]'s hot-bucket cap: those
    * floods are what exact dedup already removes upstream.
    */
  /** The shared sign-LSH bucketing pass: `(idCol, q, nrm, tb)` with
    * every vector exploded into its `tables` (table, bucket) structs,
    * hot buckets capped. Hyperplane weights depend only on (dimension,
    * plane index): materialized once driver-side as literal arrays so
    * each sign bit is one codegen'd LongArrayDot, not an interpreted
    * fold (AnnLsh measured ~5× on exactly this hashing pass). The
    * hot-bucket cap runs via a window count whose partitionBy(tb)
    * exchange is exactly the downstream pair join's distribution, so
    * the shuffle is shared.
    */
  /** The shared deterministic integer hyperplane:
    * `p_j[d] = ((2654435761·(d+1)·(j+1) + 40503·(j+1)) mod 2001) − 1000`
    * — one source of truth for every sign-LSH consumer (here, AnnLsh,
    * [[SemDedupIndex]]) and the SQL replays.
    */
  private[graft] def planeVector(dim: Int, plane: Int): Array[Long] =
    Array.tabulate(dim) { i =>
      ((2654435761L * (i + 1) * (plane + 1) + 40503L * (plane + 1)) % 2001L) - 1000L
    }

  /** UNCAPPED flat sign-LSH bucket rows for an ALREADY-QUANTIZED frame
    * carrying a `q` (`array<long>`) column: every input row explodes
    * into `tables` rows with integer columns `(t, b)` appended; all
    * other columns pass through. Capping is the caller's policy — an
    * incremental index caps its (small) arriving batch but not the
    * accreted corpus side (the [[graft.dedup.CorpusDedupIndex]] rule),
    * whereas the one-shot operators cap everything via the window in
    * `signBuckets`.
    */
  private[graft] def signBucketRowsQ(
      q: DataFrame, dim: Int, planes: Int, tables: Int): DataFrame = {
    // `dim` kept for signature stability but no longer needed at plan
    // time: the codegen'd SignBuckets expression reads the dimension
    // off each row's array, replacing tables×planes literal-hyperplane
    // LongArrayDot columns (a plan-size and analysis-time tax on every
    // query construction) with ONE plan node — the values are pinned
    // identical to the planeVector closed form by CosineSimSpec.
    val _ = dim
    q.select(q.columns.map(col) :+
      posexplode(graft.functions.SignBuckets(col("q"), planes, tables))
        .as(Seq("t", "b")): _*)
  }

  private def signBuckets(
      emb: DataFrame, idCol: String, vecCol: String,
      planes: Int, tables: Int, maxBucketSize: Int,
      extraCols: Seq[String] = Nil): DataFrame = {
    // ONE codegen'd SignBuckets node replaces tables×planes literal-
    // hyperplane dot columns (identical values — the expression builds
    // its weight matrix from the same planeVector closed form) and
    // with it the `select(size(vec)).head` dim-probe job the literal
    // form needed per call.
    val q = emb.select(col(idCol) +: extraCols.map(col) :+
      quantize(col(vecCol)).as("q"): _*)
      .withColumn("nrm", normQ(col("q")))
    // extra scoping columns join the bucket identity: the cap window's
    // partition is exactly the downstream pair join's distribution
    // (the shared-exchange rule), with or without them
    q.select(q.columns.map(col) :+
        posexplode(graft.functions.SignBuckets(col("q"), planes, tables))
          .as(Seq("__t", "__b")): _*)
      .withColumn("tb", struct(col("__t").as("t"), col("__b").as("b")))
      .drop("__t", "__b")
      .withColumn("bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy((extraCols :+ "tb").map(col): _*)))
      .filter(col("bsz") <= maxBucketSize)
      .drop("bsz")
  }

  def blockedSimilarPairs(
      emb: DataFrame, idCol: String, vecCol: String, num: Long, den: Long,
      planes: Int = 8, tables: Int = 4, maxBucketSize: Int = 1000): DataFrame = {
    val capped = signBuckets(emb, idCol, vecCol, planes, tables, maxBucketSize)
    capped.as("x").join(capped.as("y"),
        col("x.tb") === col("y.tb") && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        dotQ(col("x.q"), col("y.q")).as("dot"),
        col("x.nrm").as("na"), col("y.nrm").as("nb"))
      .filter(col("dot") >= 0 &&
        col("dot") * col("dot") * lit(den * den) >= lit(num * num) * col("na") * col("nb"))
      // a pair can collide in several tables; dot/na/nb are pure
      // functions of the pair, so the kept row is deterministic
      .dropDuplicates("a", "b")
  }

  /** SemDeDup's pair half (Abbas et al.: k-means the corpus, then
    * near-dedup WITHIN each cluster): [[blockedSimilarPairs]] SCOPED
    * by `withinCol` — a candidate pair must share the scope value AND
    * an LSH (table, bucket), so cross-scope pairs are never even
    * generated. The scope column joins the bucket identity end to end
    * (hot-bucket cap included), which is exactly what makes 100 TB
    * semantic dedup tractable: the quadratic term drops from
    * Σ bucket² to Σ (bucket ∩ cluster)², and each cluster's work is
    * independent — the published recipe sizes k so clusters fit a
    * worker's neighborhood. Emits the [[blockedSimilarPairs]] contract
    * `(a, b, dot, na, nb)`.
    */
  def blockedSimilarPairsWithin(
      emb: DataFrame, idCol: String, vecCol: String, withinCol: String,
      num: Long, den: Long, planes: Int = 8, tables: Int = 4,
      maxBucketSize: Int = 1000): DataFrame = {
    val capped = signBuckets(emb, idCol, vecCol, planes, tables,
      maxBucketSize, extraCols = Seq(withinCol))
    capped.as("x").join(capped.as("y"),
        col(s"x.$withinCol") === col(s"y.$withinCol") &&
          col("x.tb") === col("y.tb") && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        dotQ(col("x.q"), col("y.q")).as("dot"),
        col("x.nrm").as("na"), col("y.nrm").as("nb"))
      .filter(col("dot") >= 0 &&
        col("dot") * col("dot") * lit(den * den) >= lit(num * num) * col("na") * col("nb"))
      .dropDuplicates("a", "b")
  }

  /** SEMANTIC DECONTAMINATION flags: the BIPARTITE form of
    * [[blockedSimilarPairs]] — distinct ids of `pred=false` ("train")
    * vectors whose cosine to ANY `pred=true` ("eval") vector passes
    * `num/den`, found through the same shared sign-LSH buckets (both
    * sides hash in ONE pass, the cap sees the union, candidates arise
    * only inside a matching bucket). Anti-join the result against the
    * train side to drop eval-contaminated training rows — the
    * embedding-level complement of n-gram
    * [[graft.text.Decontaminate]].
    */
  def crossContaminatedIds(
      emb: DataFrame, idCol: String, vecCol: String, evalPred: Column,
      num: Long, den: Long, planes: Int = 8, tables: Int = 4,
      maxBucketSize: Int = 1000): DataFrame = {
    val capped = signBuckets(emb, idCol, vecCol, planes, tables, maxBucketSize)
    capped.filter(!evalPred).as("x")
      .join(capped.filter(evalPred).as("y"), col("x.tb") === col("y.tb"))
      .filter(dotQ(col("x.q"), col("y.q")) >= 0 &&
        dotQ(col("x.q"), col("y.q")) * dotQ(col("x.q"), col("y.q")) *
          lit(den * den) >= lit(num * num) * col("x.nrm") * col("y.nrm"))
      .select(col(s"x.$idCol").as(idCol)).distinct()
  }

  /** Shared top-k finisher for the similarity operators: bounded-heap
    * aggregate ([[graft.functions.TopKAgg]]) instead of a
    * window — map-side partials carry at most k rows per (query,
    * partition) into the shuffle, where the window would shuffle+sort
    * EVERY candidate. Exact duplicate candidates (same pair reached
    * via several LSH tables) collapse inside the buffer. Input needs
    * (q_id, nn_id, dot, na, nb, sim); output is the operator contract
    * `(q_id, rank, nn_id, dot, na, nb)` ranked `sim DESC, nn_id ASC`.
    */
  private[sim] def finishTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = graft.functions.TopKAgg(k)
    scored.groupBy("q_id")
      .agg(topk(col("sim"), col("nn_id"), col("dot"), col("na"), col("nb")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.nnId").as("nn_id"), col("col.dot").as("dot"),
        col("col.na").as("na"), col("col.nb").as("nb"))
  }

  /** Brute-force cosine top-k: exact baseline for ANN. Query set =
    * `queries` (small, broadcast); ranking is by the deterministic
    * double `dot/√(na·nb)` with id tie-break, but emitted columns are
    * the exact integers.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), quantize(col(vecCol)).as("cq"))
      .withColumn("nb", normQ(col("cq")))
    val qs = queries.select(col(idCol).as("q_id"), quantize(col(vecCol)).as("qq"))
      .withColumn("na", normQ(col("qq")))
    val scored = c.join(broadcast(qs), col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"),
        dotQ(col("qq"), col("cq")).as("dot"), col("na"), col("nb"))
      .withColumn("sim",
        col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
    finishTopK(scored, k)
  }

  /** Sign-LSH bucket id: bit j = sign of <v, p_j> for `planes`
    * deterministic pseudo-hyperplanes
    * `p_j[d] = ((2654435761·(d+1)·(j+1) + 40503·(j+1)) mod 2001) − 1000`
    * (integer-valued, so the projection of a quantized vector is an
    * exact int64).
    */
  def signBucket(qvec: Column, planes: Int): Column = {
    val proj = (0 until planes).map { j =>
      val dot = aggregate(
        zip_with(qvec, sequence(lit(1), size(qvec)), (x, d) =>
          x * ((lit(2654435761L) * d.cast("long") * lit(j + 1L) +
            lit(40503L) * lit(j + 1L)) % 2001L - 1000L)),
        lit(0L), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    proj.reduce(_ + _)
  }
}
