package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Pipeline (the standard shingle → minhash → band → bucket-join shape):
  *  1. distinct word-shingle hashes per doc ([[Shingles]]);
  *  2. k-element MinHash signature: `min(g_i(h))` per doc for k
  *     deterministic rehashes — computed as k parallel `min` aggregates
  *     over ONE pass of the shingle table (no k-fold explode);
  *  3. split the signature into `bands` bands of `rowsPerBand`, hash
  *     each band; docs sharing any band bucket become candidates;
  *  4. candidates are verified with exact integer Jaccard (same
  *     predicate as [[NgramJaccard]]).
  *
  * Scale shape: stage 2 is a single hash-partitioned aggregation on
  * doc id (map-side combine on k mins). Stage 3's self-join per band is
  * bucket-sized — the whole point of LSH is that buckets are tiny; a
  * hot bucket (all-identical boilerplate docs) is capped by
  * `maxBucketSize` to keep the join quadratic only locally.
  */
object MinHashLSH {

  /** MinHash signatures: one row per doc, columns mh0..mh{k-1}, plus
    * the shingle-set size `sz` — one aggregation pass produces both
    * (the Jaccard verify needs sizes anyway; a second groupBy over the
    * shingle table would re-execute the whole shingling scan).
    */
  def signatures(sh: DataFrame, idCol: String, k: Int): DataFrame =
    sh.groupBy(col(idCol))
      .agg(
        min(Shingles.rehash(col("h"), 0)).as("mh0"),
        (1 until k).map(i => min(Shingles.rehash(col("h"), i)).as(s"mh$i")) :+
          count(lit(1)).as("sz"): _*)

  /** The exploded `(idCol, band_no, bucket)` band-bucket rows of a
    * signature frame — the unit both the in-corpus self-join
    * ([[candidates]]) and the persistent-index batch join
    * ([[CorpusDedupIndex]]) match on.
    */
  def bandRows(sig: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val bandStructs = (0 until bands).map { j =>
      val sigCols = (j * r until (j + 1) * r).map(i => col(s"mh$i"))
      struct(lit(j).as("band_no"), concat_ws("-", sigCols: _*).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band_no").as("band_no"),
        col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs (a < b) with the number of colliding bands.
    *
    * All bands live in ONE exploded `(id, band_no, bucket)` table, so
    * the plan has a single exchange on the bucket key that both the
    * hot-bucket cap window and the pair self-join ride — versus a
    * per-band union of window+join branches, which costs `bands`
    * separate shuffles (measured 2× slower at sf0.1).
    */
  def candidates(
      sig: DataFrame, idCol: String, k: Int, bands: Int,
      maxBucketSize: Int = 1000): DataFrame = {
    val banded = bandRows(sig, idCol, k, bands)
    // hot-bucket cap via window count: the window's
    // partitionBy(band_no, bucket) exchange is exactly the join's
    // distribution, so Catalyst reuses it (one shuffle total)
    val capped = banded.withColumn("bsz",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("band_no", "bucket")))
      .filter(col("bsz") <= maxBucketSize)
      .drop("bsz")
    capped.as("x").join(capped.as("y"),
      col("x.band_no") === col("y.band_no") &&
        col("x.bucket") === col("y.bucket") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("bands_hit"))
  }

  /** Full near-dup pipeline: LSH candidates verified by exact integer
    * Jaccard ≥ num/den. Output: (a, b, bands_hit, inter_size, a_size,
    * b_size), all integers.
    */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      k: Int, bands: Int, num: Int, den: Int): DataFrame = {
    // persisted: the shingle table feeds three separate shuffle paths
    // (signature agg, intersection join ×2) that would otherwise each
    // re-run the scan + explode + sha2 subtree
    val sh = Shingles.shingleHashes(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = signatures(sh, idCol, k)
    val cand = candidates(sig, idCol, k, bands)
    val sizes = sig.select(col(idCol), col("sz"))
    // the candidate set is tiny relative to the corpus (that is LSH's
    // whole point), so it broadcasts: the big shingle table is never
    // re-shuffled for the expansion join. The (b, h) equi-join then
    // matches each of a's shingles to b's equal shingle directly —
    // never the |A|·|B| per-pair cross product.
    val inter = sh.withColumnRenamed(idCol, "a").join(broadcast(cand), "a")
      .join(sh.withColumnRenamed(idCol, "b"), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter_size"),
        first(col("bands_hit")).as("bands_hit"))
    // inter inherits cand's smallness: broadcast the pair side through
    // both per-doc size lookups so `sizes` (per-doc — big at scale)
    // streams without a shuffle
    val withA = sizes.withColumnRenamed(idCol, "a")
      .withColumnRenamed("sz", "a_size")
      .join(broadcast(inter), "a")
    sizes.withColumnRenamed(idCol, "b").withColumnRenamed("sz", "b_size")
      .join(broadcast(withA), "b")
      .filter(lit(den.toLong) * col("inter_size") >=
        lit(num.toLong) * (col("a_size") + col("b_size") - col("inter_size")))
      .select("a", "b", "bands_hit", "inter_size", "a_size", "b_size")
      // the verified pair list is tiny and consumed by several
      // downstream operators (clustering, cleaning, reporting) — and
      // Spark's cache manager keys on the logical plan, so every
      // pipeline that recomputes the same near-dup call shares ONE
      // execution per session
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }
}
