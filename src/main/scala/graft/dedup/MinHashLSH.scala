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

  /** Candidate pairs (a < b) with the number of colliding bands. */
  def candidates(
      sig: DataFrame, idCol: String, k: Int, bands: Int,
      maxBucketSize: Int = 1000): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val perBand = (0 until bands).map { j =>
      val sigCols = (j * r until (j + 1) * r).map(i => col(s"mh$i"))
      val bucketed = sig.select(col(idCol),
        concat_ws("-", sigCols: _*).as("bucket"))
      // hot-bucket cap via window count (measured faster here than an
      // aggregate + semi-join variant — the window rides the same
      // bucket-hash exchange the pair join needs anyway)
      val capped = bucketed.withColumn("bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
        .filter(col("bsz") <= maxBucketSize)
        .drop("bsz")
      capped.as("x").join(capped.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
        .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
    }
    perBand.reduce(_ unionByName _)
      .groupBy("a", "b").agg(count(lit(1)).as("bands_hit"))
  }

  /** Full near-dup pipeline: LSH candidates verified by exact integer
    * Jaccard ≥ num/den. Output: (a, b, bands_hit, inter_size, a_size,
    * b_size), all integers.
    */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      k: Int, bands: Int, num: Int, den: Int): DataFrame = {
    val sh = Shingles.shingleHashes(df, idCol, textCol, n)
    // NOT checkpointed: the band branches are identical subplans and
    // Catalyst already shares their shuffle via ReusedExchange —
    // measured, an eager materialization here is strictly slower
    val sig = signatures(sh, idCol, k)
    val cand = candidates(sig, idCol, k, bands)
    val sizes = sig.select(col(idCol), col("sz"))
    // equi-join on (b, h): each of a's shingles matches b's equal
    // shingle directly — never the |A|·|B| per-pair cross product
    val inter = cand.join(sh.withColumnRenamed(idCol, "a"), "a")
      .join(sh.withColumnRenamed(idCol, "b"), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter_size"))
    cand.join(inter, Seq("a", "b"))
      .join(sizes.withColumnRenamed(idCol, "a").withColumnRenamed("sz", "a_size"), "a")
      .join(sizes.withColumnRenamed(idCol, "b").withColumnRenamed("sz", "b_size"), "b")
      .filter(lit(den.toLong) * col("inter_size") >=
        lit(num.toLong) * (col("a_size") + col("b_size") - col("inter_size")))
      .select("a", "b", "bands_hit", "inter_size", "a_size", "b_size")
  }
}
