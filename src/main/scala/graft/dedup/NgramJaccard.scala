package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity over word-shingle sets.
  *
  * Pair generation joins the exploded shingle table with itself on the
  * shingle hash, so only pairs sharing ≥1 shingle ever materialize —
  * the all-pairs cross product never exists. Thresholding is pure
  * integer arithmetic (`den·inter ≥ num·union`), so the oracle compares
  * exactly with no float in sight.
  *
  * Scale: this is the VERIFY stage of a near-dup pipeline. Run it on
  * candidate pairs from [[MinHashLSH]] at 100 TB (the shared-shingle
  * join alone explodes on common shingles); document-frequency pruning
  * of stop-shingles (drop shingles appearing in >f% of docs) bounds the
  * join fan-out — exposed via `maxShingleDf`.
  */
object NgramJaccard {

  /** Bounded (session, shingle-plan) → persisted shingle frame — see
    * the note at the use site. */
  private val shingleCache = new graft.ops.KeyedFrameCache(4)

  /** Pairs (a < b) with Jaccard ≥ num/den, as exact integers:
    * `(a, b, inter_size, a_size, b_size)`.
    *
    * @param maxShingleDf drop shingles occurring in more than this many
    *                     documents before pairing (0 = keep all)
    */
  def similarPairs(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      num: Int, den: Int, maxShingleDf: Int = 0): DataFrame = {
    // The shingle frame feeds THREE subplans (per-doc sizes + both
    // pair-join sides), so uncached the sha2 shingle scan ran ~3x per
    // query — the KeyedFrameCache rule every other multi-branch frame
    // here follows, and exactly the "materialized intermediate" the
    // 100 TB note below this operator always promised. Bounded cache
    // (LRU unpersist, plan-hash keyed), so repeated calls share one
    // scan and distinct inputs cannot accrete pinned blocks.
    val sh = NgramJaccard.shingleCache.get(df.sparkSession,
      "sh#" + java.util.Objects.hash(
        Integer.valueOf(n), idCol, textCol,
        Integer.valueOf(df.queryExecution.analyzed.semanticHash()))) {
      Shingles.shingleHashes(df, idCol, textCol, n)
    }
    val pruned =
      if (maxShingleDf <= 0) sh
      else {
        val hot = sh.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf).select("h")
        sh.join(hot, Seq("h"), "left_anti")
      }
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = pruned.as("x").join(pruned.as("y"), col("x.h") === col("y.h"))
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .agg(count(lit(1)).as("inter_size"))
    // NOTE (optimization round 17, measured): broadcasting the pair
    // side through the size lookups — MinHashLSH.nearDuplicates' shape
    // — REGRESSED here (1.94 -> 3.72 s at sf0.1, tight spreads): the
    // two nested broadcast builds re-executed the then-unpersisted
    // shingle self-join serially through the driver, where the shuffle
    // joins below share `sh`'s exchanges. Round 18 persisted `sh`
    // (above), which removes the re-execution but not the serial
    // broadcast-build latency; the shuffle-join shape stays.
    inter
      .join(sizes.withColumnRenamed(idCol, "a").withColumnRenamed("sz", "a_size"), "a")
      .join(sizes.withColumnRenamed(idCol, "b").withColumnRenamed("sz", "b_size"), "b")
      // jaccard = inter/(a+b-inter) ≥ num/den  ⇔  den·inter ≥ num·(a+b-inter)
      .filter(lit(den.toLong) * col("inter_size") >=
        lit(num.toLong) * (col("a_size") + col("b_size") - col("inter_size")))
      .select("a", "b", "inter_size", "a_size", "b_size")
  }
}
