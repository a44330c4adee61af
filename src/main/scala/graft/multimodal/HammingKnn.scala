package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HAMMING-SPACE k-NN over 64-bit perceptual fingerprints —
  * multi-index hashing (Norouzi, Punjani & Fleet, Fast Search in
  * Hamming Space with Multi-Index Hashing, CVPR 2012): the retrieval
  * counterpart of the dedup blocking. Each `bandBits`-bit substring of
  * the fingerprint is an inverted index; a query probes each of its
  * substrings' postings, and for search radius `r < bands` the
  * pigeonhole principle makes the candidate union EXACT — every
  * fingerprint within `r` shares at least one substring with the
  * query, so radius-bounded k-NN returns exactly what a brute-force
  * scan would.
  *
  * Spark shape: probes band-explode and equi-join the band-exploded
  * index on (band, value) — probe postings-lookup as a hash join, no
  * per-query loop — then exact XOR-popcount re-check, then a bounded
  * top-k aggregate ([[graft.functions.HammingTopKAgg]]) whose map-side
  * partials carry at most k rows per (probe, partition) into the
  * shuffle (a window rank would sort the full candidate set). At
  * 100 TB: the index side is the big table, hash-partitioned by band
  * value; the probe side is small and broadcastable; candidates per
  * probe are governed by band selectivity (`~ 4·N/2^16` at 16-bit
  * bands — the documented knob, same trade as the dedup blocking).
  */
object HammingKnn {

  /** The k nearest fingerprints (exact Hamming, `ham ASC, id ASC`)
    * within `radius` of each probe, self excluded. Emits
    * `(probe_id, neighbor_id, hamming, rnk)`; probes with no neighbor
    * inside the radius emit nothing. `radius < 64/bandBits` keeps the
    * pigeonhole exact.
    */
  def knnWithinRadius(hashes: DataFrame, probes: DataFrame, idCol: String,
      k: Int, radius: Int, bandBits: Int = 16): DataFrame = {
    ImageDedup.requireExactPigeonhole(radius, bandBits)
    require(k >= 1, s"k=$k must be >= 1")
    val idx = ImageDedup.bandExploded(
      hashes.select(col(idCol), col("h_hi"), col("h_lo")), bandBits)
    val q = ImageDedup.bandExploded(
      probes.select(col(idCol), col("h_hi"), col("h_lo")), bandBits)
      .select(col(idCol).as("probe_id"), col("h_hi").as("qhi"),
        col("h_lo").as("qlo"), col("band"), col("bv"))
    val cands = q.join(idx, Seq("band", "bv"))
      .filter(col("probe_id") =!= col(idCol))
      .select(col("probe_id"), col(idCol).as("nn_id"),
        col("qhi"), col("qlo"), col("h_hi"), col("h_lo"))
      .distinct() // fingerprints sharing several bands are one candidate
      .withColumn("hamming",
        (bit_count(col("qhi").bitwiseXOR(col("h_hi"))) +
          bit_count(col("qlo").bitwiseXOR(col("h_lo")))).cast("long"))
      .filter(col("hamming") <= radius)
    topKFinish(cands, k)
  }

  /** The shared bounded top-k finisher over scored candidates
    * `(probe_id, nn_id, hamming)`: [[graft.functions.HammingTopKAgg]]
    * partials carry at most k rows per (probe, partition) into the
    * shuffle, then rank positions explode out. Used by both band
    * widths and the persisted-index retrieval path.
    */
  private[graft] def topKFinish(scored: DataFrame, k: Int): DataFrame = {
    val topK = graft.functions.HammingTopKAgg(k)
    scored.groupBy("probe_id")
      .agg(topK(col("hamming"), col("nn_id")).as("hits"))
      .select(col("probe_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("probe_id"), col("hit.nnId").as("neighbor_id"),
        col("hit.ham").as("hamming"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** 256-BIT variant over `(idCol, fp array<bigint>)` limb
    * fingerprints ([[ImageDedup.dHash256]]) — multi-index hashing's
    * home configuration (Norouzi et al. evaluate 64–256-bit codes;
    * longer codes are WHY the multi-index exists): 16 limb-bands admit
    * radii up to 15, candidates block on (band, limb) equality at the
    * same sampled substring, the exact distance is XOR+popcount over
    * the PACKED fingerprint words carried through the postings join
    * (the [[ImageDedup.nearDupPairs256]] plan shape — the previous
    * relational limb re-join cost two extra exchanges per probe set),
    * and the same bounded top-k finishes.
    */
  def knnWithinRadius256(hashes: DataFrame, probes: DataFrame,
      idCol: String, k: Int, radius: Int): DataFrame = {
    require(radius >= 0 && radius < 16,
      s"radius=$radius: the 16-limb pigeonhole is exact only below 16")
    require(k >= 1, s"k=$k must be >= 1")
    val idxLimbs = hashes.select(
      (col(idCol) +: ImageDedup.packedFp256(col("fp"), "n")) :+
        posexplode(col("fp")).as(Seq("band", "bv")): _*)
    val qLimbs = probes.select(
      (col(idCol).as("probe_id") +: ImageDedup.packedFp256(col("fp"), "q")) :+
        posexplode(col("fp")).as(Seq("band", "bv")): _*)
    val scored = qLimbs.join(idxLimbs, Seq("band", "bv"))
      .filter(col("probe_id") =!= col(idCol))
      .select(Seq(col("probe_id"), col(idCol).as("nn_id")) ++
        (0 until 4).map(j => col(s"q$j")) ++
        (0 until 4).map(j => col(s"n$j")): _*)
      .distinct() // fingerprints sharing several bands are one candidate
      .withColumn("hamming", ImageDedup.packedHamming(
        (0 until 4).map(j => col(s"q$j")),
        (0 until 4).map(j => col(s"n$j"))))
      .filter(col("hamming") <= radius)
      .select("probe_id", "nn_id", "hamming")
    topKFinish(scored, k)
  }
}
