package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** SimHash near-duplicate detection (Charikar): a 32-bit signature whose
  * Hamming distance approximates token-multiset similarity.
  *
  * Signature: for each bit position b, sum +1/−1 over the document's
  * token hashes depending on bit b of the hash; bit b of the signature
  * is the sign of the sum. Computed as 32 conditional-sum aggregates in
  * ONE pass over the exploded token table — no per-bit explode, so the
  * shuffle is one row per document.
  *
  * Pairing uses the pigeonhole trick: split the 32-bit signature into 4
  * byte-chunks; any pair within Hamming distance ≤ 3 must agree on at
  * least one full chunk, so an equi-join per chunk finds all such pairs
  * without an all-pairs scan. Exact distance is then `bit_count(xor)`.
  */
object SimHash {

  /** (idCol, simhash) — one row per document. */
  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col(idCol), Shingles.baseHash(col("tok")).as("h"))
    val bitSums = tok.groupBy(col(idCol)).agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as("s0"),
      (1 until 32).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"s$b")): _*)
    val sig = (0 until 32).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    bitSums.select(col(idCol), sig.as("simhash"))
  }

  /** Pairs (a < b) with Hamming distance ≤ maxHamming (≤ 7 with 4
    * chunks by pigeonhole; default threshold 3).
    */
  def nearPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = signatures(df, idCol, textCol)
    // one posexplode, not a 4-branch union: all chunks ride a single
    // exchange into the pair join (same shape as MinHashLSH.candidates)
    val chunks = sig.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 8).bitwiseAND(lit(255L))): _*)))
      .withColumnRenamed("pos", "chunk_no")
      .withColumnRenamed("col", "chunk")
    // exact popcount BEFORE the distinct (the SignatureDedup.matchedUnits
    // rule): the filter is a codegen'd bit_count per collision row and
    // commutes with distinct, so the distinct's exchange carries only
    // the PASSING pairs — candidate collisions outnumber true pairs by
    // the chunk-collision rate (guide §2.3: shuffle fewer bytes)
    chunks.as("x").join(chunks.as("y"),
      col("x.chunk_no") === col("y.chunk_no") &&
        col("x.chunk") === col("y.chunk") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .filter(bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
        <= maxHamming)
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        col("x.simhash").as("sig_a"), col("y.simhash").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .select("a", "b", "sig_a", "sig_b", "hamming")
  }
}
