package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Shingling + the deterministic hash family shared by all near-dup
  * operators (MinHash, SimHash, n-gram Jaccard).
  *
  * Design constraints:
  *  - must be reproducible in ANSI SQL (the DuckDB oracle recomputes
  *    every hash), so no engine-private hash functions (xxhash64 etc.);
  *  - must be overflow-safe: Spark 4 runs ANSI mode, where silent int64
  *    wraparound is an ERROR, so the rehash family works on 30-bit
  *    halves with small multipliers (max intermediate ≈ 2^57).
  */
object Shingles {

  /** 60-bit base hash of a string: first 15 hex chars of sha2-256.
    * DuckDB equivalent: `CAST('0x' || substr(sha256(s),1,15) AS BIGINT)`.
    */
  def baseHash(s: Column): Column =
    conv(substring(sha2(s, 256), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles (space-joined), empty array when the document
    * has fewer than n tokens. Array-valued convenience form; the hot
    * path is [[shingleHashes]], which never builds this array — the
    * higher-order `transform` lambda is evaluated interpreted (outside
    * whole-stage codegen) and measured 15–35× slower than the
    * explode-index formulation below.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j + 1))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** One row per DISTINCT shingle hash per document:
    * `(idCol, shingle_hash)`. The distinct matters: Jaccard and MinHash
    * are defined over shingle SETS.
    *
    * Plan shape: tokenize once per doc, `explode` the shingle-start
    * index range (plain generator — stays inside whole-stage codegen),
    * then build each shingle by direct `element_at` on the carried
    * token array. No intermediate array-of-shingles is materialized.
    */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleHashesAll(df, idCol, textCol, n).distinct()

  /** [[shingleHashes]] without the distinct — for consumers whose
    * downstream aggregate already dedups (e.g. the KMV sketch, whose
    * buffer is a set): skips a full shuffle of every shingle.
    */
  def shingleHashesAll(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleHashesIndexed(df, idCol, textCol, n).select(col(idCol), col("h"))

  /** [[shingleHashesAll]] keeping the 0-based window-start index:
    * `(idCol, pos, h)`. The excision half of exact substring dedup
    * ([[ExactSubstr]]) needs positions to cut; same codegen
    * explode-index plan (the shared hot formulation — see
    * [[wordShingles]] for why the `transform`-lambda form is not it).
    */
  def shingleHashesIndexed(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0), size(col("tk")) - n)).as("pos"))
      .select(col(idCol), col("pos"),
        baseHash(concat_ws(" ",
          (0 until n).map(j => element_at(col("tk"), col("pos") + lit(j + 1))): _*)).as("h"))

  /** The i-th universal-ish rehash of a 60-bit base hash, for MinHash
    * signatures: `g_i(h) = (a_i*lo30(h) + b_i*hi30(h) + i) mod M`.
    * Pure +,*,%,&,>> on non-negative int64 — identical in Spark and
    * DuckDB. Max intermediate value ≈ (37+97k)·2^30 ≈ 2^57: no overflow.
    */
  def rehash(h: Column, i: Int): Column = {
    val M = 1000000007L
    val a = 37L + 97L * i
    val b = 91138233L + 12345L * i
    (lit(a) * (h.bitwiseAND(lit(1073741823L))) +
      lit(b) * shiftright(h, 30).bitwiseAND(lit(1073741823L)) +
      lit(i.toLong)) % lit(M)
  }

  /** SQL text of [[rehash]] for oracle generation (DuckDB dialect;
    * `hExpr` is the hash expression to substitute).
    */
  def rehashSql(hExpr: String, i: Int): String = {
    val a = 37L + 97L * i
    val b = 91138233L + 12345L * i
    s"(($a * ($hExpr & 1073741823) + $b * (($hExpr >> 30) & 1073741823) + $i) % 1000000007)"
  }
}
