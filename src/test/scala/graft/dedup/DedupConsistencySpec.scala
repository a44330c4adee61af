package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Cross-operator invariants: the dedup family must agree with itself.
  * Exact duplicates have identical shingle sets, so every exact-dup
  * pair (of docs long enough to shingle) MUST be found by MinHash+LSH
  * (identical signatures collide in every band) and score Jaccard 1.0;
  * and every verified near-dup pair must clear the threshold it was
  * verified against.
  */
class DedupConsistencySpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("exact-dup pairs (>=n tokens) are all found by MinHash at Jaccard 1.0") {
    val docs = Tables.load(spark, dir, "documents")
    val groups = ExactDedup.groups(docs, "doc_id", "text")
      .filter(col("group_size") > 1)
    val members = docs.join(
      groups.select("content_hash", "keep_id"),
      graft.text.TextFunctions.fingerprint(docs.col("text")) === col("content_hash"))
      .filter(graft.text.TextFunctions.tokenCount(col("text")) >= 3)
      .select(col("keep_id"), col("doc_id"))
    val exactPairs = members.filter(col("doc_id") =!= col("keep_id"))
      .select(least(col("keep_id"), col("doc_id")).as("a"),
        greatest(col("keep_id"), col("doc_id")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = MinHashLSH.nearDuplicates(docs, "doc_id", "text", 3, 8, 4, 3, 10)
      .collect()
    val mhPairs = mh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = exactPairs -- mhPairs
    assert(missing.isEmpty, s"exact dups missed by minhash: $missing")
    // exact dups score Jaccard exactly 1: inter == a_size == b_size
    mh.filter(r => exactPairs.contains((r.getLong(0), r.getLong(1))))
      .foreach { r =>
        assert(r.getAs[Long]("inter_size") === r.getAs[Long]("a_size"))
        assert(r.getAs[Long]("inter_size") === r.getAs[Long]("b_size"))
      }
  }

  test("every verified near-dup pair clears its own threshold (den*i >= num*u)") {
    val docs = Tables.load(spark, dir, "documents")
    MinHashLSH.nearDuplicates(docs, "doc_id", "text", 3, 8, 4, 3, 10)
      .collect().foreach { r =>
        val (i, a, b) = (r.getAs[Long]("inter_size"),
          r.getAs[Long]("a_size"), r.getAs[Long]("b_size"))
        assert(10 * i >= 3 * (a + b - i), s"pair below threshold: $r")
        assert(i <= math.min(a, b))
      }
  }
}
