package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** ANN-LSH is statistical — no byte-exact oracle. Contract tested here:
  * recall@5 against the exact brute-force baseline, plus the structural
  * guarantee that every returned neighbor's score is exact (identical
  * integers to brute force for the same pair).
  */
class AnnLshSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("multiprobe sign-LSH reaches >=60% recall@5 of brute force") {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = CosineSim.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = AnnLsh.topK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@5 = $recall%.3f (${approx.size} approx rows, ${exact.size} exact)")
    assert(recall >= 0.60, f"recall too low: $recall%.3f")
  }

  test("LSH scores are exact fixed-point integers (match brute force per pair)") {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = CosineSim.bruteForceTopK(emb, queries, "vec_id", "embedding", 50)
      .select("q_id", "nn_id", "dot", "na", "nb").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val approx = AnnLsh.topK(emb, queries, "vec_id", "embedding", 5).collect()
    approx.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"))
      exact.get(key).foreach { e =>
        assert(e === ((r.getAs[Long]("dot"), r.getAs[Long]("na"), r.getAs[Long]("nb"))),
          s"score mismatch for $key")
      }
    }
  }
}
