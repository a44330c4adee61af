package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class CosineSimSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("blocked similarPairs = unblocked pairs restricted to same-block (label)") {
    val emb = Tables.load(spark, dir, "embeddings").limit(300)
    val all = CosineSim.similarPairs(emb, "vec_id", "embedding", 2, 5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = CosineSim.similarPairs(emb, "vec_id", "embedding", 2, 5,
      blockCol = Some("label"))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same-label subset of the exact all-pairs result
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = all.filter { case (a, b) => labels(a) == labels(b) }
    assert(blocked === expected)
    assert(blocked.subsetOf(all))
  }

  test("LSH-blocked pairs are a subset of exact pairs with identical integers") {
    val emb = Tables.load(spark, dir, "embeddings").limit(500)
    val exact = CosineSim.similarPairs(emb, "vec_id", "embedding", 2, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val blocked = CosineSim.blockedSimilarPairs(emb, "vec_id", "embedding", 2, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(blocked.keySet.subsetOf(exact.keySet),
      s"blocked produced pairs the exact join does not: ${blocked.keySet -- exact.keySet}")
    // verified integers must agree exactly for every surviving pair
    blocked.foreach { case (pair, ints) => assert(exact(pair) === ints) }
    // recall sanity on this data (cosine ~0.4-0.5 pairs, 4 tables × 8
    // planes): not a contract, but zero would mean the blocking is broken
    if (exact.nonEmpty)
      assert(blocked.nonEmpty, "LSH blocking found none of the exact pairs")
  }

  test("blockedSimilarPairsWithin: cross-scope pairs are NEVER " +
    "candidates — identical vectors in different clusters stay apart") {
    import spark.implicits._
    // four IDENTICAL embeddings (cosine 1.0, same LSH bucket in every
    // table): 1 and 2 share cluster 0, 3 and 4 sit in clusters 1 and 2
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val emb = Seq(
      (1L, v.toSeq, 0L), (2L, v.toSeq, 0L), (3L, v.toSeq, 1L),
      (4L, v.toSeq, 2L)).toDF("vec_id", "embedding", "kc")
    val got = CosineSim.blockedSimilarPairsWithin(
      emb, "vec_id", "embedding", "kc", num = 2, den = 5)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)),
      "only the same-cluster pair may survive; identical cross-cluster " +
        s"vectors must not even be candidates — got $got")
    // and the scoped result equals the unscoped result filtered to
    // same-cluster, on real data (the semantics contract)
    val real = Tables.load(spark, dir, "embeddings").limit(400)
      .withColumn("kc", pmod(col("vec_id"), lit(3)))
    val unscoped = CosineSim.blockedSimilarPairs(
      real, "vec_id", "embedding", 2, 5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scoped = CosineSim.blockedSimilarPairsWithin(
      real, "vec_id", "embedding", "kc", 2, 5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kcOf = real.select("vec_id", "kc").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scoped === unscoped.filter { case (a, b) => kcOf(a) == kcOf(b) },
      "scoped pairs must equal the unscoped result restricted to " +
        "same-cluster (cap effects aside on this uncapped-size data)")
  }

  test("signBucketRowsQ (the index-side bucket helper) agrees with the " +
    "public signBucket formula on every table — the refactor cannot " +
    "have forked the hyperplane family") {
    val emb = Tables.load(spark, dir, "embeddings").limit(50)
    val q = emb.select(col("vec_id"),
      CosineSim.quantize(col("embedding")).as("q"))
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val planes = 8; val tables = 4
    val got = CosineSim.signBucketRowsQ(q, dim, planes, tables)
      .select("vec_id", "t", "b").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // table t's bucket must equal the signBucket fold over the SAME
    // plane slice — rebuild it per table by shifting the plane index
    // base: plane j of table t is global plane t*planes + j, which is
    // signBucket's plane j when the formula's (j+1) multiplier is
    // substituted — so compare against a direct driver-side model
    val rows = q.select(col("vec_id"), col("q")).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Long](1).toArray
      (0 until tables).foreach { t =>
        var b = 0L
        (0 until planes).foreach { j =>
          val p = CosineSim.planeVector(dim, t * planes + j)
          var d = 0L
          var i = 0
          while (i < dim) { d += v(i) * p(i); i += 1 }
          if (d >= 0) b |= 1L << j
        }
        assert(got((id, t)) === b, s"vec $id table $t")
      }
    }
  }

  test("blocked plan joins on the block key (equi-join, no cross product)") {
    val emb = Tables.load(spark, dir, "embeddings")
    val plan = CosineSim.similarPairs(emb, "vec_id", "embedding", 2, 5,
      blockCol = Some("label"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") || plan.contains("HashJoin"),
      s"blocked pair join should be an equi-join:\n$plan")
  }

  test("crossContaminatedIds flags near-eval train vectors, bipartite only") {
    import spark.implicits._
    // eval e0; t1 is (quantization-exactly) a scaled copy of e0
    // (cosine 1), t2 is orthogonal, t3 is a near-copy of ANOTHER TRAIN
    // vector (train-train similarity must NOT flag)
    val e0 = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val t1 = e0.map(_ * 0.5f)
    val t2 = Array.tabulate(8)(i => if (i < 4) 1.0f else 1.0f)
    val t3 = t2.map(_ * 0.9f)
    val emb = Seq((0L, e0), (100L, t1), (101L, t2), (102L, t3))
      .toDF("vec_id", "embedding")
    val flagged = CosineSim.crossContaminatedIds(
      emb, "vec_id", "embedding", col("vec_id") < 100L, num = 8, den = 10)
      .as[Long].collect().toSet
    assert(flagged === Set(100L), s"flagged=$flagged")
  }
}
