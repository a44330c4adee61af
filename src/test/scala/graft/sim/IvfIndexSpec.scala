package graft.sim

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class IvfIndexSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("persisted index: probes prune partitions; recall holds; load() round-trips") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = Files.createTempDirectory("ivf_index").toString
    val index = IvfIndex.build(emb, "vec_id", "embedding", path, nCentroids = 16)

    // partition pruning reaches the scan
    val plan = index.probedScan(Seq(0, 1, 2, 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"),
      s"probe filter did not become a partition filter:\n$plan")

    // recall vs brute force, same contract as the in-memory variants
    val queries = emb.filter(col("vec_id") < 50)
    val exact = CosineSim.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = index.topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@5 = $recall%.3f")
    assert(recall >= 0.60)

    // load() gives the same results as the just-built handle
    val reloaded = IvfIndex.load(spark, path)
    val again = reloaded.topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === approx)
  }

  test("append grows the index without retraining; appended vectors are findable") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = Files.createTempDirectory("ivf_index_app").toString
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    val index = IvfIndex.build(first, "vec_id", "embedding", path, nCentroids = 16)
    index.append(second, "vec_id", "embedding")

    val queries = emb.filter(col("vec_id") < 50)
    val exact = CosineSim.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = index.topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@5 after append = $recall%.3f")
    assert(recall >= 0.55) // appended half assigned to frozen centroids
    // odd-id (appended) neighbors do surface in results
    assert(approx.exists(_._2 % 2 == 1), "appended vectors never retrieved")
    // a reloaded handle sees the appended rows too
    assert(IvfIndex.load(spark, path).topK(queries, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === approx)
  }
}
