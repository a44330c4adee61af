package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class KMeansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** 3 well-separated clusters in 8 dims + ids; k-means must recover
    * the separation whatever the input partitioning.
    */
  private def corpus(n: Int) = {
    val r = new scala.util.Random(11)
    (0 until n).map { i =>
      val c = i % 3
      val center = Array.tabulate(8)(d => if (d % 3 == c) 1.0f else -1.0f)
      (i.toLong, center.map(x => x + 0.05f * r.nextFloat()))
    }.toDF("vec_id", "embedding")
  }

  test("every vector is assigned to exactly one of k clusters") {
    val out = KMeans.assign(corpus(120), "vec_id", "embedding", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length === 120)
    assert(out.map(_._1).distinct.length === 120)
    assert(out.forall { case (_, c) => c >= 0L && c < 3L })
    // well-separated data: assignments must agree with the generator's
    // ground truth up to cluster relabeling (each true cluster maps to
    // ONE k-means cluster)
    val byTruth = out.groupBy { case (id, _) => id % 3 }
      .view.mapValues(_.map(_._2).distinct.toSeq).toMap
    assert(byTruth.values.forall(_.size == 1), byTruth.toString)
    assert(byTruth.values.flatten.toSet.size === 3)
  }

  test("assignment is corpus-order independent and shuffle-free") {
    val base = corpus(90)
    val a = KMeans.assign(base.coalesce(1), "vec_id", "embedding", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = KMeans.assign(base.repartition(7), "vec_id", "embedding", k = 3)
    assert(b.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === a)
    // the assignment pass itself is a narrow map: broadcast centroids,
    // no hash/range shuffle anywhere in the returned plan (the only
    // Exchange below is the caller's own repartition of the input)
    val plan = b.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      plan)
  }
}
