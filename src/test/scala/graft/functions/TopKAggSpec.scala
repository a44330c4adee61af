package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TopKAggSpec extends AnyFunSuite with SparkSpec {

  test("TopKAgg equals the window formulation (sim DESC, nnId ASC)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      (i % 13L, rnd.nextInt(50) / 10.0, rnd.nextInt(500).toLong,
        rnd.nextLong() % 1000, 100L, 200L)
    }.toDF("q_id", "sim", "nn_id", "dot", "na", "nb")
      .dropDuplicates("q_id", "sim", "nn_id")
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nn_id").asc)
    val viaWindow = rows.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "nn_id", "dot")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val topk = TopKAgg(5)
    val viaAgg = rows.groupBy("q_id")
      .agg(topk(col("sim"), col("nn_id"), col("dot"), col("na"), col("nb")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.nnId").as("nn_id"), col("col.dot").as("dot"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaAgg === viaWindow)
  }

  test("partial aggregation: the plan carries partial_topkagg before the exchange") {
    import spark.implicits._
    val rows = Seq((1L, 0.5, 2L, 10L, 1L, 1L)).toDF("q_id", "sim", "nn_id", "dot", "na", "nb")
    val topk = TopKAgg(3)
    val plan = rows.groupBy("q_id")
      .agg(topk(col("sim"), col("nn_id"), col("dot"), col("na"), col("nb")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg") || plan.contains("partial"),
      s"no map-side partial aggregation:\n$plan")
  }
}
