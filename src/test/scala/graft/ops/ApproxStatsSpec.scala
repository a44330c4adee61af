package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Sketch aggregates have no cross-engine oracle — the contract is
  * accuracy vs the exact answers on the same data.
  */
class ApproxStatsSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact per event_type") {
    val ev = Tables.events(spark, dir)
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact_users"))
    val approx = PipelineQueries.approxStats(spark, dir)
      .select("event_type", "approx_users")
    val joined = exact.join(approx, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getLong(1).toDouble
      val a = r.getLong(2).toDouble
      assert(math.abs(a - e) / e <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("percentile_approx p50 within the exact p45..p55 band") {
    val ev = Tables.events(spark, dir)
    val bands = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.45)").as("lo"),
      expr("percentile(value, 0.55)").as("hi"))
    val approx = PipelineQueries.approxStats(spark, dir)
      .select("event_type", "p50_value")
    approx.join(bands, "event_type").collect().foreach { r =>
      val p50 = r.getDouble(1)
      assert(p50 >= r.getDouble(2) && p50 <= r.getDouble(3),
        s"${r.getString(0)}: p50 $p50 outside [${r.getDouble(2)}, ${r.getDouble(3)}]")
    }
  }
}
