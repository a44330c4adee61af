package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Banded range join: equivalence with the naive theta-join and the
  * plan guarantee that makes it scale (equi-join on the band, never a
  * nested loop).
  */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  private def fixtures = {
    import spark.implicits._
    // deterministic pseudo-random longs via hashing
    val pts = spark.range(500).select(col("id").as("p_id"),
      (abs(xxhash64(col("id"))) % 100000L).as("p_ts"))
    val ivs = spark.range(80).select(col("id").as("i_id"),
      (abs(xxhash64(col("id") + 1000L)) % 90000L).as("lo"))
      .withColumn("hi", col("lo") + 1L + abs(xxhash64(col("i_id") + 2000L)) % 15000L)
    (pts, ivs)
  }

  test("matches the naive range join, including multi-band intervals") {
    val (pts, ivs) = fixtures
    val banded = RangeJoin.pointInInterval(pts, ivs, "p_ts", "lo", "hi", bandNanos = 1000L)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = pts.join(ivs, col("p_ts") >= col("lo") && col("p_ts") < col("hi"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.nonEmpty, "fixture degenerate: naive join empty")
    assert(banded.toSeq === naive.toSeq)
  }

  test("half-open: point at hi excluded, at lo included; empty interval drops") {
    import spark.implicits._
    val pts = Seq((1L, 10L), (2L, 20L)).toDF("p_id", "p_ts")
    val ivs = Seq((10L, 10L, 20L), (11L, 5L, 5L)).toDF("i_id", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "p_ts", "lo", "hi", 7L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 10L)))
  }

  test("plans an equi-join on the band, not a nested loop") {
    val (pts, ivs) = fixtures
    val plan = RangeJoin.pointInInterval(pts, ivs, "p_ts", "lo", "hi", 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
