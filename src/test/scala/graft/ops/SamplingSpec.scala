package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Deterministic hash sampling: reproducibility, rate accuracy,
  * cross-table joinability, stratified rates.
  */
class SamplingSpec extends AnyFunSuite with SparkSpec {

  test("reproducible, approximately the requested rate, joinable across tables") {
    import spark.implicits._
    val a = spark.range(10000).toDF("k")
    val s1 = Sampling.byHash(a, "k", 0.3).as[Long].collect().toSet
    val s2 = Sampling.byHash(a, "k", 0.3).as[Long].collect().toSet
    assert(s1 === s2)                               // retry/recompute stable
    assert(math.abs(s1.size - 3000) < 300, s"rate off: ${s1.size}")
    // another table sampled by the same key keeps the SAME keys
    val b = spark.range(10000).toDF("k")
    val s3 = Sampling.byHash(b, "k", 0.3).as[Long].collect().toSet
    assert(s3 === s1)
    // lower fraction is a subset of higher (threshold monotonicity)
    val s4 = Sampling.byHash(a, "k", 0.1).as[Long].collect().toSet
    assert(s4.subsetOf(s1))
  }

  test("stratified rates per group; unlisted strata drop") {
    import spark.implicits._
    val df = spark.range(20000)
      .selectExpr("id AS k", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g")
    val out = Sampling.stratifiedByHash(df, "k", "g", Map("a" -> 0.5))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(!out.contains("b"))
    assert(math.abs(out("a") - 5000) < 500, s"stratum rate off: $out")
  }
}
