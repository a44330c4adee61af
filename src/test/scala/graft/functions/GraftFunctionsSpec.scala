package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GraftFunctionsSpec extends AnyFunSuite with SparkSpec {

  test("QuantizeMilli matches the interpreted transform semantics (incl. HALF_UP)") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0015, -0.0015, 0.9994999, 1.0, -2.5, 0.0005)),
      (2L, Array[Double]())).toDF("id", "v")
    val got = df.select(col("id"), QuantizeMilli(col("v")).as("q"))
      .orderBy("id").collect()
    // HALF_UP = away from zero on negatives (-1.5 -> -2), matching both
    // Spark's round builtin and DuckDB's round
    assert(got(0).getSeq[Long](1) === Seq(2L, -2L, 999L, 1000L, -2500L, 1L))
    assert(got(1).getSeq[Long](1) === Seq.empty)
    // reference semantics: round(x*1000) via the builtin chain
    val ref = df.select(col("id"),
      transform(col("v"), x => round(x * 1000).cast("long")).as("q"))
      .orderBy("id").collect()
    assert(got.map(_.getSeq[Long](1).toSeq).toSeq ===
      ref.map(_.getSeq[Long](1).toSeq).toSeq)
  }

  test("float input casts cleanly (embedding column shape)") {
    import spark.implicits._
    val df = Seq((1L, Array(0.5f, -0.25f))).toDF("id", "v")
    val got = df.select(QuantizeMilli(col("v").cast("array<double>"))).head.getSeq[Long](0)
    assert(got === Seq(500L, -250L))
  }

  test("graft_dot / graft_quantize_milli are SQL-callable after registration") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
      .createOrReplaceTempView("graft_fn_test")
    assert(spark.sql("SELECT graft_dot(a, b) AS d FROM graft_fn_test")
      .head.getLong(0) === 32L)
    assert(spark.sql("SELECT graft_quantize_milli(array(0.5D, -0.25D)) AS q")
      .head.getSeq[Long](0) === Seq(500L, -250L))
  }
}
