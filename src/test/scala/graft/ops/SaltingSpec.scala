package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SaltingSpec extends AnyFunSuite with SparkSpec {

  // skewed data: 90% of rows share one key
  private def skewed = {
    import spark.implicits._
    ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 17}", i.toLong)))
      .toDF("k", "v").repartition(8)
  }

  test("salted two-phase aggregation equals the plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("c"), min("v").as("mn"), max("v").as("mx"))
      .orderBy("k").collect()
    val salted = Salting.saltedAggregate(skewed, Seq("k"),
      Map("s" -> ("sum", "v"), "c" -> ("count", "*"),
        "mn" -> ("min", "v"), "mx" -> ("max", "v")), salts = 16)
      .select("k", "s", "c", "mn", "mx").orderBy("k").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted join equals the plain join (inner and left)") {
    import spark.implicits._
    val dim = (Seq(("hot", 1)) ++ (0 until 17).map(i => (s"k$i", i + 2)))
      .toDF("k", "attr")
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("attr").as("sa"))
        .orderBy("k").collect()
      val salted = Salting.saltedJoin(skewed, dim, Seq("k"), jt, salts = 8)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("attr").as("sa"))
        .orderBy("k").collect()
      assert(salted.toSeq === plain.toSeq, s"join type $jt")
    }
  }
}
