package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("as-of picks the greatest right ts <= left ts per key; inclusive at equality") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "a"), (1L, 250L, "b"), (1L, 300L, "c"), (2L, 50L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, 10L), (1L, 200L, 20L), (1L, 400L, 40L), (3L, 1L, 99L))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "t",
      Map("t" -> "rt", "v" -> "rv"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      (1L, 100L, "a", Some(100L), Some(10L)), // inclusive: equal ts matches
      (1L, 250L, "b", Some(200L), Some(20L)),
      (1L, 300L, "c", Some(200L), Some(20L)), // 400 is in the future
      (2L, 50L, "d", None, None)))            // no right rows for key 2
  }

  test("one shuffle: plan has a single exchange on the key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 9L)).toDF("k", "t", "v")
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Map("v" -> "rv"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 key exchange:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
