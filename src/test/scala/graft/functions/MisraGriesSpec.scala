package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MisraGriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Skewed stream with vocabulary far above the sketch size, so the
    * trim path actually runs: heavy items h0..h9 get 500 copies each,
    * tail items t0..t4999 one copy each. N = 10000, k = 63 →
    * undercount bound N/(k+1) ≈ 156 < 500.
    */
  private val heavy = (0 until 10).flatMap(i => Seq.fill(500)(s"h$i"))
  private val tail = (0 until 5000).map(i => s"t$i")

  test("MG guarantee: every item above N/(k+1) survives, any partitioning") {
    val k = 63
    val n = heavy.size + tail.size
    val bound = n / (k + 1)
    for (seed <- Seq(1, 7)) {
      val shuffled = new scala.util.Random(seed).shuffle(heavy ++ tail)
      val df = shuffled.toDF("token").repartition(13)
      val cands = df
        .agg(MisraGriesAgg.candidates(k)(col("token")).as("c"))
        .select(explode(col("c")).as("token"))
        .as[String].collect().toSet
      assert(cands.size <= 2 * k, s"state bound violated: ${cands.size}")
      val exact = (heavy ++ tail).groupBy(identity).view.mapValues(_.size)
      val mustSurvive = exact.collect { case (t, c) if c > bound => t }.toSet
      assert(mustSurvive.subsetOf(cands),
        s"missing frequent items: ${mustSurvive -- cands}")
    }
  }

  test("trim: buffer never exceeds 2k entries and removes proportional weight") {
    import org.apache.spark.unsafe.types.UTF8String
    val agg = MisraGriesAgg.sketch(4)
    val buf = agg.createAggregationBuffer()
    (0 until 100).foreach(i =>
      agg.updateToken(buf, UTF8String.fromString(s"x$i")))
    assert(buf.size <= 8)
    // merge of two saturated buffers stays bounded too
    val other = agg.createAggregationBuffer()
    (100 until 200).foreach(i =>
      agg.updateToken(other, UTF8String.fromString(s"y$i")))
    assert(agg.merge(buf, other).size <= 8)
    // and a serialize/deserialize round trip is lossless
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.size == buf.size)
    buf.forEach((tok, cnt) => assert(back.get(tok)(0) == cnt(0)))
  }

  test("null tokens are skipped, not NPE'd at finish") {
    val df = (Seq("a", "a", "b") ++ Seq.fill(3)(null: String)).toDF("token")
    val cands = df
      .agg(MisraGriesAgg.candidates(8)(col("token")).as("c"))
      .select(explode(col("c")).as("token"))
      .as[String].collect().toSet
    assert(cands === Set("a", "b"))
  }

  test("heavyHitters two-pass == exact groupBy on skewed data, k << vocab") {
    // end-to-end equivalence on data where the sketch must trim:
    // replicate the PipelineQueries shape on a raw token frame
    val k = 63
    val support = 50L // k+1 = 64 > 50: guarantee holds
    val toks = new scala.util.Random(3).shuffle(heavy ++ tail)
      .toDF("token").repartition(7).cache()
    val sketch = toks.agg(
      count(lit(1)).as("__total"),
      MisraGriesAgg.candidates(k)(col("token")).as("__cand"))
    val cands = sketch.select(col("__total"), explode(col("__cand")).as("token"))
    val twoPass = toks.join(broadcast(cands), "token")
      .groupBy(col("token"), col("__total")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * support >= col("__total"))
      .select("token", "cnt")
      .orderBy(col("cnt").desc, col("token"))
      .as[(String, Long)].collect().toSeq
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(toks.agg(count(lit(1)).as("__total")))
      .filter(col("cnt") * support >= col("__total"))
      .select("token", "cnt")
      .orderBy(col("cnt").desc, col("token"))
      .as[(String, Long)].collect().toSeq
    toks.unpersist()
    assert(twoPass.nonEmpty && twoPass === exact)
  }
}
