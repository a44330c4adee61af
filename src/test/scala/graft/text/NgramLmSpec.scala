package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Bigram-LM perplexity filtering ([[NgramLm]]): reference-like text
  * must score materially lower average NLL than out-of-distribution
  * junk, degenerate documents stay well-defined, and the gate is a
  * pure integer compare on the chosen threshold.
  */
class NgramLmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus = {
    val ref = (1 to 30).map(i =>
      (s"r$i", "the cat sat on the mat and the dog ran to the cat", "en"))
    val junk = Seq(("zj", "zxqv qqq krfp xkcd qwerty plmn vvst bbqr", "xx"))
    val tiny = Seq(("t1", "hello", "xx"), ("t0", "", "xx"))
    (ref ++ junk ++ tiny).toDF("doc_id", "text", "lang")
  }

  test("reference-like docs score lower average NLL than junk; the gate " +
    "separates them at a threshold between the two") {
    val out = NgramLm.bigramNll(corpus, "doc_id", "text", col("lang") === "en")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    val (rn, rs, _) = out("r1")
    val (jn, js, _) = out("zj")
    assert(rn === 12L && jn === 7L)
    val refAvg = rs / rn
    val junkAvg = js / jn
    assert(refAvg < junkAvg,
      s"in-distribution text must be cheaper: ref=$refAvg junk=$junkAvg")
    // re-gate at a threshold strictly between the two averages
    val mid = (refAvg + junkAvg) / 2
    val gated = NgramLm.bigramNll(corpus, "doc_id", "text",
        col("lang") === "en", keepMaxAvgMilli = mid)
      .collect().map(r => r.getString(0) -> r.getInt(3)).toMap
    assert(gated("r1") === 1)
    assert(gated("zj") === 0)
  }

  test("0- and 1-token documents carry (0, 0) and pass the gate") {
    val out = NgramLm.bigramNll(corpus, "doc_id", "text", col("lang") === "en")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(out("t0") === ((0L, 0L, 1)))
    assert(out("t1") === ((0L, 0L, 1)))
  }

  test("every input document comes back exactly once") {
    val out = NgramLm.bigramNll(corpus, "doc_id", "text", col("lang") === "en")
    assert(out.count() === 33L)
    assert(out.select("doc_id").distinct().count() === 33L)
  }

  test("the model is partitioning-independent: 1 vs 8 shuffle partitions " +
    "produce identical scores") {
    val a = NgramLm.bigramNll(corpus.repartition(1), "doc_id", "text",
      col("lang") === "en").collect()
      .map(r => (r.getString(0), r.getLong(2))).sorted.toSeq
    val b = NgramLm.bigramNll(corpus.repartition(8), "doc_id", "text",
      col("lang") === "en").collect()
      .map(r => (r.getString(0), r.getLong(2))).sorted.toSeq
    assert(a === b)
  }
}
