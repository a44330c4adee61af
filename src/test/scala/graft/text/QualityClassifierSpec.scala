package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QualityClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Separable corpus: positive docs draw from one vocabulary,
    * negative from another, with a small shared stopword overlap.
    */
  private def corpus() = {
    val pos = (0 until 60).map(i =>
      (i.toLong, s"the good clean prose sentence number $i reads well", 1))
    val neg = (60 until 120).map(i =>
      (i.toLong, s"the spam casino jackpot winner click here now $i", 0))
    (pos ++ neg).toDF("doc_id", "text", "y")
  }

  test("learns a separable weak label: training-set accuracy ~1, scores " +
    "ordered by class") {
    val docs = corpus()
    val out = QualityClassifier.naiveBayesScores(
      docs, "doc_id", "text", $"y" === 1, minCount = 2)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(rows.length === 120)
    val acc = rows.count { case (_, _, y, p) => y == p } / 120.0
    assert(acc >= 0.99, s"separable corpus not learned: acc=$acc")
    val posMin = rows.filter(_._3 == 1).map(_._2).min
    val negMax = rows.filter(_._3 == 0).map(_._2).max
    assert(posMin > 0 && negMax < 0,
      s"margins wrong: posMin=$posMin negMax=$negMax")
  }

  test("vocabCap bounds the model through a distributed top-k, not a " +
    "global sort (and capping keeps the most frequent tokens)") {
    val docs = corpus()
    val out = QualityClassifier.naiveBayesScores(
      docs, "doc_id", "text", $"y" === 1, minCount = 2, vocabCap = 4)
    // plan: the vocabulary cap is TakeOrderedAndProject (map-side
    // partial top-k); a Window/global Sort over the vocab would be the
    // 100 TB scale-killer
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    // with 4 tokens the shared stopword dominates; scoring still runs
    assert(out.count() === 120L)
  }

  test("documents with no modeled tokens get the prior alone") {
    val docs = corpus().union(Seq((999L, "zzz qqq xxx", 0)).toDF("doc_id", "text", "y"))
    val out = QualityClassifier.naiveBayesScores(
      docs, "doc_id", "text", $"y" === 1, minCount = 2)
    val r = out.filter($"doc_id" === 999L).head()
    // prior = ln((60+1)/(61+1)) * 1000 rounded: slightly negative
    assert(r.getLong(1) === math.round(math.log(61.0 / 62.0) * 1000))
    assert(r.getInt(3) === 0)
  }
}
