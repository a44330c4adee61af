package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.QualityScore

/** Quality scoring + token-budget selection (the round-8 curation
  * stage): integer-exactness of the score, the prefix property of the
  * budget cut, and the scale-shaped plan (source-partitioned window, no
  * global sort).
  */
class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("score components stay in [0,250] and total in [0,1000]") {
    val r = graft.Tables.load(spark, dir, "documents")
      .select(
        QualityScore.lengthTermMilli(col("text")).as("a"),
        QualityScore.meanWordLenTermMilli(col("text")).as("b"),
        QualityScore.stopwordTermMilli(col("text")).as("c"),
        QualityScore.punctTermMilli(col("text")).as("d"),
        QualityScore.scoreMilli(col("text")).as("s"))
      .agg(min("a"), max("a"), min("b"), max("b"), min("c"), max("c"),
        min("d"), max("d"), min("s"), max("s"))
      .head()
    for (i <- 0 until 8 by 2) {
      assert(r.getLong(i) >= 0L, s"component min < 0 at $i")
      assert(r.getLong(i + 1) <= 250L, s"component max > 250 at $i")
    }
    assert(r.getLong(8) >= 0L && r.getLong(9) <= 1000L)
  }

  test("integer division matches BigInt reference on hostile values") {
    // idiv is (a - pmod(a,b))/b in doubles; prove exactness where naive
    // floor(a/b) could flip: quotients a hair under an integer.
    val cases = Seq(
      (0L, 1L), (999L, 1000L), (1000L, 1000L), (1001L, 1000L),
      (64L * 250L - 1L, 64L), (Int.MaxValue.toLong * 1000L, 7L),
      ((1L << 40) - 1L, 3L), (123456789012L, 997L))
    val df = cases.toDF("a", "b")
    val got = df.select(
      ((col("a") - pmod(col("a"), col("b"))) / col("b")).cast("long"))
      .collect().map(_.getLong(0))
    val want = cases.map { case (a, b) => a / b }
    assert(got.toSeq == want, s"idiv drift: ${got.toSeq} vs $want")
  }

  test("selection keeps exactly the top-ranked prefix per source") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val sel = Curation.selectByTokenBudget(
      docs, "doc_id", "text", "source", PipelineQueries.tokenBudgets)
      .collect()
    val bySource = sel.groupBy(_.getAs[String]("source"))
    val budgets = PipelineQueries.tokenBudgets.toMap
    bySource.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("sel_rank"))
      // ranks are a contiguous prefix 1..n — the cut never skips a
      // better-ranked doc to afford a worse one (knapsack would; the
      // streaming-budget semantics must not)
      assert(sorted.map(_.getAs[Long]("sel_rank")).toSeq ==
        (1L to sorted.length).toSeq, s"$src ranks not a prefix")
      // running total is consistent and within budget
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getAs[Long]("token_cnt")
        assert(r.getAs[Long]("cum_tokens") == cum, s"$src cum drift")
      }
      assert(cum <= budgets(src), s"$src over budget: $cum")
    }
    // scores within each source are non-increasing by rank
    bySource.foreach { case (src, rows) =>
      val scores = rows.sortBy(_.getAs[Long]("sel_rank"))
        .map(_.getAs[Long]("score_milli")).toSeq
      assert(scores == scores.sorted(Ordering[Long].reverse),
        s"$src not ranked by score desc")
    }
  }

  test("the next-ranked doc would break the budget (cut is maximal)") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val budgets = PipelineQueries.tokenBudgets.toMap
    val all = docs.select(col("doc_id"), col("source"),
      graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("tc"),
      QualityScore.scoreMilli(col("text")).as("sc")).collect()
    val sel = Curation.selectByTokenBudget(
      docs, "doc_id", "text", "source", PipelineQueries.tokenBudgets)
      .collect().groupBy(_.getAs[String]("source"))
    all.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val ranked = rows.sortBy(r =>
        (-r.getAs[Long]("sc"), r.getAs[Long]("doc_id")))
      val kept = sel.getOrElse(src, Array.empty).length
      if (kept < ranked.length) {
        val cumNext = ranked.take(kept + 1).map(_.getAs[Long]("tc")).sum
        assert(cumNext > budgets(src),
          s"$src: rank ${kept + 1} still fits but was cut")
      }
    }
  }

  test("plan: one source-partitioned window exchange, no global sort") {
    val p = PipelineQueries.selectTokenBudget(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"expected window exec:\n$p")
    // the only range/global sort allowed is the final presentation
    // ORDER BY; the selection itself must be hashpartitioned by source
    assert(p.contains("hashpartitioning(source"),
      s"window not partitioned by source:\n$p")
    assert(!p.contains("lambdafunction"),
      s"interpreted higher-order function in the scoring path:\n$p")
  }

  test("balanceClusters: every cluster capped at the minority size, " +
    "hash-deterministic and partitioning-independent") {
    import spark.implicits._
    // clusters of size 3 / 5 / 8 -> cap 3, 9 rows kept
    val assign = (
      (0 until 3).map(i => (i.toLong, 0L)) ++
      (10 until 15).map(i => (i.toLong, 1L)) ++
      (20 until 28).map(i => (i.toLong, 2L))).toDF("id", "cluster_id")
    val kept = Curation.balanceClusters(assign, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.length === 9)
    assert(kept.groupBy(_._2).view.mapValues(_.length).toMap ===
      Map(0L -> 3, 1L -> 3, 2L -> 3))
    val kept2 = Curation.balanceClusters(assign.repartition(7), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept2.sorted.toSeq === kept.sorted.toSeq)
  }
}
