package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.lake.IncrementalTable

/** The DSv2 scan must forward the inner parquet scan's size estimate
  * (`SupportsReportStatistics`): without it Spark prices every graft
  * relation at defaultSizeInBytes (Long.MaxValue) and a tiny graft
  * dimension table can never win a broadcast join.
  */
class ScanStatisticsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def hasBroadcast(df: DataFrame): Boolean = {
    def walk(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case _: BroadcastHashJoinExec => true
      case other => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("a small graft table reports its true file size and WINS the " +
    "broadcast side against a large probe") {
    val dir = Files.createTempDirectory("stats_bc_").toString
    val t = new IncrementalTable(spark, s"$dir/dim")
    t.append((0L until 200L).map(k => (k, s"d$k")).toDF("k", "name"))
    val dim = spark.read.format("graft").load(s"$dir/dim")
    // the probe side is well past the broadcast threshold, so the ONLY
    // broadcastable side is the graft dim — a Long.MaxValue estimate
    // would force a sort-merge join of both sides
    val big = spark.range(0, 10000000L).select(
      (col("id") % 200L).as("k"), col("id").as("payload"))
    val joined = big.join(dim, "k")
    assert(joined.count() === 10000000L)
    assert(hasBroadcast(joined),
      "tiny graft dim must broadcast:\n" + joined.queryExecution.executedPlan)
    // foil: with broadcasts disabled the same join shuffles — the stats
    // forward changes the PLAN, never the rows
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val foil = big.join(dim, "k")
      assert(foil.count() === 10000000L)
      assert(!hasBroadcast(foil))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
