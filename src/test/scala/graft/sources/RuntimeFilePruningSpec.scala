package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.lake.IncrementalTable

/** Dynamic file pruning: a selective dim filter on the build side of a
  * broadcast join prunes the graft fact scan's FILES at runtime through
  * `SupportsRuntimeV2Filtering` — the file-level analog of dynamic
  * partition pruning, driven by the same per-file min/max + bloom stats
  * `skipWhere` uses. Correctness is fail-open: results must equal the
  * unpruned join under every outcome.
  */
class RuntimeFilePruningSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Fact with 8 disjoint key-range files (id-clustered by append). */
  private def rangedFact(): (String, IncrementalTable) = {
    val dir = Files.createTempDirectory("dfp_").toString + "/fact"
    val t = new IncrementalTable(spark, dir)
    (0 until 8).foreach { i =>
      val lo = i * 100L
      t.append((lo until lo + 100L).map(id => (id, id % 10, s"p$id"))
        .toDF("id", "bucket", "payload").coalesce(1))
    }
    (dir, t)
  }

  /** Every GraftStreamScan in the EXECUTED (final adaptive) plan. */
  private def graftScans(df: DataFrame): Seq[GraftStreamScan] = {
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val scans = scala.collection.mutable.ArrayBuffer.empty[GraftStreamScan]
    def walk(p: SparkPlan): Unit = finalPlan(p) match {
      case b: BatchScanExec =>
        b.scan match {
          case g: GraftStreamScan => scans += g
          case _ => ()
        }
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        walk(r.child)
      case other =>
        other.children.foreach(walk)
        other.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    scans.toSeq
  }

  test("broadcast star join prunes fact files to the dim keys' ranges; " +
    "results equal the unpruned join") {
    val (dir, t) = rangedFact()
    val fact = spark.read.format("graft").load(dir)
    // dim on STORAGE: an in-memory local relation gets its filter
    // constant-folded away (ConvertToLocalRelation), and DPP requires a
    // surviving selective Filter on the build side — as any real dim has
    val dimPath = Files.createTempDirectory("dfp_dim_").toString + "/dim"
    Seq((5L, "keep"), (205L, "keep"), (650L, "drop"))
      .toDF("k", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter($"tag" === "keep"), $"id" === $"k")
      .select($"id", $"payload")
    val rows = joined.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows.toSeq === Seq((5L, "p5"), (205L, "p205")))

    val scans = graftScans(joined)
    assert(scans.nonEmpty, "no graft scan in the executed plan")
    val stats = scans.flatMap(_.pruneStats)
    assert(stats.nonEmpty,
      s"dynamic file pruning did not fire (plan:\n${joined.queryExecution.executedPlan})")
    val (before, after) = stats.head
    assert(before === 8 && after === 2,
      s"expected 8 -> 2 files, got $before -> $after")

    // fail-open contract: pruning off serves the identical result
    spark.conf.set("spark.graft.runtimeFilePruning.enabled", "false")
    try {
      val unpruned = fact.join(dim.filter($"tag" === "keep"), $"id" === $"k")
        .select($"id", $"payload")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(unpruned.toSeq === rows.toSeq)
    } finally spark.conf.unset("spark.graft.runtimeFilePruning.enabled")
    // silence the unused warning on t; the table handle pins the layout
    assert(t.latestVersion.contains(7L))
  }

  test("catalog SQL star join prunes the same way (the dashboard path)") {
    val wh = Files.createTempDirectory("dfp_wh_").toString
    val dir = s"$wh/fact"
    val t = new IncrementalTable(spark, dir)
    (0 until 8).foreach { i =>
      val lo = i * 100L
      t.append((lo until lo + 100L).map(id => (id, s"p$id"))
        .toDF("id", "payload").coalesce(1))
    }
    Seq((5L, "keep"), (205L, "keep"), (650L, "drop"))
      .toDF("k", "tag").write.parquet(s"$wh/dimfiles")
    spark.conf.set("spark.sql.catalog.dfpcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dfpcat.warehouse", wh)
    try {
      val joined = spark.sql(
        s"""SELECT f.id, f.payload FROM dfpcat.fact f
           |JOIN parquet.`$wh/dimfiles` d ON f.id = d.k
           |WHERE d.tag = 'keep'""".stripMargin)
      assert(joined.collect().map(r => (r.getLong(0), r.getString(1))).sorted
        .toSeq === Seq((5L, "p5"), (205L, "p205")))
      val stats = graftScans(joined).flatMap(_.pruneStats)
      assert(stats.headOption.contains((8, 2)),
        s"catalog-path pruning missing: $stats\n" +
          joined.queryExecution.executedPlan)
    } finally {
      spark.conf.unset("spark.sql.catalog.dfpcat")
      spark.conf.unset("spark.sql.catalog.dfpcat.warehouse")
    }
  }

  test("STRING join keys prune too (v2 literals arrive as UTF8String)") {
    val dir = Files.createTempDirectory("dfp_s_").toString + "/fact"
    val t = new IncrementalTable(spark, dir)
    (0 until 8).foreach { i =>
      val lo = i * 100
      t.append((lo until lo + 100).map(n => (f"k$n%04d", n))
        .toDF("sk", "n").coalesce(1))
    }
    val fact = spark.read.format("graft").load(dir)
    val dimPath = Files.createTempDirectory("dfp_sdim_").toString + "/dim"
    Seq(("k0005", "keep"), ("k0205", "keep"), ("k0650", "drop"))
      .toDF("dk", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter($"tag" === "keep"), $"sk" === $"dk")
      .select($"sk", $"n")
    assert(joined.collect().map(r => (r.getString(0), r.getInt(1))).sorted
      .toSeq === Seq(("k0005", 5), ("k0205", 205)))
    val stats = graftScans(joined).flatMap(_.pruneStats)
    assert(stats.headOption.contains((8, 2)),
      s"string-key pruning missing: $stats")
  }

  test("an empty build side prunes every file and still answers (zero rows)") {
    val (dir, _) = rangedFact()
    val fact = spark.read.format("graft").load(dir)
    val dimPath = Files.createTempDirectory("dfp_dim_").toString + "/dim"
    Seq((5L, "x")).toDF("k", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter($"tag" === "nope"), $"id" === $"k")
    assert(joined.count() === 0L)
  }

  test("a static filter AND the runtime filter compose; time travel keeps pruning") {
    val (dir, t) = rangedFact()
    // one more commit so latest != v7; read v7 explicitly
    t.append(Seq((9999L, 9999L, "late")).toDF("id", "bucket", "payload").coalesce(1))
    val fact = spark.read.format("graft").option("versionAsOf", 7).load(dir)
    val dimPath = Files.createTempDirectory("dfp_dim_").toString + "/dim"
    Seq((5L, "keep"), (205L, "keep")).toDF("k", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.filter($"id" < 100L)
      .join(dim.filter($"tag" === "keep"), $"id" === $"k")
      .select($"id", $"payload")
    assert(joined.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((5L, "p5")))
  }
}
