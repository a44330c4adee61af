package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Incrementally-maintained materialized aggregates over the change
  * feed: affected-key recompute (arbitrary aggregates, max included),
  * file-pruned source re-scan and view rewrite, the fallback ladder
  * (big key sets, NULL keys, CDC-less rewrites, lost watermark → full
  * recompute, never a wrong answer), cascading CDC on the view table,
  * and definition persistence across handles.
  */
class IncrementalViewSpec extends AnyFunSuite with SparkSpec {

  private val Aggs = Seq(
    "cnt" -> "count(*)",
    "total" -> "sum(v)",
    "top" -> "max(v)") // max: NOT delta-maintainable, only recomputable

  private def freshDir() = Files.createTempDirectory("mview_").toString

  /** Source with `n` keys × `per` rows, range-clustered on k so file
    * stats can prune key predicates.
    */
  private def sourceTable(n: Int, per: Int): IncrementalTable = {
    import spark.implicits._
    val t = new IncrementalTable(spark, freshDir() + "/src")
    val rows = for (k <- 0 until n; i <- 0 until per)
      yield (k.toLong, (k * 100 + i).toLong)
    t.append(rows.toDF("k", "v").repartitionByRange(4, col("k"))
      .sortWithinPartitions("k"))
    t
  }

  private def expected(src: IncrementalTable): Set[(Long, Long, Long, Long)] =
    src.snapshot().groupBy("k")
      .agg(expr("count(*)").as("cnt"), expr("sum(v)").as("total"),
        expr("max(v)").as("top"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  private def actual(view: IncrementalView): Set[(Long, Long, Long, Long)] =
    view.snapshot().collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet

  test("create materializes the full aggregate") {
    val src = sourceTable(20, 5)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    assert(actual(view) === expected(src))
    assert(view.watermark === src.latestVersion)
    assert(view.lastRefresh.map(_.mode) === Some("full"))
  }

  test("incremental refresh recomputes ONLY the touched groups") {
    import spark.implicits._
    val src = sourceTable(40, 5)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs, targetFiles = 4)
    // touch 2 of 40 groups: one update, one append
    src.updateWhere(col("k") === 7L, Map("v" -> (col("v") + 1000L)))
    src.append(Seq((11L, 99999L)).toDF("k", "v"))
    view.refresh(targetFiles = 4)
    assert(actual(view) === expected(src))
    val m = view.lastRefresh.get
    assert(m.mode === "incremental")
    assert(m.touchedGroups === 2)
    // the whole point: neither side was rescanned in full
    assert(m.sourceFilesScanned < m.sourceFilesTotal,
      s"source not pruned: $m")
    assert(m.viewFilesRewritten < m.viewFilesTotal, s"view not pruned: $m")
  }

  test("max is maintained correctly through a delete (recompute, not " +
    "decrement)") {
    val src = sourceTable(10, 5)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    // delete the max-carrying rows of group 3 — a delta-maintained max
    // would keep the stale maximum
    src.deleteWhere(col("k") === 3L && col("v") >= 303L)
    view.refresh()
    assert(actual(view) === expected(src))
    assert(view.lastRefresh.map(_.mode) === Some("incremental"))
  }

  test("count(distinct x) on a single-table view: affected-key " +
    "recompute keeps it exact through inserts and deletes, and the " +
    "routing rule serves it from the stored column") {
    import spark.implicits._
    val src = sourceTable(20, 5)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Seq("cnt" -> "count(*)", "dv" -> "count(distinct v)"))
    def exp(): Set[(Long, Long, Long)] = src.snapshot().groupBy("k")
      .agg(expr("count(*)").as("cnt"),
        expr("count(distinct v)").as("dv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def got(): Set[(Long, Long, Long)] = view.snapshot().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got() === exp())
    // duplicate-VALUE inserts (300/303 already exist in group 3: the
    // count must not grow) and a value-removing delete — the
    // affected-key recompute keeps both exact
    src.append(Seq((3L, 300L), (3L, 303L)).toDF("k", "v").coalesce(1))
    view.refresh()
    assert(got() === exp())
    assert(got().exists(t => t._1 == 3L && t._2 == 7L && t._3 == 5L),
      "duplicate inserts must grow cnt but not the distinct count")
    src.deleteWhere(col("k") === 4L && col("v") % 3L === 0L)
    view.refresh()
    assert(got() === exp())
    // routed serving: the canonical SQL of count(DISTINCT v) matches
    // the stored definition
    graft.plans.GraftViewRouting.register(spark, view.table.path)
    try {
      val q = spark.read.format("graft").load(src.path).groupBy("k")
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("v")).as("dv"))
      assert(q.queryExecution.optimizedPlan.toString.contains(
        new java.io.File(view.table.path).getName),
        q.queryExecution.optimizedPlan.toString)
      assert(q.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === exp())
    } finally graft.plans.GraftViewRouting.unregister(view.table.path)
  }

  test("a group whose rows all vanish leaves the view") {
    val src = sourceTable(10, 3)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    src.deleteWhere(col("k") === 4L)
    view.refresh()
    assert(actual(view) === expected(src))
    assert(!actual(view).exists(_._1 == 4L))
  }

  test("NULL group keys: maintained via the join fallback, preserved " +
    "by predicate-path refreshes") {
    import spark.implicits._
    val src = new IncrementalTable(spark, freshDir() + "/src")
    src.append(Seq((Some(1L), 10L), (None, 20L), (None, 30L), (Some(2L), 5L))
      .toDF("k", "v"))
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    def asMap = view.snapshot().collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(asMap(-1L) === ((2L, 50L, 30L)))
    // change touching the NULL group → sample contains a null key →
    // semi/anti-join path; result must reflect it
    src.append(Seq((Option.empty[Long], 40L)).toDF("k", "v"))
    view.refresh()
    assert(asMap(-1L) === ((3L, 90L, 40L)))
    // change touching only non-null keys → predicate path; the NULL
    // view row must SURVIVE the rewrite
    src.append(Seq((Some(1L), 11L)).toDF("k", "v"))
    view.refresh()
    assert(asMap(-1L) === ((3L, 90L, 40L)))
    assert(asMap(1L) === ((2L, 21L, 11L)))
    // full equivalence, null-safe (the typed helpers assume non-null k)
    val exp = src.snapshot().groupBy("k")
      .agg(expr("count(*)").as("cnt"), expr("sum(v)").as("total"),
        expr("max(v)").as("top")).collect().map(_.toSeq).toSet
    assert(view.snapshot().collect().map(_.toSeq).toSet === exp)
  }

  test("big touched-key sets abandon the driver predicate but stay " +
    "incremental") {
    import spark.implicits._
    val n = IncrementalView.MaxKeysInPredicate + 40
    val src = sourceTable(n, 2)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    src.updateWhere(col("v") % 2L === 0L, Map("v" -> (col("v") + 1L)))
    view.refresh()
    assert(actual(view) === expected(src))
    val m = view.lastRefresh.get
    assert(m.mode === "incremental")
    assert(m.touchedGroups === n.toLong)
    assert(m.sourceFilesScanned === m.sourceFilesTotal) // no pruning...
    assert(m.viewFilesRewritten === m.viewFilesTotal)   // ...by design
  }

  test("source compaction in the range stays INCREMENTAL " +
    "(datachange=false commits are skipped by the feed)") {
    import spark.implicits._
    val src = sourceTable(10, 3)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    src.append(Seq((3L, 7L)).toDF("k", "v"))
    src.compact(targetFiles = 1) // content-preserving rewrite
    view.refresh()
    assert(actual(view) === expected(src))
    // routine OPTIMIZE must NOT force the O(table) fallback — the
    // compaction contributes nothing to the change feed, so only the
    // appended key recomputes
    assert(view.lastRefresh.map(_.mode) === Some("incremental"))
    assert(view.lastRefresh.map(_.touchedGroups) === Some(1L))
  }

  test("a CDC-less DATA-CHANGING rewrite degrades to a correct full " +
    "refresh") {
    import spark.implicits._
    val src = sourceTable(10, 3)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    // overwrite replaces the whole table without CDC: changes() cannot
    // attribute it, so the refresh must fall back — slower, never wrong
    src.writeSnapshot(
      Seq((1L, 100L), (2L, 200L)).toDF("k", "v"), operation = "overwrite")
    view.refresh()
    assert(actual(view) === expected(src))
    assert(view.lastRefresh.map(_.mode) === Some("full"))
  }

  test("no-op and watermark-only refreshes") {
    val src = sourceTable(5, 2)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    val v0 = view.table.latestVersion.get
    view.refresh() // nothing changed
    assert(view.lastRefresh.map(_.mode) === Some("noop"))
    assert(view.table.latestVersion === Some(v0))
    src.setBloomColumns("k") // property-only source commit, no data
    view.refresh()
    assert(view.lastRefresh.map(_.mode) === Some("noop"))
    assert(view.watermark === src.latestVersion)
    assert(actual(view) === expected(src))
  }

  test("open() reloads the persisted definition and keeps maintaining") {
    import spark.implicits._
    val src = sourceTable(8, 2)
    val dir = freshDir() + "/v"
    val created = IncrementalView.create(spark, src, dir, Seq("k"), Aggs)
    assert(created.watermark === src.latestVersion)
    val reopened = IncrementalView.open(spark, src, dir)
    assert(reopened.groupCols === Seq("k"))
    assert(reopened.aggs === Aggs)
    src.append(Seq((2L, 77L)).toDF("k", "v"))
    reopened.refresh()
    assert(actual(reopened) === expected(src))
    assert(reopened.lastRefresh.map(_.mode) === Some("incremental"))
  }

  test("refresh commits cascade: the view's own change feed carries " +
    "delete+insert images for touched groups only") {
    import spark.implicits._
    val src = sourceTable(10, 2)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    val before = view.table.latestVersion.get
    src.append(Seq((6L, 1234L)).toDF("k", "v"))
    view.refresh()
    val after = view.table.latestVersion.get
    val feed = view.table.changes(before, after)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed === Set((6L, "delete"), (6L, "insert")))
  }

  test("a CDF STREAM on the view table delivers refresh deltas live") {
    import spark.implicits._
    val src = sourceTable(6, 2)
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    def drain(name: String, fromV: Long): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", fromV.toString)
        .load(view.table.path)
        .writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(60000)) finally q.stop()
    }
    // the refresh commit rewrites view files WITH a CDC sidecar: the
    // stream must deliver exactly the touched group's delete+insert
    val v0 = view.table.latestVersion.get
    src.append(Seq((3L, 500L)).toDF("k", "v"))
    view.refresh()
    drain("view_cdf", v0 + 1)
    val rows = spark.table("view_cdf").select("k", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((3L, "delete"), (3L, "insert")))
  }

  test("SQL surface: CREATE MATERIALIZED VIEW parses the maintainable " +
    "shape, REFRESH reopens from the persisted def alone") {
    import spark.implicits._
    val src = sourceTable(12, 3)
    val viewDir = freshDir() + "/v"
    val created = spark.sql(
      s"""CREATE MATERIALIZED VIEW '$viewDir' AS
         |SELECT k, count(*) AS cnt,
         |       cast(sum(cast(v as decimal(18, 2))) as double) AS total,
         |       max(v) AS top
         |FROM '${src.path}' GROUP BY k""".stripMargin).collect()
    assert(created.head.getString(0) === viewDir)
    val view = IncrementalView.open(spark, viewDir) // path-only open
    assert(view.source.path === src.path)
    assert(view.snapshot().count() === 12)
    src.updateWhere(col("k") === 5L, Map("v" -> lit(999L)))
    val refreshed = spark.sql(
      s"REFRESH MATERIALIZED VIEW '$viewDir'").collect().head
    assert(refreshed.getString(0) === "incremental")
    assert(refreshed.getLong(3) === 1L) // touched_groups
    val row = IncrementalView.open(spark, viewDir).snapshot()
      .filter(col("k") === 5L).collect().head
    assert(row.getLong(1) === 3L && row.getLong(3) === 999L)
    // un-aliased aggregate refuses with the shape named (command
    // execution may wrap the IllegalArgumentException — check the chain)
    val err = intercept[Throwable](spark.sql(
      s"""CREATE MATERIALIZED VIEW '${freshDir()}/v2' AS
         |SELECT k, count(*) FROM '${src.path}' GROUP BY k""".stripMargin)
      .collect())
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("AS <alias>"), msgs)
  }

  test("views CHAIN: a view over a view's table refreshes from the " +
    "upstream refresh's CDC") {
    import spark.implicits._
    val src = sourceTable(20, 3)
    val v1 = IncrementalView.create(spark, src, freshDir() + "/v1",
      Seq("k"), Aggs)
    // histogram of group sizes — a real second-level aggregate
    val v2 = IncrementalView.create(spark, v1.table, freshDir() + "/v2",
      Seq("cnt"), Seq("n_groups" -> "count(*)"))
    def hist = v2.snapshot().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist === Map(3L -> 20L))
    src.append(Seq((7L, 1L), (7L, 2L)).toDF("k", "v")) // group 7: 3→5 rows
    v1.refresh()
    v2.refresh()
    assert(v1.lastRefresh.map(_.mode) === Some("incremental"))
    assert(v2.lastRefresh.map(_.mode) === Some("incremental"))
    assert(hist === Map(3L -> 19L, 5L -> 1L))
  }

  test("streaming sink maintains the view chain per micro-batch, " +
    "replay no-ops") {
    import spark.implicits._
    val src = new IncrementalTable(spark, freshDir() + "/src")
    src.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("k"), Aggs)
    val sink = graft.streaming.Streams.maintainedViewSink(src, view)
    sink(Seq((1L, 30L), (3L, 5L)).toDF("k", "v"), 0L)
    assert(actual(view) === expected(src))
    assert(view.lastRefresh.map(_.mode) === Some("incremental"))
    val viewV = view.table.latestVersion
    // failure replay of batch 0: append no-ops on the id watermark,
    // refresh no-ops on the source-version watermark
    sink(Seq((1L, 30L), (3L, 5L)).toDF("k", "v"), 0L)
    assert(view.table.latestVersion === viewV)
    assert(view.lastRefresh.map(_.mode) === Some("noop"))
    assert(actual(view) === expected(src))
  }

  test("two JVMs refreshing the same view: commit arbitration keeps it " +
    "exactly the full aggregate") {
    import java.util.concurrent.TimeUnit
    import spark.implicits._
    val src = sourceTable(25, 3)
    val viewDir = freshDir() + "/v"
    val view = IncrementalView.create(spark, src, viewDir, Seq("k"), Aggs)

    val rounds = 6
    val jdk17AddOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = new java.io.File(new java.io.File(
      sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.lake.ViewRefreshRaceWorker", viewDir, rounds.toString)
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new java.lang.StringBuilder
    val drain = new Thread(() => {
      val s = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
      s.getLines().foreach(l => out.append(l).append('\n'))
    })
    drain.setDaemon(true)
    drain.start()
    try {
      val ready = java.nio.file.Paths.get(viewDir, "_worker_ready")
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(120)
      while (!java.nio.file.Files.exists(ready) &&
        System.nanoTime() < deadline && proc.isAlive) Thread.sleep(100)
      assert(java.nio.file.Files.exists(ready), s"worker never ready:\n$out")
      (0 until rounds).foreach { i =>
        if (i % 2 == 0) // ALL-NEW group key: the delta's key predicate
          // prunes past every view file (removed set EMPTY) — only the
          // requireBase CAS stops two same-watermark refreshes from
          // both landing and double-applying the recompute
          src.append(Seq((1000L + i, 5L)).toDF("k", "v").coalesce(1))
        else
          src.updateWhere(col("k") === (i % 25).toLong,
            Map("v" -> (col("v") + 100L)))
        try view.refresh()
        catch { case _: CommitConflictException => () } // worker won
        Thread.sleep(30)
      }
      assert(proc.waitFor(180, TimeUnit.SECONDS), s"worker timed out:\n$out")
      assert(proc.exitValue() === 0, s"worker failed:\n$out")
    } finally if (proc.isAlive) proc.destroyForcibly()

    // settle, then the invariants: view == full aggregate, no group
    // duplicated by a half-applied rewrite, watermark at source HEAD
    val reopened = IncrementalView.open(spark, viewDir)
    try reopened.refresh()
    catch { case _: CommitConflictException => reopened.refresh() }
    assert(actual(reopened) === expected(src), s"worker log:\n$out")
    val ks = reopened.snapshot().select("k").collect().map(_.getLong(0))
    assert(ks.distinct.length === ks.length,
      s"group duplicated across racing rewrites: ${ks.sorted.toSeq}\n$out")
    assert(reopened.watermark === src.latestVersion, s"worker log:\n$out")
  }

  test("multi-column group keys route through the OR-of-equalities " +
    "predicate") {
    import spark.implicits._
    val src = new IncrementalTable(spark, freshDir() + "/src")
    val rows = for (a <- 0L until 6L; b <- 0L until 4L; i <- 0 until 3)
      yield (a, s"g$b", a * 10 + i)
    src.append(rows.toDF("a", "b", "v").repartitionByRange(3, col("a")))
    val view = IncrementalView.create(spark, src, freshDir() + "/v",
      Seq("a", "b"), Aggs)
    src.updateWhere(col("a") === 2L && col("b") === "g1",
      Map("v" -> lit(500L)))
    view.refresh()
    val exp = src.snapshot().groupBy("a", "b")
      .agg(expr("count(*)").as("cnt"), expr("sum(v)").as("total"),
        expr("max(v)").as("top"))
      .collect().map(r => r.toSeq).toSet
    assert(view.snapshot().collect().map(_.toSeq).toSet === exp)
    assert(view.lastRefresh.map(_.mode) === Some("incremental"))
    assert(view.lastRefresh.map(_.touchedGroups) === Some(1L))
  }
}
