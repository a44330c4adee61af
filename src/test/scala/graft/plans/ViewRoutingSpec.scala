package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.lake.{IncrementalTable, IncrementalView}

/** Transparent materialized-view routing ([[GraftViewRouting]] +
  * [[RouteAggregatesToViews]]): a matching GROUP BY over a graft
  * source scans the registered FRESH view instead of the source;
  * every mismatch (stale, shape, time travel, filter) fails closed.
  */
class ViewRoutingSpec extends AnyFunSuite with SparkSpec
    with BeforeAndAfterEach {

  override def afterEach(): Unit = GraftViewRouting.clear()

  private def freshPair(): (IncrementalTable, IncrementalView, String) = {
    import spark.implicits._
    val base = Files.createTempDirectory("vr_").toString
    val src = new IncrementalTable(spark, s"$base/src")
    src.append(Seq((1L, 10L), (1L, 5L), (2L, 7L), (3L, 1L))
      .toDF("k", "v").coalesce(1))
    val view = IncrementalView.create(spark, src, s"$base/view",
      Seq("k"), Seq("cnt" -> "count(*)", "total" -> "sum(v)", "top" -> "max(v)"))
    (src, view, base)
  }

  private def srcAgg(src: IncrementalTable): DataFrame =
    spark.read.format("graft").load(src.path)
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))

  private def usesView(df: DataFrame, view: IncrementalView): Boolean =
    df.queryExecution.optimizedPlan.toString.contains(
      new java.io.File(view.table.path).getName)

  private def expected = Set((1L, 2L, 15L), (2L, 1L, 7L), (3L, 1L, 1L))

  private def rows(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("a fresh registered view serves the aggregate") {
    val (src, view, _) = freshPair()
    GraftViewRouting.register(spark, view.table.path)
    val q = srcAgg(src)
    assert(usesView(q, view), q.queryExecution.optimizedPlan.toString)
    assert(rows(q) === expected)
    // and the result matches the unrouted plan bit-for-bit
    spark.conf.set("spark.graft.viewRouting.enabled", "false")
    try {
      val raw = srcAgg(src)
      assert(!usesView(raw, view))
      assert(rows(raw) === expected)
    } finally spark.conf.set("spark.graft.viewRouting.enabled", "true")
  }

  test("unregistered or cleared views never route") {
    val (src, view, _) = freshPair()
    assert(!usesView(srcAgg(src), view))
    GraftViewRouting.register(spark, view.table.path)
    assert(usesView(srcAgg(src), view))
    GraftViewRouting.unregister(view.table.path)
    assert(!usesView(srcAgg(src), view))
  }

  test("a STALE view is bypassed; refresh re-enables routing") {
    import spark.implicits._
    val (src, view, _) = freshPair()
    GraftViewRouting.register(spark, view.table.path)
    src.append(Seq((2L, 100L)).toDF("k", "v"))
    val q = srcAgg(src)
    assert(!usesView(q, view), "stale view must not serve")
    assert(rows(q) === Set((1L, 2L, 15L), (2L, 2L, 107L), (3L, 1L, 1L)))
    view.refresh()
    val q2 = srcAgg(src)
    assert(usesView(q2, view))
    assert(rows(q2) === Set((1L, 2L, 15L), (2L, 2L, 107L), (3L, 1L, 1L)))
  }

  test("shape mismatches fail closed") {
    val (src, view, _) = freshPair()
    GraftViewRouting.register(spark, view.table.path)
    val df = spark.read.format("graft").load(src.path)
    // aggregate the view doesn't carry
    assert(!usesView(df.groupBy("k").agg(avg("v").as("a")), view))
    // different group set
    assert(!usesView(df.groupBy("v").agg(count(lit(1)).as("c")), view))
    // filter on a NON-group column between scan and aggregate
    assert(!usesView(
      df.filter(col("v") > 3).groupBy("k").agg(count(lit(1)).as("c")), view))
    // a subset of the view's aggregates still routes
    assert(usesView(df.groupBy("k").agg(max("v").as("top")), view))
  }

  test("a filter on GROUP columns routes, re-targeted at the view") {
    val (src, view, _) = freshPair()
    GraftViewRouting.register(spark, view.table.path)
    val q = spark.read.format("graft").load(src.path)
      .filter(col("k") < 3L)
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    assert(usesView(q, view), q.queryExecution.optimizedPlan.toString)
    assert(rows(q) === Set((1L, 2L, 15L), (2L, 1L, 7L)))
  }

  test("a NON-DETERMINISTIC filter never re-targets to a view") {
    import graft.lake.{DimSpec, IncrementalJoinView}
    import spark.implicits._
    val (src, view, _) = freshPair()
    GraftViewRouting.register(spark, view.table.path)
    // rand() references no columns, so the references-subset-of-group-
    // columns gate alone would admit it — but dropping random SOURCE
    // rows is not dropping random GROUPS: must fail closed. (A rand
    // tautology like rand()>=0.0 won't do here: Spark 4's optimizer
    // range-folds it away before the rule runs.)
    val q = spark.read.format("graft").load(src.path)
      .filter(rand(7) < 0.5)
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    assert(!usesView(q, view), q.queryExecution.optimizedPlan.toString)
    // unrouted semantics: per-group counts can only shrink, never grow
    assert(q.collect().forall(r => r.getLong(1) <= 2L))

    // same trap on the star path
    val base = Files.createTempDirectory("vr_nd_").toString
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A"), (2L, "B")).toDF("dk", "nation").coalesce(1))
    fact.append(Seq((10L, 1L, 5L), (11L, 2L, 7L))
      .toDF("fk", "ck", "v").coalesce(1))
    IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), Seq("cnt" -> "count(*)"))
    GraftViewRouting.registerJoin(spark, s"$base/view")
    val jq = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("ck") === col("dk"))
      .filter(rand(7) < 0.5)
      .groupBy("nation").agg(count(lit(1)).as("cnt"))
    assert(!jq.queryExecution.optimizedPlan.toString
      .contains(new java.io.File(s"$base/view").getName),
      jq.queryExecution.optimizedPlan.toString)
    assert(jq.collect().forall(r => r.getLong(1) <= 1L))
  }

  test("time-traveled reads never route") {
    val (src, view, _) = freshPair()
    GraftViewRouting.register(spark, view.table.path)
    val tt = spark.read.format("graft")
      .option("versionAsOf", src.latestVersion.get.toString)
      .load(src.path)
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    assert(!usesView(tt, view))
  }

  test("rollup routing: a coarser GROUP BY re-aggregates the view") {
    import spark.implicits._
    val base = Files.createTempDirectory("vr_ru_").toString
    val src = new IncrementalTable(spark, s"$base/src")
    src.append(Seq((1L, "a", 10L), (1L, "b", 5L), (2L, "a", 7L), (2L, "a", 3L))
      .toDF("k", "s", "v").coalesce(1))
    // view is per (k, s); queries per k re-aggregate it
    val view = IncrementalView.create(spark, src, s"$base/view",
      Seq("k", "s"), Seq("cnt" -> "count(*)", "total" -> "sum(v)", "top" -> "max(v)"))
    GraftViewRouting.register(spark, view.table.path)
    val df = spark.read.format("graft").load(src.path)

    val q = df.groupBy("k").agg(count(lit(1)).as("cnt"),
      sum("v").as("total"), max("v").as("top"))
    assert(usesView(q, view), q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet ===
      Set((1L, 2L, 15L, 10L), (2L, 2L, 10L, 7L)))

    // global rollup has no GROUP BY -> empty grouping is not routed
    // (bareGroupNames demands >=1 bare column); stays correct unrouted
    val g = df.agg(sum("v").as("total"))
    assert(g.head.getLong(0) === 25L)

    // avg needs BOTH sum(v) and count(v) in the view — count(*) does
    // not qualify (it counts NULLs): fail closed here
    assert(!usesView(df.groupBy("k").agg(avg("v").as("a")), view))
    // filter on a view group key that the query does NOT group by
    val f = df.filter(col("s") === "a").groupBy("k")
      .agg(count(lit(1)).as("cnt"))
    assert(usesView(f, view), f.queryExecution.optimizedPlan.toString)
    assert(f.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 1L), (2L, 2L)))
  }

  test("avg rollup routes via sum(x)+count(x); NULLs and fractional fail closed") {
    import spark.implicits._
    val base = Files.createTempDirectory("vr_avg_").toString
    val src = new IncrementalTable(spark, s"$base/src")
    // v has a NULL (avg must skip it) and d is fractional (must not route)
    src.append(Seq((1L, "a", Some(10L), 1.5), (1L, "b", Some(5L), 2.5),
      (2L, "a", Some(7L), 0.5), (2L, "b", None, 1.0))
      .toDF("k", "s", "v", "d").coalesce(1))
    val view = IncrementalView.create(spark, src, s"$base/view",
      Seq("k", "s"), Seq("sum_v" -> "sum(v)", "cnt_v" -> "count(v)",
        "sum_d" -> "sum(d)", "cnt_d" -> "count(d)"))
    GraftViewRouting.register(spark, view.table.path)
    val df = spark.read.format("graft").load(src.path)

    val q = df.groupBy("k").agg(avg("v").as("a"))
    assert(usesView(q, view), q.queryExecution.optimizedPlan.toString)
    spark.conf.set("spark.graft.viewRouting.enabled", "false")
    val unrouted = df.groupBy("k").agg(avg("v").as("a"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    spark.conf.set("spark.graft.viewRouting.enabled", "true")
    assert(q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      unrouted)
    assert(unrouted === Set((1L, 7.5), (2L, 7.0))) // NULL skipped

    // fractional input: DOUBLE-typed view sum -> fail closed
    assert(!usesView(df.groupBy("k").agg(avg("d").as("a")), view))
  }

  test("exact-group view wins over rollup when both match") {
    import spark.implicits._
    val base = Files.createTempDirectory("vr_pick_").toString
    val src = new IncrementalTable(spark, s"$base/src")
    src.append(Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("k", "s", "v").coalesce(1))
    val fine = IncrementalView.create(spark, src, s"$base/fine",
      Seq("k", "s"), Seq("cnt" -> "count(*)"))
    val coarse = IncrementalView.create(spark, src, s"$base/coarse",
      Seq("k"), Seq("cnt" -> "count(*)"))
    GraftViewRouting.register(spark, fine.table.path)
    GraftViewRouting.register(spark, coarse.table.path)
    val q = spark.read.format("graft").load(src.path)
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    assert(usesView(q, coarse), "the exact-group view must serve")
    assert(!usesView(q, fine))
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 1L), (2L, 1L)))
  }

  test("a star-join aggregate routes to a fresh join view") {
    import spark.implicits._
    import graft.lake.{DimSpec, IncrementalJoinView}
    val base = Files.createTempDirectory("vr_jv_").toString
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("dk", "nation").coalesce(1))
    fact.append(Seq((10L, 1L, Some(5L)), (11L, 2L, Some(7L)),
      (12L, 3L, None: Option[Long])).toDF("fk", "ck", "v").coalesce(1))
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), Seq("cnt" -> "count(*)", "sv" -> "sum(v)"))
    GraftViewRouting.registerJoin(spark, s"$base/view")

    def joinedAgg() = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("ck") === col("dk"))
      .groupBy("nation").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
    def routed(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
        .contains(new java.io.File(s"$base/view").getName)

    val q = joinedAgg()
    assert(routed(q), q.queryExecution.optimizedPlan.toString)
    // NULL sum contract survives the routed projection (group B's only
    // v is NULL: the stored accumulator is 0, the served sum is NULL)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet ===
      Set(("A", 2L, Some(12L)), ("B", 1L, None)))

    // stale (fact moved): bypassed until refresh
    fact.append(Seq((13L, 1L, Some(1L))).toDF("fk", "ck", "v").coalesce(1))
    assert(!routed(joinedAgg()))
    IncrementalJoinView.open(spark, s"$base/view").refresh()
    assert(routed(joinedAgg()))

    // a dim move also un-freshes the view
    dim.updateWhere(col("dk") === 3L, Map("nation" -> lit("C")))
    assert(!routed(joinedAgg()))
    IncrementalJoinView.open(spark, s"$base/view").refresh()
    assert(routed(joinedAgg()))

    // fail-closed matrix: filter in the shape, wrong keys, wrong groups
    val filtered = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("ck") === col("dk"))
      .filter(col("v") > 0L)
      .groupBy("nation").agg(count(lit(1)).as("cnt"))
    assert(!routed(filtered))
    val wrongKey = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("fk") === col("dk"))
      .groupBy("nation").agg(count(lit(1)).as("cnt"))
    assert(!routed(wrongKey))
    val wrongGroup = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("ck") === col("dk"))
      .groupBy("dk").agg(count(lit(1)).as("cnt"))
    assert(!routed(wrongGroup))
    // count(v) — non-null count — serves straight from the stored
    // __nn_ counter (group C's only v is NULL: count 0, not 1)
    val cq = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("ck") === col("dk"))
      .groupBy("nation").agg(count(col("v")).as("cv"))
    assert(routed(cq), cq.queryExecution.optimizedPlan.toString)
    assert(cq.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("A", 3L), ("C", 0L)))
    // avg over the join routes through the stored sum(v) accumulator
    // and its non-null counter — NULL groups stay NULL, values match
    // the unrouted plan exactly (long accumulator)
    def avgQ() = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("ck") === col("dk"))
      .groupBy("nation").agg(avg("v").as("a"))
    assert(routed(avgQ()), avgQ().queryExecution.optimizedPlan.toString)
    spark.conf.set("spark.graft.viewRouting.enabled", "false")
    val unroutedAvg = avgQ().collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet
    spark.conf.set("spark.graft.viewRouting.enabled", "true")
    assert(avgQ().collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet === unroutedAvg)
  }

  test("a star-join aggregate with a GROUP-column filter routes, " +
    "re-targeted at the view; extremes serve from stored max/min") {
    import spark.implicits._
    import graft.lake.{DimSpec, IncrementalJoinView}
    val base = Files.createTempDirectory("vr_jvf_").toString
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("dk", "nation").coalesce(1))
    fact.append(Seq((10L, 1L, Some(5L)), (11L, 2L, Some(7L)),
      (12L, 3L, None: Option[Long]), (13L, 4L, Some(2L)))
      .toDF("fk", "ck", "v").coalesce(1))
    IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), Seq("cnt" -> "count(*)", "sv" -> "sum(v)",
        "mx" -> "max(v)", "mn" -> "min(v)"))
    GraftViewRouting.registerJoin(spark, s"$base/view")
    def routed(df: DataFrame) = df.queryExecution.optimizedPlan.toString
      .contains(new java.io.File(s"$base/view").getName)
    def star() = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("ck") === col("dk"))

    // THE dashboard shape: WHERE dim-attr GROUP BY dim-attr over the
    // star join — routes to a filtered view scan, O(view) not O(fact)
    val q = star().filter(col("nation") =!= "C")
      .groupBy("nation").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
    assert(routed(q), q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.get(2)))).toSet ===
      Set(("A", 2L, Some(12L)), ("B", 1L, None)))

    // the filter may sit BELOW the join (on the dim leaf) too
    val q2 = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path)
        .filter(col("nation") === "A"), col("ck") === col("dk"))
      .groupBy("nation").agg(count(lit(1)).as("cnt"))
    assert(routed(q2), q2.queryExecution.optimizedPlan.toString)
    assert(q2.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("A", 2L)))

    // a non-group-column filter still fails closed
    assert(!routed(star().filter(col("v") > 0L)
      .groupBy("nation").agg(count(lit(1)).as("cnt"))))

    // max/min serve straight from the stored extremes (with a filter)
    val q3 = star().filter(col("nation") === "A")
      .groupBy("nation").agg(max("v").as("mx"), min("v").as("mn"))
    assert(routed(q3), q3.queryExecution.optimizedPlan.toString)
    assert(q3.collect().map(r => (r.getString(0), Option(r.get(1)),
      Option(r.get(2)))).toSet === Set(("A", Some(7L), Some(5L))))
    // and the all-NULL group's extreme stays NULL through the view
    val q4 = star().groupBy("nation").agg(max("v").as("mx"))
    assert(routed(q4))
    assert(q4.collect().map(r => (r.getString(0), Option(r.get(1)))).toSet ===
      Set(("A", Some(7L)), ("B", None), ("C", Some(2L))))
  }

  test("routed freshness is OPTIMIZATION-time: a source commit after " +
    "planning serves the source-at-watermark answer") {
    import spark.implicits._
    val (src, view, _) = freshPair()
    GraftViewRouting.register(spark, view.table.path)
    val atWatermark = rows(srcAgg(src)) // == view contents
    val q = srcAgg(src)
    q.queryExecution.optimizedPlan // force optimization NOW (view fresh)
    assert(usesView(q, view))
    src.append(Seq((9L, 9L)).toDF("k", "v").coalesce(1)) // commit lands
    // the already-planned query serves the snapshot the plan was
    // validated against — ordinary snapshot-read semantics, pinned
    assert(rows(q) === atWatermark)
    // a NEWLY planned query sees the new commit (stale view bypassed)
    assert(rows(srcAgg(src)) === atWatermark + ((9L, 1L, 9L)))
  }

  test("a coarser GROUP BY re-aggregates a finer join view (rollup)") {
    import spark.implicits._
    import graft.lake.{DimSpec, IncrementalJoinView}
    val base = Files.createTempDirectory("vr_jvr_").toString
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    // dim carries two attributes; the view groups by BOTH, queries by one
    dim.append(Seq((1L, "A", "x"), (2L, "A", "y"), (3L, "B", "x"))
      .toDF("dk", "nation", "zone").coalesce(1))
    fact.append(Seq((10L, 1L, Some(5L)), (11L, 2L, Some(7L)),
      (12L, 3L, None: Option[Long]), (13L, 3L, Some(2L)))
      .toDF("fk", "ck", "v").coalesce(1))
    IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation", "zone"), Seq("cnt" -> "count(*)", "sv" -> "sum(v)"))
    GraftViewRouting.registerJoin(spark, s"$base/view")

    def q() = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("ck") === col("dk"))
      .groupBy("nation")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sv"), avg("v").as("av"),
        count(col("v")).as("cv")) // count(x): rolls up as sum of __nn_
    assert(q().queryExecution.optimizedPlan.toString
      .contains(new java.io.File(s"$base/view").getName),
      q().queryExecution.optimizedPlan.toString)
    spark.conf.set("spark.graft.viewRouting.enabled", "false")
    val unrouted = q().collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toSet
    spark.conf.set("spark.graft.viewRouting.enabled", "true")
    assert(q().collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toSet === unrouted)
  }

  test("CREATE MATERIALIZED VIEW auto-registers for routing when opted in") {
    import spark.implicits._
    val base = Files.createTempDirectory("vr_auto_").toString
    val src = new IncrementalTable(spark, s"$base/src")
    src.append(Seq((1L, 10L), (2L, 7L)).toDF("k", "v").coalesce(1))
    def agg() = spark.read.format("graft").load(src.path)
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    def routedTo(name: String, df: DataFrame) =
      df.queryExecution.optimizedPlan.toString.contains(name)

    // default OFF: the created view does not serve
    spark.sql(s"""CREATE MATERIALIZED VIEW '$base/v_off' AS
                 |SELECT k, count(*) AS cnt FROM '${src.path}'
                 |GROUP BY k""".stripMargin)
    assert(!routedTo("v_off", agg()))

    spark.conf.set("spark.graft.viewRouting.autoRegister", "true")
    try {
      spark.sql(s"""CREATE MATERIALIZED VIEW '$base/v_on' AS
                   |SELECT k, count(*) AS cnt FROM '${src.path}'
                   |GROUP BY k""".stripMargin)
      val q = agg()
      assert(routedTo("v_on", q), q.queryExecution.optimizedPlan.toString)
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 1L), (2L, 1L)))

      // registration is session state — after a "restart" (cleared
      // registry), the first REFRESH re-enables serving too
      GraftViewRouting.clear()
      assert(!routedTo("v_on", agg()))
      spark.sql(s"REFRESH MATERIALIZED VIEW '$base/v_on'")
      assert(routedTo("v_on", agg()),
        agg().queryExecution.optimizedPlan.toString)
    } finally spark.conf.unset("spark.graft.viewRouting.autoRegister")
  }

  test("a star-join aggregate written as CATALOG SQL routes to the join view") {
    import spark.implicits._
    import graft.lake.{DimSpec, IncrementalJoinView}
    val wh = Files.createTempDirectory("vr_jvcat_").toString
    spark.conf.set("spark.sql.catalog.jvcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.jvcat.warehouse", wh)
    val fact = new IncrementalTable(spark, s"$wh/fact")
    val dim = new IncrementalTable(spark, s"$wh/dim")
    dim.append(Seq((1L, "A"), (2L, "B")).toDF("dk", "nation").coalesce(1))
    fact.append(Seq((10L, 1L, 5L), (11L, 2L, 7L), (12L, 1L, 3L))
      .toDF("fk", "ck", "v").coalesce(1))
    IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$wh/dim", "ck", "dk")), s"$wh/jv",
      Seq("nation"), Seq("cnt" -> "count(*)", "sv" -> "sum(v)"))
    GraftViewRouting.registerJoin(spark, s"$wh/jv")
    val q = spark.sql(
      """SELECT nation, count(*) AS cnt, sum(v) AS sv
        |FROM jvcat.fact JOIN jvcat.dim ON ck = dk
        |WHERE nation = 'A'
        |GROUP BY nation""".stripMargin)
    // "jv/data" — the view table's scan; the catalog dir name itself
    // contains "jv", so a bare contains("jv") would pass unrouted
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("jv/data"), plan)
    assert(!plan.contains("fact/data"), s"fact still scanned:\n$plan")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))).toSet === Set(("A", 2L, 8L)))
  }

  test("count(DISTINCT x) over the star join serves from the view's " +
    "stored distinct count; an uncarried distinct fails closed") {
    import spark.implicits._
    import graft.lake.{DimSpec, IncrementalJoinView}
    val base = Files.createTempDirectory("vr_jvd_").toString
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("dk", "nation").coalesce(1))
    fact.append(Seq((10L, 1L, Some(5L)), (11L, 2L, Some(5L)),
      (12L, 3L, None: Option[Long])).toDF("fk", "ck", "v").coalesce(1))
    IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/jvd",
      Seq("nation"), Seq("cnt" -> "count(*)", "du" -> "count(distinct v)"))
    GraftViewRouting.registerJoin(spark, s"$base/jvd")
    def star() = spark.read.format("graft").load(fact.path)
      .join(spark.read.format("graft").load(dim.path), col("ck") === col("dk"))
    def routed(df: DataFrame) =
      df.queryExecution.optimizedPlan.toString.contains("jvd/data")
    val q = star().groupBy("nation")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("v")).as("du"))
    assert(routed(q), q.queryExecution.optimizedPlan.toString)
    // A's duplicate 5s collapse to 1; B's all-NULL v counts 0 — the
    // stored-column projection must preserve both contracts
    assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet === Set(("A", 2L, 1L), ("B", 1L, 0L)))
    // a distinct agg the view does not carry fails closed
    val other = star().groupBy("nation")
      .agg(countDistinct(col("fk")).as("dfk"))
    assert(!routed(other))
    assert(other.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("A", 2L), ("B", 1L)))
  }

  test("discovery: a FRESH session re-attaches registrations from " +
    "_viewdef sidecars via discoverPaths — zero manual registration") {
    val (src, view, base) = freshPair()
    // simulate the process restart: JVM-local registries wiped, new
    // session state, only a conf pointing at the warehouse
    GraftViewRouting.clear()
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.viewRouting.discoverPaths", base)
    val q = s2.read.format("graft").load(src.path)
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    assert(usesView(q, view), q.queryExecution.optimizedPlan.toString)
    assert(rows(q) === expected)
    // a session WITHOUT the conf discovers nothing after a clear
    GraftViewRouting.clear()
    val s3 = spark.newSession()
    val q3 = s3.read.format("graft").load(src.path)
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    assert(!usesView(q3, view))
    assert(rows(q3) === expected)
  }

  test("discovery: autoRegister scans configured graft-catalog " +
    "warehouses, descends namespaces, skips broken sidecars") {
    import spark.implicits._
    import graft.lake.{DimSpec, IncrementalJoinView}
    val wh = Files.createTempDirectory("vr_disc_").toString
    val fact = new IncrementalTable(spark, s"$wh/fact")
    val dim = new IncrementalTable(spark, s"$wh/dim")
    dim.append(Seq((1L, "A"), (2L, "B")).toDF("dk", "nation").coalesce(1))
    fact.append(Seq((10L, 1L, 5L), (11L, 2L, 7L), (12L, 1L, 3L))
      .toDF("fk", "ck", "v").coalesce(1))
    // the join view lives under a NAMESPACE dir (depth 2) — discovery
    // must descend through non-table directories
    IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$wh/dim", "ck", "dk")), s"$wh/serving/jv",
      Seq("nation"), Seq("cnt" -> "count(*)", "sv" -> "sum(v)"))
    // a directory with a corrupt sidecar must be skipped, not fatal
    val junk = new java.io.File(s"$wh/junk"); junk.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$wh/junk/_viewdef"),
      "not-a-viewdef".getBytes("UTF-8"))

    GraftViewRouting.clear()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.discwh",
      classOf[graft.sources.GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.discwh.warehouse", wh)
    s2.conf.set("spark.graft.viewRouting.autoRegister", "true")
    val q = s2.sql(
      """SELECT nation, count(*) AS cnt, sum(v) AS sv
        |FROM discwh.fact JOIN discwh.dim ON ck = dk
        |GROUP BY nation""".stripMargin)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("jv/data"), plan)
    assert(!plan.contains("fact/data"), s"fact still scanned:\n$plan")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet === Set(("A", 2L, 8L), ("B", 1L, 7L)))
  }

  test("SQL through the catalog routes too") {
    import spark.implicits._
    val wh = Files.createTempDirectory("vr_cat_").toString
    spark.sql(s"DROP TABLE IF EXISTS vrcat.t")
    spark.conf.set("spark.sql.catalog.vrcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vrcat.warehouse", wh)
    val srcPath = s"$wh/t"
    val src = new IncrementalTable(spark, srcPath)
    src.append(Seq((1L, 10L), (2L, 7L)).toDF("k", "v").coalesce(1))
    val view = IncrementalView.create(spark, src, s"$wh/t_view",
      Seq("k"), Seq("cnt" -> "count(*)", "total" -> "sum(v)"))
    GraftViewRouting.register(spark, view.table.path)
    // sum(v) pins the qualifier canonicalization: a catalog plan's
    // attribute renders `sum(vrcat.t.v)`, which must still match the
    // view's declared `sum(v)`
    val q = spark.sql(
      "SELECT k, count(*) AS cnt, sum(v) AS total FROM vrcat.t GROUP BY k")
    assert(usesView(q, view), q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet === Set((1L, 1L, 10L), (2L, 1L, 7L)))
  }
}
