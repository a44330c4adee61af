package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Delta-maintained star-schema views ([[IncrementalJoinView]]):
  * signed-delta maintenance must equal a from-scratch join aggregate
  * after ANY DML history, groups must appear/vanish with their rows,
  * sum's NULL contract must survive the accumulator representation,
  * and everything non-delta-exact must be rejected at create.
  */
class IncrementalJoinViewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mkBase(): String =
    Files.createTempDirectory("jv_").toString

  /** fact(k, grp-via-dim, v); dim(dk, nation). */
  private def mkTables(base: String): (IncrementalTable, IncrementalTable) = {
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("dk", "nation").coalesce(1))
    fact.append(Seq((10L, 1L, Some(5L)), (11L, 2L, Some(7L)),
      (12L, 3L, Some(2L)), (13L, 3L, None))
      .toDF("fk", "ck", "v").coalesce(1))
    (fact, dim)
  }

  private def aggs = Seq("cnt" -> "count(*)", "sv" -> "sum(v)")

  private def expected(fact: IncrementalTable, dim: IncrementalTable): Set[(String, Long, Option[Long])] =
    fact.snapshot().join(dim.snapshot(), col("ck") === col("dk"))
      .groupBy("nation").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet

  private def got(view: IncrementalJoinView): Set[(String, Long, Option[Long])] =
    view.snapshot().collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet

  test("delta refreshes equal the from-scratch aggregate across a DML arc") {
    val base = mkBase()
    val (fact, dim) = mkTables(base)
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), aggs)
    assert(got(view) === expected(fact, dim))

    // insert-only delta (new group C appears)
    fact.append(Seq((14L, 4L, Some(9L)), (15L, 1L, Some(1L)))
      .toDF("fk", "ck", "v").coalesce(1))
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "delta"),
      view.lastRefresh.toString)
    assert(got(view) === expected(fact, dim))

    // update images (pre -, post +)
    fact.updateWhere(col("fk") === 11L, Map("v" -> lit(100L)))
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "delta"))
    assert(got(view) === expected(fact, dim))

    // delete: group C vanishes (its only row), group B loses its NULL row
    fact.deleteWhere(col("fk").isin(14L, 13L))
    view.refresh()
    assert(got(view) === expected(fact, dim))
    assert(!got(view).exists(_._1 == "C"), "emptied group must disappear")

    // refresh with no changes: noop
    val v0 = view.table.latestVersion.get
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "noop"))
    assert(view.table.latestVersion.contains(v0))
  }

  test("avg(x): stored as sum + non-null count, divided at read — delta " +
    "maintenance equals a from-scratch avg across the arc, NULL when no " +
    "non-null input survives") {
    val base = mkBase()
    val (fact, dim) = mkTables(base)
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), Seq("cnt" -> "count(*)", "av" -> "avg(v)"))
    def gotAvg: Map[String, Option[Double]] =
      view.snapshot().collect()
        .map(r => r.getString(0) ->
          Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    def expAvg: Map[String, Option[Double]] =
      fact.snapshot().join(dim.snapshot(), col("ck") === col("dk"))
        .groupBy("nation")
        .agg(avg(col("v").cast("double")).as("av"))
        .collect().map(r => r.getString(0) ->
          Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(gotAvg === expAvg)
    assert(gotAvg("B") === Some(2.0), "NULL input must not dilute the avg")
    // insert delta shifts the average; update rewrites a value;
    // delete drops group B's only non-null row -> its avg goes NULL
    fact.append(Seq((14L, 1L, Some(11L))).toDF("fk", "ck", "v").coalesce(1))
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "delta"))
    assert(gotAvg === expAvg)
    fact.updateWhere(col("fk") === 11L, Map("v" -> lit(100L)))
    view.refresh()
    assert(gotAvg === expAvg)
    fact.deleteWhere(col("fk") === 12L)
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "delta"))
    assert(gotAvg === expAvg)
    assert(gotAvg("B") === None,
      "a group whose non-null inputs all left must serve NULL avg")
  }

  test("sum NULL contract survives delta maintenance of the accumulator") {
    val base = mkBase()
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A")).toDF("dk", "nation").coalesce(1))
    // the group's only rows carry NULL v -> sum must be NULL, not 0
    fact.append(Seq((1L, 1L, None: Option[Long])).toDF("fk", "ck", "v").coalesce(1))
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), aggs)
    assert(got(view) === Set(("A", 1L, None)))
    // a non-null row arrives -> sum materializes
    fact.append(Seq((2L, 1L, Some(4L))).toDF("fk", "ck", "v").coalesce(1))
    view.refresh()
    assert(got(view) === Set(("A", 2L, Some(4L))))
    // ...and leaves again -> back to NULL (nn drops to 0)
    fact.deleteWhere(col("fk") === 2L)
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "delta"))
    assert(got(view) === Set(("A", 1L, None)))
  }

  test("hybrid max/min: greatest/least on insert, PRUNED group recompute " +
    "on an extreme-deleting delete") {
    val base = mkBase()
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("dk", "nation").coalesce(1))
    // three key-clustered fact FILES so the recompute's factKey IN (…)
    // predicate has something to prune
    fact.append(Seq((10L, 1L, Some(5L)), (11L, 2L, Some(7L)),
      (16L, 1L, Some(50L))).toDF("fk", "ck", "v").coalesce(1))
    fact.append(Seq((12L, 3L, Some(2L)), (13L, 3L, None: Option[Long]),
      (17L, 3L, Some(30L))).toDF("fk", "ck", "v").coalesce(1))
    fact.append(Seq((14L, 4L, Some(9L)), (18L, 4L, Some(40L)))
      .toDF("fk", "ck", "v").coalesce(1))
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), Seq("cnt" -> "count(*)", "sv" -> "sum(v)",
        "mx" -> "max(v)", "mn" -> "min(v)"))

    def exp(): Set[(String, Long, Option[Long], Option[Long], Option[Long])] =
      fact.snapshot().join(dim.snapshot(), col("ck") === col("dk"))
        .groupBy("nation").agg(count(lit(1)).as("cnt"), sum("v").as("sv"),
          max("v").as("mx"), min("v").as("mn"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    def gotX(): Set[(String, Long, Option[Long], Option[Long], Option[Long])] =
      view.snapshot().collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    assert(gotX() === exp())

    // insert-only delta raises A's max: pure greatest merge, fact NEVER scanned
    fact.append(Seq((19L, 1L, Some(60L))).toDF("fk", "ck", "v").coalesce(1))
    view.refresh()
    assert(view.lastRefresh.exists(m => m.mode == "delta" &&
      m.sourceFilesScanned == 0), view.lastRefresh.toString)
    assert(gotX() === exp())

    // deleting a NON-extreme row (v=7: neither A's max 60 nor min 5)
    // stays pure delta — no recompute
    fact.deleteWhere(col("fk") === 11L)
    view.refresh()
    assert(view.lastRefresh.exists(m => m.mode == "delta" &&
      m.sourceFilesScanned == 0), view.lastRefresh.toString)
    assert(gotX() === exp())

    // a same-key update that RAISES the max: pre-image delete (50) is
    // below the stored max, post-image insert folds in — still no scan
    fact.updateWhere(col("fk") === 16L, Map("v" -> lit(500L)))
    view.refresh()
    assert(view.lastRefresh.exists(m => m.mode == "delta" &&
      m.sourceFilesScanned == 0), view.lastRefresh.toString)
    assert(gotX() === exp())

    // REGRESSION (round-9 self-review): a row appended AND deleted in
    // the SAME refresh window must not leave its value as the served
    // max — "an insert >= stored makes the deletes moot" is unsound
    // precisely here, so this window must recompute
    fact.append(Seq((30L, 1L, Some(9999L))).toDF("fk", "ck", "v").coalesce(1))
    fact.deleteWhere(col("fk") === 30L)
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "delta"))
    assert(gotX() === exp(), "in-window insert+delete leaked into the max")

    // same trap for a BRAND-NEW group: its would-be extreme arrives
    // and dies in one window; the survivor must win, not the corpse
    dim.append(Seq((5L, "D")).toDF("dk", "nation").coalesce(1))
    view.refresh() // dim moved: full fallback re-pins the dim watermark
    fact.append(Seq((31L, 5L, Some(100L)), (32L, 5L, Some(777L)))
      .toDF("fk", "ck", "v").coalesce(1))
    fact.deleteWhere(col("fk") === 32L)
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "delta"),
      view.lastRefresh.toString)
    assert(gotX() === exp(), "new-group in-window delete leaked")
    assert(gotX().exists(t => t._1 == "D" && t._4 == Some(100L)))

    // deleting A's MAX (500): group A recomputes from fact ⋈ dim, and
    // the scan is FILE-PRUNED by ck IN (1,2) — the B- and C-only files
    // are never read
    fact.deleteWhere(col("fk") === 16L)
    view.refresh()
    val m1 = view.lastRefresh.get
    assert(m1.mode == "delta" && m1.sourceFilesScanned > 0 &&
      m1.sourceFilesScanned < m1.sourceFilesTotal, m1.toString)
    assert(gotX() === exp())

    // deleting A's MIN (5) recomputes too (min side of the hybrid)
    fact.deleteWhere(col("fk") === 10L)
    view.refresh()
    val m2 = view.lastRefresh.get
    assert(m2.mode == "delta" && m2.sourceFilesScanned > 0 &&
      m2.sourceFilesScanned < m2.sourceFilesTotal, m2.toString)
    assert(gotX() === exp())

    // a group emptied by deletes vanishes without any recompute scan
    fact.deleteWhere(col("ck") === 4L)
    view.refresh()
    assert(view.lastRefresh.exists(m => m.mode == "delta" &&
      m.sourceFilesScanned == 0), view.lastRefresh.toString)
    assert(gotX() === exp())
    assert(!gotX().exists(_._1 == "C"))

    // NULL v rows never disturb an extreme (B keeps max 30 / min 2)
    assert(gotX().exists(t => t._1 == "B" && t._4 == Some(30L) &&
      t._5 == Some(2L)))

    // and open() round-trips the extreme definition
    val reopened = IncrementalJoinView.open(spark, s"$base/view")
    assert(reopened.snapshot().columns.toSeq ===
      Seq("nation", "cnt", "sv", "mx", "mn"))
  }

  test("count(distinct x): affected-group recompute on any touching " +
    "delta, pure delta on null-arg rows, duplicates never inflate") {
    val base = mkBase()
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("dk", "nation").coalesce(1))
    // key-clustered fact files so the recompute's ck IN (…) can prune
    fact.append(Seq((10L, 1L, Some(5L)), (11L, 2L, Some(5L)),
      (16L, 1L, Some(50L))).toDF("fk", "ck", "v").coalesce(1))
    fact.append(Seq((12L, 3L, Some(2L)), (13L, 3L, None: Option[Long]))
      .toDF("fk", "ck", "v").coalesce(1))
    fact.append(Seq((14L, 4L, Some(9L))).toDF("fk", "ck", "v").coalesce(1))
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), Seq("cnt" -> "count(*)", "du" -> "count(distinct v)"))

    def exp(): Set[(String, Long, Long)] =
      fact.snapshot().join(dim.snapshot(), col("ck") === col("dk"))
        .groupBy("nation").agg(count(lit(1)).as("cnt"),
          countDistinct(col("v")).as("du"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def gotD(): Set[(String, Long, Long)] =
      view.snapshot().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotD() === exp())
    assert(gotD() === Set(("A", 3L, 2L), ("B", 2L, 1L), ("C", 1L, 1L)))

    // a NULL-arg insert cannot change a distinct count: pure delta
    fact.append(Seq((20L, 3L, None: Option[Long]))
      .toDF("fk", "ck", "v").coalesce(1))
    view.refresh()
    assert(view.lastRefresh.exists(m => m.mode == "delta" &&
      m.sourceFilesScanned == 0), view.lastRefresh.toString)
    assert(gotD() === exp())

    // inserting a DUPLICATE value (A gets another 5): the count must
    // NOT grow — unknowable from the view alone, so the group
    // recomputes, file-pruned (the B- and C-only files are never read)
    fact.append(Seq((21L, 2L, Some(5L))).toDF("fk", "ck", "v").coalesce(1))
    view.refresh()
    val mi = view.lastRefresh.get
    assert(mi.mode == "delta" && mi.sourceFilesScanned > 0 &&
      mi.sourceFilesScanned < mi.sourceFilesTotal, mi.toString)
    assert(gotD() === exp())
    assert(gotD().exists(t => t._1 == "A" && t._3 == 2L),
      "duplicate insert inflated the distinct count")

    // deleting ONE duplicate keeps the count; deleting a UNIQUE value
    // drops it — both recompute (a delete is never delta-applicable)
    fact.deleteWhere(col("fk") === 21L)
    view.refresh()
    assert(gotD() === exp())
    assert(gotD().exists(t => t._1 == "A" && t._3 == 2L))
    fact.deleteWhere(col("fk") === 16L)
    view.refresh()
    val md = view.lastRefresh.get
    assert(md.mode == "delta" && md.sourceFilesScanned > 0, md.toString)
    assert(gotD() === exp())
    assert(gotD().exists(t => t._1 == "A" && t._3 == 1L))

    // a group emptied by deletes vanishes
    fact.deleteWhere(col("ck") === 4L)
    view.refresh()
    assert(gotD() === exp())
    assert(!gotD().exists(_._1 == "C"))

    // open() round-trips the distinct definition and keeps maintaining
    val reopened = IncrementalJoinView.open(spark, s"$base/view")
    assert(reopened.snapshot().columns.toSeq === Seq("nation", "cnt", "du"))
    fact.append(Seq((22L, 1L, Some(123L))).toDF("fk", "ck", "v").coalesce(1))
    reopened.refresh()
    assert(gotD() === exp())
  }

  test("multi-column count(distinct a, b): rows count iff EVERY arg is " +
    "non-null, null-in-any rows are invisible, duplicates never inflate") {
    val base = mkBase()
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("dk", "nation").coalesce(1))
    fact.append(Seq(
      (1L, 1L, Some(5L), Some("x")), (2L, 2L, Some(5L), Some("x")),
      (3L, 1L, Some(5L), Some("y")))
      .toDF("fk", "ck", "u", "w").coalesce(1))
    fact.append(Seq((4L, 3L, Some(7L), None: Option[String]))
      .toDF("fk", "ck", "u", "w").coalesce(1))
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), Seq("cnt" -> "count(*)", "dt" -> "count(distinct u, w)"))

    def exp(): Set[(String, Long, Long)] =
      fact.snapshot().join(dim.snapshot(), col("ck") === col("dk"))
        .groupBy("nation").agg(count(lit(1)).as("cnt"),
          countDistinct(col("u"), col("w")).as("dt"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def got(): Set[(String, Long, Long)] =
      view.snapshot().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got() === exp())
    // B's only row has a null w: the tuple never exists
    assert(got() === Set(("A", 3L, 2L), ("B", 1L, 0L)))

    // a null-in-ONE-arg insert is invisible to the tuple count: pure
    // delta, zero recompute scan
    fact.append(Seq((5L, 3L, None: Option[Long], Some("z")))
      .toDF("fk", "ck", "u", "w").coalesce(1))
    view.refresh()
    assert(view.lastRefresh.exists(m => m.mode == "delta" &&
      m.sourceFilesScanned == 0), view.lastRefresh.toString)
    assert(got() === exp())

    // a duplicate TUPLE (A gets another (5, x)) must not inflate —
    // unknowable from the view alone, so the group recomputes
    fact.append(Seq((6L, 2L, Some(5L), Some("x")))
      .toDF("fk", "ck", "u", "w").coalesce(1))
    view.refresh()
    assert(got() === exp())
    assert(got().exists(t => t._1 == "A" && t._3 == 2L),
      "duplicate tuple inflated the distinct count")

    // deleting the only (5, y) row drops that tuple
    fact.deleteWhere(col("fk") === 3L)
    view.refresh()
    assert(got() === exp())
    assert(got().exists(t => t._1 == "A" && t._3 == 1L))

    // open() round-trips the multi-column definition
    val reopened = IncrementalJoinView.open(spark, s"$base/view")
    fact.append(Seq((7L, 1L, Some(8L), Some("q")))
      .toDF("fk", "ck", "u", "w").coalesce(1))
    reopened.refresh()
    assert(got() === exp())
    assert(got().exists(t => t._1 == "A" && t._3 == 2L))
  }

  test("a dim change degrades to a full recompute (and is correct)") {
    val base = mkBase()
    val (fact, dim) = mkTables(base)
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), aggs)
    // re-nation customer 3: B -> C. Delta maintenance cannot see this
    // (the fact feed is empty) - the dim watermark forces full
    dim.updateWhere(col("dk") === 3L, Map("nation" -> lit("C")))
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "full"), view.lastRefresh.toString)
    assert(got(view) === expected(fact, dim))
  }

  test("non-delta-exact shapes are rejected at create") {
    val base = mkBase()
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A")).toDF("dk", "nation").coalesce(1))
    fact.append(Seq((1L, 1L, 1.5)).toDF("fk", "ck", "d").coalesce(1))
    def dimSpec = Seq(DimSpec(s"$base/dim", "ck", "dk"))
    // double sum: order-dependent, refused
    val e1 = intercept[IllegalArgumentException] {
      IncrementalJoinView.create(spark, fact, dimSpec, s"$base/v1",
        Seq("nation"), Seq("cnt" -> "count(*)", "sd" -> "sum(d)"))
    }
    assert(e1.getMessage.contains("delta-exact"))
    // avg over a DOUBLE argument: its stored accumulator is a double
    // sum — order-dependent, refused like sum(d) (avg over integral/
    // decimal IS accepted: stored as sum + nn, divided at read)
    val e2 = intercept[IllegalArgumentException] {
      IncrementalJoinView.create(spark, fact, dimSpec, s"$base/v2",
        Seq("nation"), Seq("cnt" -> "count(*)", "m" -> "avg(d)"))
    }
    assert(e2.getMessage.contains("delta-exact"))
    // no count(*): liveness untrackable, refused
    val e3 = intercept[IllegalArgumentException] {
      IncrementalJoinView.create(spark, fact, dimSpec, s"$base/v3",
        Seq("nation"), Seq("sv" -> "sum(cast(d as decimal(18,2)))"))
    }
    assert(e3.getMessage.contains("count(*)"))
    // a malformed distinct argument list still refuses at create, not
    // as an opaque ParseException inside the first materialization
    val e4 = intercept[IllegalArgumentException] {
      IncrementalJoinView.create(spark, fact, dimSpec, s"$base/v4",
        Seq("nation"), Seq("cnt" -> "count(*)", "dd" -> "count(distinct fk,)"))
    }
    assert(e4.getMessage.contains("parse"), e4.getMessage)
    // ...and the struct form IS accepted and maintained correctly
    val v = IncrementalJoinView.create(spark, fact, dimSpec, s"$base/v5",
      Seq("nation"), Seq("cnt" -> "count(*)", "dd" -> "count(distinct struct(fk, ck))"))
    fact.append(Seq((2L, 1L, 2.5), (1L, 1L, 9.9)).toDF("fk", "ck", "d").coalesce(1))
    v.refresh()
    val got = v.snapshot().collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("A", 3L, 2L))) // (1,1) duplicated: 3 rows, 2 tuples
  }

  test("SNOWFLAKE chain (dim of dim): delta maintenance, extremes and " +
    "recompute all work when a dim joins on a previous dim's column") {
    val base = mkBase()
    val fact = new IncrementalTable(spark, s"$base/fact")
    val cust = new IncrementalTable(spark, s"$base/cust")
    val nat = new IncrementalTable(spark, s"$base/nat")
    nat.append(Seq((100L, "A"), (200L, "B")).toDF("nk", "nation").coalesce(1))
    cust.append(Seq((1L, 100L), (2L, 100L), (3L, 200L))
      .toDF("ck", "cnk").coalesce(1))
    fact.append(Seq((10L, 1L, 5L), (11L, 2L, 7L), (12L, 3L, 2L))
      .toDF("fk", "fck", "v").coalesce(1))
    // chain: fact.fck = cust.ck, then cust.cnk = nat.nk — the second
    // DimSpec's "factKey" is a CUSTOMER column, not a fact column
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/cust", "fck", "ck"),
        DimSpec(s"$base/nat", "cnk", "nk")), s"$base/view",
      Seq("nation"),
      Seq("cnt" -> "count(*)", "sv" -> "sum(v)", "mx" -> "max(v)"))
    def expect(): Set[(String, Long, Long, Long)] =
      fact.snapshot().join(cust.snapshot(), col("fck") === col("ck"))
        .join(nat.snapshot(), col("cnk") === col("nk"))
        .groupBy("nation")
        .agg(count(lit(1)).as("cnt"), sum("v").as("sv"), max("v").as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    def got(): Set[(String, Long, Long, Long)] =
      view.snapshot().collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got() === expect())

    // insert-only delta through the chain
    fact.append(Seq((13L, 3L, 9L)).toDF("fk", "fck", "v").coalesce(1))
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "delta"))
    assert(got() === expect())

    // extreme-deleting delete: group A's max (7) goes — the recompute
    // must run even though the nation dim's join key is NOT a fact
    // column (its prune conjunct is dropped, never mis-planned)
    fact.deleteWhere(col("fk") === 11L)
    view.refresh()
    assert(view.lastRefresh.exists(m => m.mode == "delta" &&
      m.sourceFilesScanned > 0), view.lastRefresh.toString)
    assert(got() === expect())

    // a mid-chain dim change falls back to a full recompute
    cust.updateWhere(col("ck") === 1L, Map("cnk" -> lit(200L)))
    view.refresh()
    assert(view.lastRefresh.exists(_.mode == "full"))
    assert(got() === expect())

    // transparent routing matches the snowflake chain too
    graft.plans.GraftViewRouting.registerJoin(spark, s"$base/view")
    try {
      val q = spark.read.format("graft").load(fact.path)
        .join(spark.read.format("graft").load(cust.path),
          col("fck") === col("ck"))
        .join(spark.read.format("graft").load(nat.path),
          col("cnk") === col("nk"))
        .groupBy("nation").agg(count(lit(1)).as("cnt"), sum("v").as("sv"),
          max("v").as("mx"))
      assert(q.queryExecution.optimizedPlan.toString
        .contains(new java.io.File(s"$base/view").getName),
        q.queryExecution.optimizedPlan.toString)
      assert(q.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet === expect())
    } finally graft.plans.GraftViewRouting.clear()
  }

  test("SQL surface: CREATE MATERIALIZED VIEW with JOIN builds a join view; " +
    "REFRESH dispatches on the persisted definition") {
    val base = mkBase()
    val (fact, dim) = mkTables(base)
    val viewDir = s"$base/view"
    val created = spark.sql(
      s"""CREATE MATERIALIZED VIEW '$viewDir' AS
         |SELECT nation, count(*) AS cnt, sum(v) AS sv
         |FROM '${fact.path}' JOIN '${dim.path}' ON ck = dk
         |GROUP BY nation""".stripMargin).collect()
    assert(created.head.getString(0) === viewDir)
    assert(IncrementalJoinView.isJoinView(spark, viewDir))
    val view = IncrementalJoinView.open(spark, viewDir)
    assert(view.dimSpecs === Seq(DimSpec(dim.path, "ck", "dk")))
    assert(got(view) === expected(fact, dim))

    fact.append(Seq((20L, 1L, Some(3L))).toDF("fk", "ck", "v").coalesce(1))
    val refreshed = spark.sql(
      s"REFRESH MATERIALIZED VIEW '$viewDir'").collect()
    assert(refreshed.head.getString(0) === "delta", refreshed.head.toString)
    assert(got(IncrementalJoinView.open(spark, viewDir)) ===
      expected(fact, dim))

    // an ON clause neither side of which is a dim column refuses loudly
    val err = intercept[Throwable](spark.sql(
      s"""CREATE MATERIALIZED VIEW '$base/v2' AS
         |SELECT nation, count(*) AS cnt
         |FROM '${fact.path}' JOIN '${dim.path}' ON ck = fk
         |GROUP BY nation""".stripMargin).collect())
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("exactly one side"), msgs)

    // a non-inner join type is rejected UP FRONT with its own message,
    // not a downstream mis-split 'no graft table' error
    for (kw <- Seq("LEFT JOIN", "LEFT OUTER JOIN", "FULL JOIN", "CROSS JOIN")) {
      val e = intercept[Throwable](spark.sql(
        s"""CREATE MATERIALIZED VIEW '$base/v3' AS
           |SELECT nation, count(*) AS cnt
           |FROM '${fact.path}' $kw '${dim.path}' ON ck = dk
           |GROUP BY nation""".stripMargin).collect())
      val ms = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(ms.contains("not supported"), s"$kw: $ms")
    }

    // INNER JOIN is the standard synonym of bare JOIN — accepted, not
    // mis-split into a 't1 INNER' table token
    val inner = spark.sql(
      s"""CREATE MATERIALIZED VIEW '$base/v_inner' AS
         |SELECT nation, count(*) AS cnt
         |FROM '${fact.path}' INNER JOIN '${dim.path}' ON ck = dk
         |GROUP BY nation""".stripMargin).collect()
    assert(inner.head.getString(0) === s"$base/v_inner")
    assert(IncrementalJoinView.isJoinView(spark, s"$base/v_inner"))

    // count(distinct x) through the DDL builds a distinct-maintaining
    // view (the select-list splitter must not split inside the call)
    val dml = spark.sql(
      s"""CREATE MATERIALIZED VIEW '$base/v_du' AS
         |SELECT nation, count(*) AS cnt, count(distinct v) AS du
         |FROM '${fact.path}' JOIN '${dim.path}' ON ck = dk
         |GROUP BY nation""".stripMargin).collect()
    assert(dml.head.getString(0) === s"$base/v_du")
    val duView = IncrementalJoinView.open(spark, s"$base/v_du")
    assert(duView.snapshot().columns.toSeq === Seq("nation", "cnt", "du"))
    assert(duView.snapshot().collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet ===
      fact.snapshot().join(dim.snapshot(), col("ck") === col("dk"))
        .groupBy("nation")
        .agg(count(lit(1)).as("cnt"), countDistinct(col("v")).as("du"))
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSet)

    // a quoted table path containing the text ' join ' must not split
    val weirdDir = s"$base/has join in name"
    val weird = new IncrementalTable(spark, weirdDir)
    weird.append(Seq((1L, 2L)).toDF("a", "b").coalesce(1))
    val ok = spark.sql(
      s"""CREATE MATERIALIZED VIEW '$base/v4' AS
         |SELECT a, count(*) AS cnt FROM '$weirdDir' GROUP BY a""".stripMargin)
      .collect()
    assert(ok.head.getString(0) === s"$base/v4")
  }

  test("maintainedViewSink drives join views per micro-batch, replay no-ops") {
    val base = mkBase()
    val (fact, dim) = mkTables(base)
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"), aggs)
    val sink = graft.streaming.Streams.maintainedViewSink(fact, view)
    val batch = Seq((30L, 1L, Some(8L)), (31L, 4L, Some(2L)))
      .toDF("fk", "ck", "v")
    sink(batch, 0L)
    assert(view.lastRefresh.exists(_.mode == "delta"))
    assert(got(view) === expected(fact, dim))
    val v0 = view.table.latestVersion.get
    sink(batch, 0L) // replayed micro-batch: append no-ops, refresh no-ops
    assert(view.table.latestVersion.contains(v0))
    assert(got(view) === expected(fact, dim))
  }

  test("two JVMs refreshing the same join view: commit arbitration " +
    "keeps it exactly the full join aggregate — including ALL-NEW-GROUP " +
    "deltas whose removed-file set is empty") {
    import java.util.concurrent.TimeUnit
    val base = mkBase()
    val (fact, dim) = mkTables(base)
    // extra dims with UNUSED nations: appending fact rows against them
    // creates brand-new groups each round — the delta then removes NO
    // view files (stats prune past the new group value), the case
    // removed-file arbitration alone cannot catch; only the
    // requireBase CAS keeps two same-watermark refreshes from both
    // landing and doubling the new group's counts
    dim.append((0 until 8).map(i => (10L + i, s"N$i"))
      .toDF("dk", "nation").coalesce(1))
    val viewDir = s"$base/view"
    val view = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), viewDir,
      Seq("nation"), aggs)

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
      "graft.lake.JoinViewRefreshRaceWorker", viewDir, rounds.toString)
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
        if (i % 2 == 0) // ALL-NEW group: delta removes no view files
          fact.append(Seq((100L + i, 10L + i, Some(7L)))
            .toDF("fk", "ck", "v").coalesce(1))
        else // pre-existing groups: delta rewrites touched view files
          fact.updateWhere(col("fk") === (10L + i % 4),
            Map("v" -> (coalesce(col("v"), lit(0L)) + 100L)))
        try view.refresh()
        catch { case _: CommitConflictException => () } // worker won
        Thread.sleep(30)
      }
      assert(proc.waitFor(180, TimeUnit.SECONDS), s"worker timed out:\n$out")
      assert(proc.exitValue() === 0, s"worker failed:\n$out")
    } finally if (proc.isAlive) proc.destroyForcibly()

    val reopened = IncrementalJoinView.open(spark, viewDir)
    try reopened.refresh()
    catch { case _: CommitConflictException => reopened.refresh() }
    assert(got(reopened) === expected(fact, dim), s"worker log:\n$out")
    val ns = reopened.snapshot().select("nation").collect().map(_.getString(0))
    assert(ns.distinct.length === ns.length,
      s"group duplicated across racing rewrites: ${ns.sorted.toSeq}\n$out")
    assert(reopened.watermark === fact.latestVersion, s"worker log:\n$out")
  }

  test("open() rebuilds from the persisted definition; decimal sums stay exact") {
    val base = mkBase()
    val fact = new IncrementalTable(spark, s"$base/fact")
    val dim = new IncrementalTable(spark, s"$base/dim")
    dim.append(Seq((1L, "A"), (2L, "B")).toDF("dk", "nation").coalesce(1))
    fact.append(Seq((1L, 1L, 10.25), (2L, 2L, 0.75))
      .toDF("fk", "ck", "p").coalesce(1))
    val created = IncrementalJoinView.create(spark, fact,
      Seq(DimSpec(s"$base/dim", "ck", "dk")), s"$base/view",
      Seq("nation"),
      Seq("cnt" -> "count(*)", "sp" -> "sum(cast(p as decimal(18,2)))"))
    fact.append(Seq((3L, 1L, 0.10)).toDF("fk", "ck", "p").coalesce(1))
    val reopened = IncrementalJoinView.open(spark, s"$base/view")
    reopened.refresh()
    assert(reopened.lastRefresh.exists(_.mode == "delta"))
    val rows = reopened.snapshot().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString))
      .toSet
    assert(rows === Set(("A", 2L, "10.35"), ("B", 1L, "0.75")))
    assert(created.aggs === reopened.aggs)
  }
}
