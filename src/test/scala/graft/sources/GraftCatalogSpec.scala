package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.lake.IncrementalTable

/** The catalog SQL surface: `lake.t` name resolution over a warehouse
  * directory, SQL time travel (`VERSION AS OF` / `TIMESTAMP AS OF`),
  * DDL create/drop, and commit visibility across the path write API.
  */
class GraftCatalogSpec extends AnyFunSuite with SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft_wh_").toString

  private def configure(): Unit = {
    spark.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.lake.warehouse", wh)
  }

  test("SQL reads resolve through the catalog; VERSION/TIMESTAMP AS OF time-travel") {
    configure()
    import spark.implicits._
    val t = new IncrementalTable(spark, s"$wh/events")
    t.append(Seq((1L, "a")).toDF("id", "tag"))
    Thread.sleep(1100) // distinct commit timestamps for TIMESTAMP AS OF
    t.append(Seq((2L, "b")).toDF("id", "tag"))

    assert(spark.sql("SELECT count(*) AS n FROM lake.events").head.getLong(0) === 2L)
    assert(spark.sql("SELECT id FROM lake.events VERSION AS OF 0")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // TIMESTAMP AS OF at v0's commit instant sees only v0
    val v0At = t.history().filter("version = 0")
      .select("committed_at").head.getTimestamp(0)
    val lit = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS").format(v0At)
    assert(spark.sql(s"SELECT id FROM lake.events TIMESTAMP AS OF '$lit'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // predicates push through the catalog-resolved scan
    assert(spark.sql("SELECT tag FROM lake.events WHERE id = 2").head.getString(0) === "b")
  }

  test("CREATE TABLE commits an empty v0; path-API writes become visible; DROP removes") {
    configure()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS lake.fresh")
    spark.sql("CREATE TABLE lake.fresh (id BIGINT, tag STRING) USING graft")
    assert(spark.sql("SELECT * FROM lake.fresh").count() === 0L)
    assert(spark.sql("SELECT * FROM lake.fresh").columns.toSeq === Seq("id", "tag"))
    // writes stay on the single manifest-commit path (the table itself
    // is read-only); the catalog resolves the new version per query
    Seq((7L, "x")).toDF("id", "tag")
      .write.format("graft").mode("append").save(s"$wh/fresh")
    assert(spark.sql("SELECT id FROM lake.fresh").head.getLong(0) === 7L)
    spark.sql("DROP TABLE lake.fresh")
    assertThrows[AnalysisException](spark.sql("SELECT * FROM lake.fresh").collect())
  }

  test("maintenance SQL: OPTIMIZE, ZORDER BY, DESCRIBE HISTORY, VACUUM") {
    configure()
    import spark.implicits._
    val t = new IncrementalTable(spark, s"$wh/maint")
    (0 until 4).foreach { i =>
      t.append(Seq((i.toLong, (i * 7 % 5).toLong)).toDF("id", "v").coalesce(1))
    }
    assert(spark.sql("DESCRIBE HISTORY lake.maint").count() === 4L)

    val opt = spark.sql("OPTIMIZE lake.maint").head
    assert(opt.getLong(0) === 4L && opt.getString(1) === "compact")
    assert(t.files(t.latestVersion.get).size === 1)

    spark.sql("OPTIMIZE lake.maint ZORDER BY (id, v)")
    assert(t.operationAt(t.latestVersion.get) === "zorder[id,v]")
    assert(t.snapshot().count() === 4L)

    spark.sql("VACUUM lake.maint KEEP 1 VERSIONS")
    assertThrows[Exception](t.snapshotAt(0L).collect())
    assert(t.snapshot().count() === 4L)
    // quoted-path form resolves too
    assert(spark.sql(s"DESCRIBE HISTORY '$wh/maint'").count() >= 1L)
  }

  test("materialized views are catalog tables: CREATE/REFRESH by name, " +
    "SELECT by name") {
    configure()
    import spark.implicits._
    val t = new IncrementalTable(spark, s"$wh/sales")
    t.append(Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v"))
    spark.sql(
      """CREATE MATERIALIZED VIEW lake.sales_by_k AS
        |SELECT k, count(*) AS cnt, sum(v) AS total
        |FROM lake.sales GROUP BY k""".stripMargin)
    // the view table is a plain incremental table in the warehouse —
    // every reader (SQL by name, connector, stream) just works
    assert(spark.sql("SELECT * FROM lake.sales_by_k ORDER BY k")
      .collect().map(_.toSeq).toSeq === Seq(Seq(1L, 2L, 30L), Seq(2L, 1L, 5L)))
    t.append(Seq((2L, 7L)).toDF("k", "v"))
    val m = spark.sql("REFRESH MATERIALIZED VIEW lake.sales_by_k").head
    assert(m.getString(0) === "incremental" && m.getLong(3) === 1L)
    assert(spark.sql("SELECT total FROM lake.sales_by_k WHERE k = 2")
      .head.getLong(0) === 12L)
  }

  test("readStream resolves through the catalog to the DSv2 stream") {
    configure()
    import spark.implicits._
    val t = new IncrementalTable(spark, s"$wh/stream_t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    val q = spark.readStream.table("lake.stream_t")
      .writeStream.format("memory").queryName("cat_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val sources = q.recentProgress.flatMap(_.sources.map(_.description)).toSeq
    q.stop()
    assert(spark.table("cat_stream").count() === 2L)
    assert(sources.nonEmpty && sources.forall(_.contains("GraftMicroBatchStream")),
      s"expected the DSv2 stream through the catalog, saw: $sources")
  }

  test("optimizeWrite: the reference's Delta TBLPROPERTIES spelling is " +
    "accepted, appends coalesce a many-partition trickle to right-sized " +
    "files, and UNSET turns it back off") {
    configure()
    import spark.implicits._
    // the reference DDL verbatim modulo catalog/provider
    // (test_scd_handler.py:55-57)
    spark.sql(
      """CREATE TABLE lake.ow (id LONG, v STRING)
        |TBLPROPERTIES ('delta.autoOptimize.optimizeWrite'='true')""".stripMargin)
    val t = new IncrementalTable(spark, s"$wh/ow")
    assert(t.optimizeWriteEnabled)
    val props = spark.sql("DESCRIBE DETAIL lake.ow")
      .collect().head.getString(7)
    assert(props.contains("graft.autoOptimize.optimizeWrite=true"), props)
    // a 64-partition trickle batch of 640 rows: without the rebalance
    // it stages 64 shard files; with it, AQE coalesces to a handful
    t.append((0L until 640L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(64))
    val nFiles = t.files(t.latestVersion.get).size
    assert(nFiles <= 4,
      s"optimized write should coalesce the trickle batch, got $nFiles files")
    assert(t.snapshot().count() === 640L)
    spark.sql("ALTER TABLE lake.ow UNSET TBLPROPERTIES " +
      "('graft.autoOptimize.optimizeWrite')")
    assert(!new IncrementalTable(spark, s"$wh/ow").optimizeWriteEnabled)
    t.append((0L until 640L).map(i => (i, s"w$i")).toDF("id", "v")
      .repartition(64))
    val after = t.files(t.latestVersion.get).size - nFiles
    assert(after > 4, s"disabled optimizeWrite must stage as-is, got $after")
  }

  test("autoCompact: trickle appends self-heal past the small-file " +
    "threshold; the append's own version is durable either way") {
    configure()
    import spark.implicits._
    spark.sql(
      """CREATE TABLE lake.ac (id LONG, v STRING)
        |TBLPROPERTIES ('delta.autoOptimize.autoCompact'='true')""".stripMargin)
    val t = new IncrementalTable(spark, s"$wh/ac")
    assert(t.autoCompactEnabled)
    spark.conf.set("spark.graft.autoCompact.minFiles", "8")
    try {
      // 10 one-row appends: past 8 live files the post-append hook
      // packs the small-file tail (datachange=false — feeds skip it)
      (0 until 10).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
      val files = t.files(t.latestVersion.get)
      assert(files.size < 10,
        s"auto-compact should have packed the trickle tail: ${files.size}")
      assert(t.snapshot().count() === 10L)
      assert(t.operationAt(t.latestVersion.get).startsWith("compact-small") ||
        (0L to t.latestVersion.get).exists(v =>
          t.operationAt(v).startsWith("compact-small")),
        "a compact-small commit should exist in the history")
    } finally spark.conf.unset("spark.graft.autoCompact.minFiles")
  }

  test("CREATE TABLE with an illegal property VALUE leaves no half-created table") {
    configure()
    spark.sql("DROP TABLE IF EXISTS lake.badprops")
    intercept[Exception] {
      spark.sql("CREATE TABLE lake.badprops (id BIGINT, k STRING) USING graft " +
        "TBLPROPERTIES ('graft.bloomColumns' = 'k\"bad')")
    }
    // the rejection must land BEFORE the v0 commit — no stranded table
    assert(!new IncrementalTable(spark, s"$wh/badprops").exists,
      "rejected CREATE TABLE left a half-created table behind")
    val names = spark.sql("SHOW TABLES IN lake").collect().map(_.getString(1)).toSet
    assert(!names.contains("badprops"))
  }

  test("a mixed ALTER failing validation applies none of its changes") {
    configure()
    spark.sql("DROP TABLE IF EXISTS lake.atomic_alter")
    spark.sql("CREATE TABLE lake.atomic_alter (id BIGINT, k STRING) USING graft")
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "atomic_alter")
    val t = new IncrementalTable(spark, s"$wh/atomic_alter")
    val before = t.latestVersion
    // valid SET TBLPROPERTIES + a drop of a nonexistent column in ONE
    // statement: the whole statement must be rejected with the property
    // commit NOT applied (no partial application)
    intercept[Exception] {
      cat.alterTable(ident,
        org.apache.spark.sql.connector.catalog.TableChange
          .setProperty("graft.bloomColumns", "k"),
        org.apache.spark.sql.connector.catalog.TableChange
          .deleteColumn(Array("no_such_column"), false))
    }
    assert(t.latestVersion === before, "failed ALTER must commit nothing")
    assert(t.bloomColumns.isEmpty, "property from a failed ALTER leaked")
    // and the same statement without the bad drop applies cleanly
    cat.alterTable(ident,
      org.apache.spark.sql.connector.catalog.TableChange
        .setProperty("graft.bloomColumns", "k"))
    assert(t.bloomColumns === Seq("k"))
  }

  test("a multi-drop statement that would empty the table applies nothing") {
    configure()
    spark.sql("DROP TABLE IF EXISTS lake.two_cols")
    spark.sql("CREATE TABLE lake.two_cols (a BIGINT, b STRING) USING graft")
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "two_cols")
    val t = new IncrementalTable(spark, s"$wh/two_cols")
    val before = t.latestVersion
    // each drop alone passes (the OTHER column still counts as
    // remaining) — only the cumulative check can reject the pair
    intercept[Exception] {
      cat.alterTable(ident,
        org.apache.spark.sql.connector.catalog.TableChange
          .deleteColumn(Array("a"), false),
        org.apache.spark.sql.connector.catalog.TableChange
          .deleteColumn(Array("b"), false))
    }
    assert(t.latestVersion === before, "half the statement applied")
    assert(t.logicalSchema.get.fieldNames.toSeq === Seq("a", "b"))
  }

  test("rename interactions within one ALTER statement apply nothing") {
    configure()
    spark.sql("DROP TABLE IF EXISTS lake.ren_mix")
    spark.sql("CREATE TABLE lake.ren_mix (a BIGINT, b STRING) USING graft")
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "ren_mix")
    val t = new IncrementalTable(spark, s"$wh/ren_mix")
    import org.apache.spark.sql.connector.catalog.TableChange
    def unchanged(label: String)(body: => Unit): Unit = {
      val before = t.latestVersion
      intercept[Exception](body)
      assert(t.latestVersion === before, s"$label half-applied")
      assert(t.logicalSchema.get.fieldNames.toSeq === Seq("a", "b"), label)
    }
    // two renames of the SAME source: first commits a->c, second throws
    unchanged("duplicate rename sources") {
      cat.alterTable(ident,
        TableChange.renameColumn(Array("a"), "c"),
        TableChange.renameColumn(Array("a"), "d"))
    }
    // rename target collides with a column added in the same statement
    unchanged("rename onto added column") {
      cat.alterTable(ident,
        TableChange.addColumn(Array("x"),
          org.apache.spark.sql.types.LongType, true),
        TableChange.renameColumn(Array("a"), "x"))
    }
    // the same column renamed AND dropped
    unchanged("rename + drop of one column") {
      cat.alterTable(ident,
        TableChange.renameColumn(Array("a"), "c"),
        TableChange.deleteColumn(Array("a"), false))
    }
    // an added column renamed onto an EXISTING column: the target
    // check must run pre-commit (the source can't be validated until
    // the add lands, but the target can)
    unchanged("added column renamed onto existing") {
      cat.alterTable(ident,
        TableChange.addColumn(Array("x"),
          org.apache.spark.sql.types.LongType, true),
        TableChange.renameColumn(Array("x"), "b"))
    }
  }

  test("CREATE TABLE rejects a generated column whose expression type mismatches") {
    configure()
    spark.sql("DROP TABLE IF EXISTS lake.gen_mismatch")
    intercept[Exception] {
      spark.sql("CREATE TABLE lake.gen_mismatch (x STRING, " +
        "d DATE GENERATED ALWAYS AS (concat(x, '!'))) USING graft")
    }
    assert(!new IncrementalTable(spark, s"$wh/gen_mismatch").exists,
      "type-mismatched CREATE left a half-created table behind")
  }

  test("CREATE over an existing LOCATION verifies identity instead of mutating") {
    configure()
    spark.sql("DROP TABLE IF EXISTS lake.reg_src")
    spark.sql(
      """CREATE TABLE lake.reg_src (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5),
        |  v STRING) USING graft""".stripMargin)
    val t = new IncrementalTable(spark, s"$wh/reg_src")
    val decl = t.identityDecl
    val vBefore = t.latestVersion
    // same DDL re-registered under another name: pure registration
    spark.sql("DROP TABLE IF EXISTS lake.reg_same")
    spark.sql(
      s"""CREATE TABLE lake.reg_same (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5),
         |  v STRING) USING graft LOCATION '$wh/reg_src'""".stripMargin)
    assert(t.latestVersion === vBefore, "registration must not commit")
    // a DIFFERENT START WITH must be refused, not silently redeclared
    intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE lake.reg_diff (
           |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 99),
           |  v STRING) USING graft LOCATION '$wh/reg_src'""".stripMargin)
    }
    assert(t.identityDecl === decl && t.latestVersion === vBefore,
      "conflicting registration mutated the existing table")
  }

  test("missing tables throw; listTables sees only table directories") {
    configure()
    assertThrows[AnalysisException](spark.sql("SELECT * FROM lake.nope").collect())
    import spark.implicits._
    new IncrementalTable(spark, s"$wh/t_listed")
      .append(Seq((1L, "a")).toDF("id", "tag"))
    val names = spark.sql("SHOW TABLES IN lake").collect().map(_.getString(1)).toSet
    assert(names.contains("t_listed"))
  }
}
