package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** SQL DML against graft-catalog incremental tables: DELETE / UPDATE
  * route to the manifest-commit row-level DML (touched-file rewrite or
  * deletion vectors, CDC sidecars), MERGE INTO commits a new version,
  * and RESTORE rewinds — all through `spark.sql`.
  */
class DmlSqlSpec extends AnyFunSuite with SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft_dml_wh_").toString

  private def configure(): Unit = {
    spark.conf.set("spark.sql.catalog.dml", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dml.warehouse", wh)
  }

  private def mk(name: String): IncrementalTable = {
    import spark.implicits._
    val t = new IncrementalTable(spark, s"$wh/$name")
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("pk", "v", "n").coalesce(1))
    t
  }
  private def state(name: String): Seq[(Long, String, Long)] = {
    import spark.implicits._
    new IncrementalTable(spark, s"$wh/$name").snapshot()
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
  }

  test("SQL DELETE routes to touched-file DML with CDC") {
    configure()
    val t = mk("del")
    spark.sql("DELETE FROM dml.del WHERE n >= 20")
    assert(state("del") === Seq((1L, "a", 10L)))
    assert(t.operationAt(t.latestVersion.get) === "delete")
    val cdc = t.changes(0L, 1L).select("pk", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cdc === Set((2L, "delete"), (3L, "delete")))
  }

  test("SQL DELETE with qualified alias predicate") {
    configure()
    mk("delq")
    spark.sql("DELETE FROM dml.delq t WHERE t.pk = 2")
    assert(state("delq").map(_._1) === Seq(1L, 3L))
  }

  test("graft.dml.deletionVectors=true makes SQL DELETE merge-on-read") {
    configure()
    val t = mk("deldv")
    val filesBefore = t.files(0L).toSet
    spark.conf.set("graft.dml.deletionVectors", "true")
    try spark.sql("DELETE FROM dml.deldv WHERE pk = 1")
    finally spark.conf.unset("graft.dml.deletionVectors")
    assert(t.files(1L).toSet === filesBefore) // no data file rewritten
    assert(t.operationAt(1L) === "delete[dv]")
    assert(state("deldv").map(_._1) === Seq(2L, 3L))
  }

  test("SQL UPDATE routes to simultaneous-assignment DML with pre/post CDC") {
    configure()
    val t = mk("upd")
    spark.sql("UPDATE dml.upd SET n = n * 10, v = concat(v, '!') WHERE pk <= 2")
    assert(state("upd") === Seq((1L, "a!", 100L), (2L, "b!", 200L), (3L, "c", 30L)))
    val cdc = t.changes(0L, 1L).select("pk", "n", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(cdc === Set(
      (1L, 10L, "update_preimage"), (1L, 100L, "update_postimage"),
      (2L, 20L, "update_preimage"), (2L, 200L, "update_postimage")))
  }

  test("MERGE WITH SCHEMA EVOLUTION evolves new source columns into the table") {
    configure()
    import spark.implicits._
    val t = mk("mrg_evo")
    Seq((2L, "B", 200L, "note2"), (9L, "i", 90L, "note9"))
      .toDF("pk", "v", "n", "note").createOrReplaceTempView("mrg_evo_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO dml.mrg_evo t
        |USING mrg_evo_src s ON t.pk = s.pk
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = t.snapshot().orderBy("pk")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq
    assert(t.snapshot().columns.toSeq === Seq("pk", "v", "n", "note"))
    assert(rows === Seq((1L, null), (2L, "note2"), (3L, null), (9L, "note9")))
    // the evolved column is tracked: a later plain append sees it
    assert(t.tableSchema.get.fieldNames.contains("note"))
  }

  test("MERGE INTO a graft table commits a manifest version") {
    configure()
    import spark.implicits._
    val t = mk("mrg")
    Seq((2L, "B", 200L), (9L, "i", 90L)).toDF("pk", "v", "n")
      .createOrReplaceTempView("mrg_src")
    spark.sql(
      """MERGE INTO dml.mrg t USING mrg_src s ON t.pk = s.pk
        |WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state("mrg") === Seq(
      (1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L), (9L, "i", 90L)))
    assert(t.operationAt(t.latestVersion.get) === "merge")
    // history intact: v0 still time-travels
    assert(t.snapshotAt(0L).count() === 3L)
  }

  test("RESTORE TABLE ... TO VERSION AS OF rewinds via SQL") {
    configure()
    mk("rst")
    spark.sql("DELETE FROM dml.rst WHERE pk = 1")
    assert(state("rst").map(_._1) === Seq(2L, 3L))
    val row = spark.sql("RESTORE TABLE dml.rst TO VERSION AS OF 0").head
    assert(row.getLong(0) === 0L && row.getLong(1) === 2L)
    assert(state("rst").map(_._1) === Seq(1L, 2L, 3L))
  }

  test("SQL INSERT INTO / INSERT OVERWRITE commit manifest versions") {
    configure()
    val t = mk("ins")
    spark.sql("INSERT INTO dml.ins VALUES (7, 'g', 70), (8, 'h', 80)")
    assert(state("ins").map(_._1) === Seq(1L, 2L, 3L, 7L, 8L))
    assert(t.operationAt(t.latestVersion.get) === "append")
    // INSERT INTO ... SELECT
    spark.sql("INSERT INTO dml.ins SELECT pk + 100, v, n FROM dml.ins WHERE pk = 1")
    assert(state("ins").map(_._1) === Seq(1L, 2L, 3L, 7L, 8L, 101L))
    // INSERT OVERWRITE replaces the snapshot, atomically and undoably
    spark.sql("INSERT OVERWRITE dml.ins VALUES (9, 'z', 90)")
    assert(state("ins") === Seq((9L, "z", 90L)))
    assert(t.operationAt(t.latestVersion.get) === "overwrite")
    assert(t.snapshotAt(t.latestVersion.get - 1).count() === 6L) // history intact
  }

  test("CTAS and ALTER TABLE ADD COLUMNS through the catalog") {
    configure()
    mk("ctas_src")
    spark.sql("DROP TABLE IF EXISTS dml.ctas_dst")
    spark.sql(
      "CREATE TABLE dml.ctas_dst AS SELECT pk, n * 2 AS n2 FROM dml.ctas_src WHERE pk <= 2")
    import spark.implicits._
    assert(spark.table("dml.ctas_dst").as[(Long, Long)].collect().sortBy(_._1).toSeq
      === Seq((1L, 20L), (2L, 40L)))

    spark.sql("ALTER TABLE dml.ctas_dst ADD COLUMNS (note STRING)")
    val t = new IncrementalTable(spark, s"$wh/ctas_dst")
    assert(t.operationAt(t.latestVersion.get) === "alter_add_columns")
    // existing rows read the new column as NULL; inserts can fill it
    assert(spark.sql("SELECT note FROM dml.ctas_dst").collect().forall(_.isNullAt(0)))
    spark.sql("INSERT INTO dml.ctas_dst VALUES (5, 50, 'x')")
    assert(spark.sql("SELECT count(*) FROM dml.ctas_dst WHERE note = 'x'")
      .head.getLong(0) === 1L)
    // retype is rejected (it would rewrite every historical file) —
    // DROP COLUMN, once rejected here, is now a metadata-only mapping
    // commit (see ColumnMappingSpec)
    assertThrows[Exception](
      spark.sql("ALTER TABLE dml.ctas_dst ALTER COLUMN n2 TYPE STRING"))
    spark.sql("ALTER TABLE dml.ctas_dst DROP COLUMN note")
    assert(new IncrementalTable(spark, s"$wh/ctas_dst")
      .logicalSchema.get.fieldNames.toSeq === Seq("pk", "n2"))
  }

  test("VACUUM RETAIN HOURS and DESCRIBE DETAIL") {
    configure()
    val t = mk("detail")
    spark.sql("DELETE FROM dml.detail WHERE pk = 1") // v1 + CDC
    val d = spark.sql("DESCRIBE DETAIL dml.detail").head
    assert(d.getString(0) === "graft")
    assert(d.getLong(2) === 1L) // version
    assert(d.getInt(3) >= 1 && d.getLong(4) > 0L) // files, bytes
    assert(d.getLong(5) === 0L) // no pending deletion vectors
    assert(d.getString(6).contains("pk"))

    spark.conf.set("graft.dml.deletionVectors", "true")
    try spark.sql("DELETE FROM dml.detail WHERE pk = 2")
    finally spark.conf.unset("graft.dml.deletionVectors")
    assert(spark.sql("DESCRIBE DETAIL dml.detail").head.getLong(5) === 1L)

    // everything was committed seconds ago -> RETAIN 1 HOURS keeps all
    spark.sql("VACUUM dml.detail RETAIN 1 HOURS")
    assert(new IncrementalTable(spark, s"$wh/detail").versionExists(0L))
    // KEEP 1 VERSIONS drops history
    spark.sql("VACUUM dml.detail KEEP 1 VERSIONS")
    assert(!new IncrementalTable(spark, s"$wh/detail").versionExists(0L))
  }

  test("connector path reads fail loudly under deletion vectors") {
    configure()
    val t = mk("dvguard")
    t.deleteVector(org.apache.spark.sql.functions.col("pk") === 1L)
    val err = intercept[Exception](
      spark.sql("SELECT * FROM dml.dvguard").collect())
    assert(err.getMessage.contains("deletion vectors"))
    // opt-out reads the raw files (deleted rows included)
    assert(spark.read.format("graft").option("ignoreDeletionVectors", "true")
      .load(s"$wh/dvguard").count() === 3L)
    // OPTIMIZE materializes; SQL reads work again
    spark.sql("OPTIMIZE dml.dvguard")
    assert(spark.sql("SELECT count(*) AS n FROM dml.dvguard").head.getLong(0) === 2L)
  }
}
