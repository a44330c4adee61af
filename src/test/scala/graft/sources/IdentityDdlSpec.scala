package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.lake.IncrementalTable

/** The reference's own identity DDL (TEST:41 `account_key BIGINT
  * GENERATED ALWAYS AS IDENTITY (START WITH 10)`) through the SQL
  * surface: CREATE TABLE declares it, INSERT allocates from the
  * manifest watermark, GENERATED ALWAYS refuses explicit values,
  * rename/drop of the column refuse, and the counter survives
  * compaction.
  */
class IdentityDdlSpec extends AnyFunSuite with SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft_idwh_").toString

  private def configure(): Unit = {
    spark.conf.set("spark.sql.catalog.idlake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.idlake.warehouse", wh)
  }

  test("CREATE TABLE ... GENERATED ALWAYS AS IDENTITY (START WITH 10): full SQL path") {
    configure()
    spark.sql("DROP TABLE IF EXISTS idlake.accounts")
    spark.sql(
      """CREATE TABLE idlake.accounts (
        |  account_key BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5),
        |  name STRING) USING graft""".stripMargin)
    val t = new IncrementalTable(spark, s"$wh/accounts")
    assert(t.identityDecl === Some(("account_key", 10L, 5L, false)))

    // NULLs (or an omitted column) allocate: first ids = START,
    // START+STEP, ... — the reference notebook's first_run expectation
    spark.sql(
      "INSERT INTO idlake.accounts VALUES (NULL, 'a'), (NULL, 'b'), (NULL, 'c')")
    val ids1 = spark.sql(
      "SELECT account_key FROM idlake.accounts ORDER BY account_key")
      .collect().map(_.getLong(0)).toSeq
    assert(ids1 === Seq(10L, 15L, 20L), s"dense from START WITH: $ids1")

    // GENERATED ALWAYS: explicit values are refused loudly
    val err = intercept[Exception](
      spark.sql("INSERT INTO idlake.accounts VALUES (99, 'x')"))
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("GENERATED ALWAYS")), msgs(err).toString)

    // a DataFrame append OMITTING the column allocates as well
    import spark.implicits._
    Seq("d", "e").toDF("name").write.format("graft")
      .mode("append").save(s"$wh/accounts")
    val ids2 = spark.sql(
      "SELECT account_key FROM idlake.accounts ORDER BY account_key")
      .collect().map(_.getLong(0)).toSeq
    assert(ids2 === Seq(10L, 15L, 20L, 25L, 30L), s"watermark continued: $ids2")

    // the declaration is structural: rename/drop of the column refuse
    assertThrows[Exception](
      spark.sql("ALTER TABLE idlake.accounts RENAME COLUMN account_key TO k"))
    assertThrows[Exception](
      spark.sql("ALTER TABLE idlake.accounts DROP COLUMN account_key"))

    // compaction (no counter meta on its commit) must not reset it
    t.compact(targetFiles = 1)
    assert(t.identityHighWatermark === 30L)
    spark.sql("INSERT INTO idlake.accounts VALUES (NULL, 'f')")
    val ids3 = spark.sql(
      "SELECT account_key FROM idlake.accounts ORDER BY account_key")
      .collect().map(_.getLong(0)).toSeq
    assert(ids3.distinct.size === ids3.size && ids3.max === 35L,
      s"counter must survive compaction: $ids3")
  }

  test("CREATE TABLE with GENERATED ALWAYS AS (expr) routes to the generated-column machinery") {
    configure()
    spark.sql("DROP TABLE IF EXISTS idlake.gen_ddl")
    spark.sql(
      """CREATE TABLE idlake.gen_ddl (
        |  ts TIMESTAMP, d DATE GENERATED ALWAYS AS (CAST(ts AS DATE)),
        |  v BIGINT) USING graft""".stripMargin)
    val t = new IncrementalTable(spark, s"$wh/gen_ddl")
    assert(t.generatedColumns === Map("d" -> "CAST(ts AS DATE)"))
    // a write OMITTING the generated column materializes it (an
    // explicit NULL is a conflicting provided value, as in Delta)
    import spark.implicits._
    Seq((java.sql.Timestamp.valueOf("2026-01-02 03:04:05"), 7L))
      .toDF("ts", "v").write.format("graft").mode("append")
      .save(s"$wh/gen_ddl")
    val row = spark.sql("SELECT ts, d, v FROM idlake.gen_ddl").head
    assert(row.getDate(1).toString === "2026-01-02")
    // conflicting provided values are rejected (derived CHECK)
    assertThrows[Exception](spark.sql(
      "INSERT INTO idlake.gen_ddl VALUES (TIMESTAMP'2026-01-02 03:04:05', DATE'1999-01-01', 8)"))
  }

  test("BY DEFAULT identity accepts explicit values and keeps allocating around them") {
    configure()
    val dir = Files.createTempDirectory("graft_idbd_").toString + "/t"
    import spark.implicits._
    val t = new IncrementalTable(spark, dir)
    t.append(Seq((1000L, "seed")).toDF("id", "v"))
    t.setIdentity("id", start = 1L, step = 1L, allowExplicitInsert = true)
    // explicit id accepted; NULL ids allocated above the watermark
    t.append(Seq((Some(5000L), "explicit"), (None, "alloc"))
      .toDF("id", "v").coalesce(1))
    val rows = t.snapshot().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.map(_._1).distinct.size === 3)
    assert(rows.exists(_ == (5000L, "explicit")))
    val alloc = rows.collect { case (id, "alloc") => id }
    // declaring over populated data SEEDS the watermark past max(id):
    // the allocation continues ABOVE 1000, never re-issuing a used id
    assert(alloc.nonEmpty && alloc.head > 1000L, s"seeded alloc: $alloc")
  }

  test("explicit id above the watermark cannot collide with same-batch allocation") {
    configure()
    val dir = Files.createTempDirectory("graft_idexpl_").toString + "/t"
    import spark.implicits._
    val t = new IncrementalTable(spark, dir)
    t.append(Seq((Option.empty[Long], "seed")).toDF("id", "v"))
    t.setIdentity("id", start = 10L, step = 1L, allowExplicitInsert = true)
    t.append(Seq((Option.empty[Long], "a")).toDF("id", "v")) // wm → 10
    // one explicit id two slots ABOVE the watermark plus two NULL slots:
    // naive dense allocation (11, 12) would duplicate the explicit 12 —
    // allocation must seed past the batch's own explicit maximum
    t.append(Seq((Some(12L), "explicit"), (None, "b"), (None, "c"))
      .toDF("id", "v").coalesce(1))
    val ids = t.snapshot().filter("id IS NOT NULL")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size === ids.size, s"duplicate identity ids: $ids")
    assert(ids.contains(12L))
    // and the allocated ids landed above the explicit value
    val alloc = t.snapshot().filter("v IN ('b','c')").collect().map(_.getLong(0)).toSeq
    assert(alloc.forall(_ > 12L), s"allocated below the explicit id: $alloc")
  }

  test("setIdentity on a populated table seeds the watermark onto the start/step grid") {
    configure()
    val dir = Files.createTempDirectory("graft_idseed_").toString + "/t"
    import spark.implicits._
    val t = new IncrementalTable(spark, dir)
    t.append(Seq((1000L, "seed")).toDF("id", "v"))
    t.setIdentity("id", start = 10L, step = 5L, allowExplicitInsert = true)
    // smallest watermark >= 1000 with w ≡ 10 (mod 5): exactly 1000
    assert(t.identityHighWatermark === 1000L)
    t.append(Seq((Option.empty[Long], "a")).toDF("id", "v"))
    val ids = t.snapshot().orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1000L, 1005L), s"grid-aligned continuation: $ids")
  }

  test("identity counter survives vacuum past the allocating commit") {
    configure()
    val dir = Files.createTempDirectory("graft_idvac_").toString + "/t"
    import spark.implicits._
    val t = new IncrementalTable(spark, dir)
    t.setIdentity("id", start = 1L, step = 1L, allowExplicitInsert = true)
    t.append(Seq((Option.empty[Long], "a"), (None, "b")).toDF("id", "v"))
    assert(t.identityHighWatermark === 2L)
    // non-allocating commits push the allocating manifest out of the
    // retention window; each must CARRY the counter forward
    (1 to 3).foreach(_ => t.compact(targetFiles = 1))
    t.vacuum(keepLast = 2)
    assert(t.identityHighWatermark === 2L,
      "watermark must survive vacuum of the allocating commit")
    t.append(Seq((Option.empty[Long], "c")).toDF("id", "v"))
    val ids = t.snapshot().orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 2L, 3L), s"no re-issued ids after vacuum: $ids")
  }

  test("explicit inserts below the watermark never rewind it; neither does re-declaration") {
    configure()
    val dir = Files.createTempDirectory("graft_idrw_").toString + "/t"
    import spark.implicits._
    val t = new IncrementalTable(spark, dir)
    t.setIdentity("id", start = 1L, step = 1L, allowExplicitInsert = true)
    t.append(Seq((Some(100L), "hi")).toDF("id", "v"))
    assert(t.identityHighWatermark === 100L)
    // an explicit-only batch whose max sits BELOW the watermark
    t.append(Seq((Some(5L), "low")).toDF("id", "v"))
    assert(t.identityHighWatermark === 100L,
      "low explicit insert rewound the identity watermark")
    // re-declaring (e.g. to flip allowExplicitInsert) must not rewind
    t.setIdentity("id", start = 1L, step = 1L, allowExplicitInsert = false)
    assert(t.identityHighWatermark === 100L,
      "re-declaration rewound the identity watermark")
    t.append(Seq((Option.empty[Long], "alloc")).toDF("id", "v"))
    val ids = t.snapshot().collect().map(_.getLong(0)).toSet
    assert(ids === Set(100L, 5L, 101L), s"allocation continued above: $ids")
  }

  test("shallow clone carries the identity declaration and counter") {
    configure()
    val base = Files.createTempDirectory("graft_idclone_").toString
    import spark.implicits._
    val src = new IncrementalTable(spark, s"$base/src")
    src.setIdentity("id", start = 1L, step = 1L, allowExplicitInsert = true)
    src.append(Seq((Option.empty[Long], "a"), (None, "b")).toDF("id", "v"))
    val dst = new IncrementalTable(spark, s"$base/dst")
    dst.cloneFrom(src)
    assert(dst.identityDecl === src.identityDecl)
    dst.append(Seq((Option.empty[Long], "c")).toDF("id", "v"))
    val ids = dst.snapshot().orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 2L, 3L), s"clone continues the counter: $ids")
  }
}
