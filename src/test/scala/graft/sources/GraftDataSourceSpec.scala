package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.lake.VersionedTable

/** `spark.read.format("graft")`: manifest-resolved version reads with
  * Delta-style versionAsOf / timestampAsOf, delegating bytes to the
  * engine's parquet DSv2 (so pushdown survives the indirection).
  */
class GraftDataSourceSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): (VersionedTable, String) = {
    val dir = Files.createTempDirectory("graft_dsv2_").toString
    (new VersionedTable(spark, dir), dir)
  }

  test("latest read, versionAsOf, and timestampAsOf resolve through manifests") {
    import spark.implicits._
    val (vt, dir) = freshTable()
    vt.write(Seq((1L, "v0")).toDF("id", "tag"))
    Thread.sleep(20)
    val tsBetween = System.currentTimeMillis()
    Thread.sleep(20)
    vt.write(Seq((1L, "v1"), (2L, "v1")).toDF("id", "tag"))

    val latest = spark.read.format("graft").load(dir)
    assert(latest.count() === 2L)
    assert(latest.select("tag").distinct().as[String].collect().toSeq === Seq("v1"))

    val v0 = spark.read.format("graft").option("versionAsOf", "0").load(dir)
    assert(v0.as[(Long, String)].collect().toSeq === Seq((1L, "v0")))

    val ts = spark.read.format("graft")
      .option("timestampAsOf", tsBetween.toString).load(dir)
    assert(ts.as[(Long, String)].collect().toSeq === Seq((1L, "v0")))
  }

  test("uncommitted version directories stay invisible") {
    import spark.implicits._
    val (vt, dir) = freshTable()
    vt.write(Seq((1L, "committed")).toDF("id", "tag"))
    // a crashed writer: data directory exists, manifest never landed
    Seq((99L, "orphan")).toDF("id", "tag")
      .write.parquet(s"$dir/v=1")
    val seen = spark.read.format("graft").load(dir)
    assert(seen.select("tag").as[String].collect().toSeq === Seq("committed"))
  }

  test("missing version and empty table fail loudly") {
    import spark.implicits._
    val (vt, dir) = freshTable()
    assertThrows[Exception](spark.read.format("graft").load(dir).collect())
    vt.write(Seq((1L, "x")).toDF("id", "tag"))
    assertThrows[Exception](
      spark.read.format("graft").option("versionAsOf", "7").load(dir).collect())
  }

  test("write path commits versions: overwrite, append, ignore, errorIfExists") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_w_").toString + "/t"
    Seq((1L, "a")).toDF("id", "tag")
      .write.format("graft").mode("overwrite").save(dir)
    Seq((2L, "b")).toDF("id", "tag")
      .write.format("graft").mode("append").save(dir)
    val vt = new VersionedTable(spark, dir)
    assert(vt.latestVersion === Some(1L))
    assert(spark.read.format("graft").load(dir)
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    assert(spark.read.format("graft").option("versionAsOf", "0").load(dir)
      .as[(Long, String)].collect().toSeq === Seq((1L, "a")))
    // ignore: no new version; errorIfExists: throws
    Seq((9L, "z")).toDF("id", "tag")
      .write.format("graft").mode("ignore").save(dir)
    assert(vt.latestVersion === Some(1L))
    assertThrows[Exception](Seq((9L, "z")).toDF("id", "tag")
      .write.format("graft").mode("errorifexists").save(dir))
  }

  test("reads incremental-manifest tables with the same time-travel options") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_inc_").toString + "/t"
    val it = new graft.lake.IncrementalTable(spark, dir)
    it.writeSnapshot(Seq((1L, "a")).toDF("id", "tag"))
    it.append(Seq((2L, "b")).toDF("id", "tag"))
    assert(spark.read.format("graft").load(dir)
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    assert(spark.read.format("graft").option("versionAsOf", "0").load(dir)
      .as[(Long, String)].collect().toSeq === Seq((1L, "a")))
  }

  test("writes to an incremental-layout table route through its manifest protocol") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_incw_").toString + "/t"
    val it = new graft.lake.IncrementalTable(spark, dir)
    it.writeSnapshot(Seq((1L, "a")).toDF("id", "tag"))
    // a save through the connector must NOT publish a VersionedTable
    // manifest into the shared _log (that would brick incremental reads)
    Seq((2L, "b")).toDF("id", "tag")
      .write.format("graft").mode("append").save(dir)
    assert(it.latestVersion === Some(1L))
    assert(spark.read.format("graft").load(dir)
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    Seq((3L, "c")).toDF("id", "tag")
      .write.format("graft").mode("overwrite").save(dir)
    assert(it.latestVersion === Some(2L))
    assert(it.snapshot().as[(Long, String)].collect().toSeq === Seq((3L, "c")))
    // time travel still resolves across the connector's commits
    assert(spark.read.format("graft").option("versionAsOf", "1").load(dir)
      .count() === 2L)
    assertThrows[Exception](Seq((9L, "z")).toDF("id", "tag")
      .write.format("graft").mode("errorifexists").save(dir))
  }

  test("connector reads see the evolved schema; time travel keeps the written one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_evo_").toString + "/t"
    val it = new graft.lake.IncrementalTable(spark, dir)
    it.append(Seq((1L, "a")).toDF("id", "tag"))
    it.append(Seq((2L, "b", 0.5)).toDF("id", "tag", "score"))
    val latest = spark.read.format("graft").load(dir)
    assert(latest.columns.toSeq === Seq("id", "tag", "score"))
    val rows = latest.orderBy("id").collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) === 0.5)
    // explicit version: the schema its files were written with
    assert(spark.read.format("graft").option("versionAsOf", "0").load(dir)
      .columns.toSeq === Seq("id", "tag"))
  }

  test("catalog tables over graft paths: CREATE TABLE USING graft LOCATION") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dsv2_sql_").toString + "/t"
    val it = new graft.lake.IncrementalTable(spark, dir)
    it.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    spark.sql("DROP TABLE IF EXISTS graft_sql_t")
    spark.sql(s"CREATE TABLE graft_sql_t USING graft LOCATION '$dir'")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM graft_sql_t").as[Long].head() === 2L)
      // commits made after table creation are visible (manifest-resolved)
      it.append(Seq((3L, "c")).toDF("id", "tag"))
      assert(spark.table("graft_sql_t").count() === 3L)
      assert(spark.sql("SELECT tag FROM graft_sql_t WHERE id = 3").as[String].head() === "c")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_t")
  }

  test("predicate pushdown reaches the parquet scan through the connector") {
    import spark.implicits._
    val (vt, dir) = freshTable()
    vt.write((0L until 100L).map(i => (i, s"t$i")).toDF("id", "tag"))
    val q = spark.read.format("graft").load(dir).filter(col("id") > 90)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)"),
      s"filter not pushed through graft connector:\n$plan")
    assert(q.count() === 9L)
  }

  test("time-travel / streaming timestamps parse leniently (ISO-8601, bare dates)") {
    import graft.lake.IncrementalTable.parseTimestampMillis
    val ref = java.sql.Timestamp.valueOf("2026-01-02 03:04:05").getTime
    assert(parseTimestampMillis("2026-01-02 03:04:05") === ref)
    assert(parseTimestampMillis("2026-01-02T03:04:05") === ref)
    assert(parseTimestampMillis("2026-01-02") ===
      java.sql.Timestamp.valueOf("2026-01-02 00:00:00").getTime)
    assert(parseTimestampMillis("1700000000000") === 1700000000000L)
    assert(parseTimestampMillis(" 2026-01-02T03:04:05 ") === ref)
    intercept[IllegalArgumentException](parseTimestampMillis("not-a-time"))
  }
}
