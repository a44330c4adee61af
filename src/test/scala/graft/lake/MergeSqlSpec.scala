package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** SQL MERGE INTO on plain parquet catalog tables, end to end through
  * the injected parser (GraftExtensions → GraftMergeParser →
  * MergeIntoGraftCommand → lake.MergeInto). The scenarios mirror
  * Spark/Delta MERGE semantics: first-match-wins clause ordering,
  * conditional inserts, star actions, NOT MATCHED BY SOURCE.
  */
class MergeSqlSpec extends AnyFunSuite with SparkSpec {

  private def setup(tag: String): Unit = {
    import spark.implicits._
    // DROP alone can't clear orphan dirs left by a previous JVM (the
    // in-memory catalog forgets tables, the warehouse keeps the files)
    for (t <- Seq(s"tgt_$tag", s"src_$tag", s"tgt_${tag}__graft_dml_staging")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("pk", "v", "n").write.saveAsTable(s"tgt_$tag")
    Seq((2L, "B", 200L, "U"), (3L, "C", 300L, "D"), (4L, "d", 40L, "I"),
      (5L, "e", -1L, "I"))
      .toDF("pk", "v", "n", "op").write.saveAsTable(s"src_$tag")
  }

  private def state(tag: String): Seq[(Long, String, Long)] = {
    import spark.implicits._
    spark.table(s"tgt_$tag").select("pk", "v", "n")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
  }

  test("full clause mix: conditional delete, update, conditional insert, by-source delete") {
    setup("mix")
    spark.sql(
      """MERGE INTO tgt_mix t USING src_mix s ON t.pk = s.pk
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n + 1
        |WHEN NOT MATCHED AND s.n > 0 THEN INSERT (pk, v, n) VALUES (s.pk, s.v, s.n)
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    // pk=1: no source row -> by-source delete; pk=2: update; pk=3: delete;
    // pk=4: insert; pk=5: insert condition fails (n=-1) -> dropped
    assert(state("mix") === Seq((2L, "B", 201L), (4L, "d", 40L)))
  }

  test("first-match-wins among matched clauses") {
    setup("fmw")
    spark.sql(
      """MERGE INTO tgt_fmw t USING src_fmw s ON t.pk = s.pk
        |WHEN MATCHED AND s.n >= 200 THEN UPDATE SET v = 'first'
        |WHEN MATCHED THEN UPDATE SET v = 'second'""".stripMargin)
    // pk=2 (n=200) and pk=3 (n=300) both hit the FIRST clause
    assert(state("fmw") === Seq((1L, "a", 10L), (2L, "first", 20L), (3L, "first", 30L)))
  }

  test("UPDATE SET * and INSERT * expand against the target schema") {
    setup("star")
    spark.sql(
      """MERGE INTO tgt_star t USING
        |  (SELECT pk, v, n FROM src_star WHERE op <> 'X') s ON t.pk = s.pk
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state("star") === Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "C", 300L),
      (4L, "d", 40L), (5L, "e", -1L)))
  }

  test("NOT MATCHED BY SOURCE UPDATE flags unmatched target rows") {
    setup("bysrc")
    spark.sql(
      """MERGE INTO tgt_bysrc t USING src_bysrc s ON t.pk = s.pk
        |WHEN NOT MATCHED BY SOURCE AND t.n < 100 THEN UPDATE SET v = 'stale'""".stripMargin)
    assert(state("bysrc") === Seq((1L, "stale", 10L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("DELETE FROM and UPDATE on parquet catalog tables") {
    setup("dml")
    spark.sql("DELETE FROM tgt_dml WHERE n >= 30")
    assert(state("dml") === Seq((1L, "a", 10L), (2L, "b", 20L)))
    spark.sql("UPDATE tgt_dml SET v = upper(v), n = n * 10 WHERE pk = 2")
    assert(state("dml") === Seq((1L, "a", 10L), (2L, "B", 200L)))
    // unconditional update touches every row
    spark.sql("UPDATE tgt_dml SET n = n + 1")
    assert(state("dml") === Seq((1L, "a", 11L), (2L, "B", 201L)))
  }

  test("UPDATE with table alias in the condition") {
    setup("alias")
    spark.sql("UPDATE tgt_alias t SET v = 'x' WHERE t.n = 20")
    assert(state("alias") === Seq((1L, "a", 10L), (2L, "x", 20L), (3L, "c", 30L)))
  }

  test("DML never clobbers a user table that shares the staging prefix") {
    import spark.implicits._
    setup("stg")
    // a user table unluckily named like a fixed staging name must survive
    spark.sql("DROP TABLE IF EXISTS tgt_stg__graft_dml_staging")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "tgt_stg__graft_dml_staging")
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    Seq((77L, "precious")).toDF("k", "v")
      .write.saveAsTable("tgt_stg__graft_dml_staging")
    spark.sql("UPDATE tgt_stg SET n = n + 1")
    assert(state("stg") === Seq((1L, "a", 11L), (2L, "b", 21L), (3L, "c", 31L)))
    assert(spark.table("tgt_stg__graft_dml_staging")
      .as[(Long, String)].collect().toSeq === Seq((77L, "precious")))
    // no staging leftovers linger in the catalog
    assert(spark.sql("SHOW TABLES LIKE 'tgt_stg__graft_dml_staging_*'").count() === 0L)
  }

  test("non-merge SQL is untouched by the parser wrapper") {
    import spark.implicits._
    assert(spark.sql("SELECT 1 + 1 AS two").as[Int].head() === 2)
    // and graft_dot still resolves (function injection rides the same extensions)
    assert(spark.sql("SELECT graft_dot(array(1L,2L), array(3L,4L)) AS d")
      .as[Long].head() === 11L)
  }
}
