package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** SURVEY.md §2.1 S-operators that are API surface rather than queries:
  * DDL (S5/S6), CTAS snapshots (S7), managed-table sink (S3), and
  * config-parameterized SQL (S9, the `${var}` substitution the
  * reference notebook uses at test_scd_handler.py:28-29,34-40).
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkSpec {

  test("S5/S6: CREATE TABLE with explicit types; DROP TABLE IF EXISTS") {
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    spark.sql(
      """CREATE TABLE graft_ddl_t (
        |  id INT, name STRING, reg_ts TIMESTAMP, units BIGINT
        |) USING parquet""".stripMargin)
    assert(spark.table("graft_ddl_t").schema.map(_.name) ===
      Seq("id", "name", "reg_ts", "units"))
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    assert(!spark.catalog.tableExists("graft_ddl_t"))
  }

  test("S2/S3/S7: in-memory source, saveAsTable overwrite sink, CTAS snapshot") {
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("graft_sink_t")
    // overwrite replaces, not appends (reference S3 semantics)
    Seq((3, "c")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("graft_sink_t")
    assert(spark.table("graft_sink_t").count() === 1)
    spark.sql("DROP TABLE IF EXISTS graft_snap_t")
    spark.sql("CREATE TABLE graft_snap_t AS SELECT * FROM graft_sink_t")
    assert(spark.table("graft_snap_t").collect() ===
      spark.table("graft_sink_t").collect())
    spark.sql("DROP TABLE graft_sink_t")
    spark.sql("DROP TABLE graft_snap_t")
  }

  test("S9: config-parameterized SQL via ${var} substitution") {
    spark.conf.set("spark.sql.variable.substitute", "true")
    spark.conf.set("SCD.CATALOG", "graft_cfg_t")
    import spark.implicits._
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("graft_cfg_t")
    assert(spark.sql("SELECT count(*) FROM ${SCD.CATALOG}").head().getLong(0) === 1L)
  }

  test("S1: named-table scan of a registered snapshot") {
    graft.Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .createOrReplaceTempView("nation_v")
    assert(spark.sql("select * from nation_v").count() === 25)
  }
}
