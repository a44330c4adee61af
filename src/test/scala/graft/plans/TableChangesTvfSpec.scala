package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.lake.IncrementalTable

/** `table_changes` TVF ([[TableChangesTvf]]): the SQL face of the
  * change data feed, Delta-parity inclusive version range.
  */
class TableChangesTvfSpec extends AnyFunSuite with SparkSpec {

  test("table_changes delivers the feed over an inclusive range; " +
    "path and catalog targets; refusals are loud") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tvf_").toString + "/t"
    val t = new IncrementalTable(spark, dir)
    t.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1)) // v0
    t.append(Seq((3L, 30L)).toDF("k", "v").coalesce(1))            // v1
    t.deleteWhere(col("k") === 1L)                                 // v2

    def rows(sql: String): Set[(Long, String, Long)] =
      spark.sql(sql).select("k", "_change_type", "_commit_version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // full feed from v0 (start is INCLUSIVE — Delta's contract)
    assert(rows(s"SELECT * FROM table_changes('$dir', 0)") === Set(
      (1L, "insert", 0L), (2L, "insert", 0L), (3L, "insert", 1L),
      (1L, "delete", 2L)))
    // bounded window [1, 1]
    assert(rows(s"SELECT * FROM table_changes('$dir', 1, 1)") ===
      Set((3L, "insert", 1L)))
    // composes with ordinary SQL around it
    assert(spark.sql(s"SELECT count(*) AS c FROM table_changes('$dir', 0) " +
      "WHERE _change_type = 'insert'").head.getLong(0) === 3L)

    // catalog-name target resolves through the graft catalog
    val wh = Files.createTempDirectory("tvf_cat_").toString
    spark.conf.set("spark.sql.catalog.tvfcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tvfcat.warehouse", wh)
    val ct = new IncrementalTable(spark, s"$wh/ct")
    ct.append(Seq((7L, 70L)).toDF("k", "v").coalesce(1))
    assert(rows("SELECT * FROM table_changes('tvfcat.ct', 0)") ===
      Set((7L, "insert", 0L)))

    // refusals: missing table, non-literal args, bad arity
    val e1 = intercept[Exception](
      spark.sql(s"SELECT * FROM table_changes('$dir/nope', 0)").collect())
    assert(e1.getMessage.contains("no graft table"))
    // a non-literal version arg dies in analysis (column can't resolve
    // inside a TVF argument) — loud either way
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM table_changes('$dir', k)").collect())
    assert(e2.getMessage.toLowerCase.contains("cannot be resolved") ||
      e2.getMessage.toLowerCase.contains("version"), e2.getMessage)
    val e3 = intercept[Exception](
      spark.sql(s"SELECT * FROM table_changes('$dir')").collect())
    assert(e3.getMessage.contains("2 or 3"), e3.getMessage)
  }
}
