package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CONVERT TO GRAFT ([[IncrementalTable.convertInPlace]] + the SQL
  * statement): plain parquet directories become first-class graft
  * tables by O(#files) renames — no data copied — with footer stats,
  * DML and vacuum all working post-convert.
  */
class ConvertSpec extends AnyFunSuite with SparkSpec {

  private def plainDir(nFiles: Int): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("cvt_").toString + "/t"
    (0L until 40L).map(i => (i, i % 4, s"r$i")).toDF("id", "g", "s")
      .repartitionByRange(nFiles, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("convert adopts the files by rename — same basenames, no copy; " +
    "scans, stats pruning and DML work post-convert") {
    val dir = plainDir(4)
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(before.size === 4)

    val t = new IncrementalTable(spark, dir)
    assert(t.convertInPlace() === 0L)
    // the SAME files, moved under data/ — nothing rewritten
    val after = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(after === before)
    assert(!new java.io.File(dir).listFiles().exists(f =>
      f.isFile && f.getName.endsWith(".parquet")), "originals must move")
    assert(t.files(0L).toSet === before)

    // reads through the connector
    val df = spark.read.format("graft").load(dir)
    assert(df.count() === 40L)
    // footer stats harvested at convert: a range predicate prunes files
    val pruned = t.prunedFilesAt(0L, t.files(0L), Seq(col("id") < 5L))
    assert(pruned.size < 4, s"stats did not prune: $pruned")

    // post-convert DML: copy-on-write delete...
    t.deleteWhere(col("id") === 7L)
    assert(spark.read.format("graft").load(dir).count() === 39L)
    // ...and deletion vectors (merge-on-read) key correctly on
    // converted files (snapshot() applies them; path-level connector
    // reads refuse DV tables by contract, unchanged here)
    t.deleteVector(col("id") === 8L)
    assert(t.snapshot().count() === 38L)
    assert(t.snapshot().agg(sum("id")).head.getLong(0) ===
      (0L until 40L).sum - 7L - 8L)
  }

  test("SQL: CONVERT TO GRAFT with quoted, backtick and parquet. forms; " +
    "refusals are loud") {
    val dir = plainDir(2)
    val out = spark.sql(s"CONVERT TO GRAFT '$dir'").collect()
    assert(out.head.getString(0) === dir)
    assert(out.head.getInt(1) === 2)
    assert(spark.read.format("graft").load(dir).count() === 40L)

    // already a graft table: refuse
    val e1 = intercept[Exception](spark.sql(s"CONVERT TO GRAFT '$dir'").collect())
    assert(e1.getMessage.contains("already holds a graft table"))

    // Delta-style parquet.`path` form
    val dir2 = plainDir(2)
    assert(spark.sql(s"CONVERT TO GRAFT parquet.`$dir2`").collect()
      .head.getString(0) === dir2)

    // partitioned layout: refuse with the rewrite remediation
    import spark.implicits._
    val pdir = Files.createTempDirectory("cvt_p_").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "p")
      .write.partitionBy("p").parquet(pdir)
    val e2 = intercept[Exception](spark.sql(s"CONVERT TO GRAFT '$pdir'").collect())
    assert(e2.getMessage.contains("hive-partitioned"), e2.getMessage)

    // empty dir: refuse
    val edir = Files.createTempDirectory("cvt_e_").toString
    val e3 = intercept[Exception](spark.sql(s"CONVERT TO GRAFT '$edir'").collect())
    assert(e3.getMessage.contains("no *.parquet"), e3.getMessage)
  }
}
