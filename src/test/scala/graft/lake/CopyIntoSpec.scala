package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** COPY INTO ([[IncrementalTable.copyInto]] + the SQL statement):
  * file-level idempotent ingestion — every source file loads exactly
  * once across re-runs, new files load incrementally, FORCE reloads,
  * and the ingested-set pointer survives unrelated commits.
  */
class CopyIntoSpec extends AnyFunSuite with SparkSpec {

  test("copyInto loads each file once; re-runs no-op; new files load; " +
    "FORCE reloads; registry survives appends and DML") {
    import spark.implicits._
    val base = Files.createTempDirectory("cpy_").toString
    val srcDir = s"$base/in"
    (0L until 20L).map(i => (i, i * 2L)).toDF("id", "v")
      .repartitionByRange(2, col("id")).write.parquet(srcDir)

    val t = new IncrementalTable(spark, s"$base/t")
    val (v1, n1) = t.copyInto(srcDir)
    assert(v1 === 0L && n1 === 2)
    assert(t.snapshot().count() === 20L)

    // idempotent: the same files never load twice, nothing commits
    val (v2, n2) = t.copyInto(srcDir)
    assert(v2 === 0L && n2 === 0)
    assert(t.snapshot().count() === 20L)

    // new files in the same dir: ONLY they load
    (20L until 25L).map(i => (i, i * 2L)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val (_, n3) = t.copyInto(srcDir)
    assert(n3 === 1)
    assert(t.snapshot().count() === 25L)

    // the registry pointer carries across unrelated commits
    t.append(Seq((100L, 0L)).toDF("id", "v").coalesce(1))
    t.deleteWhere(col("id") === 3L)
    assert(t.copyInto(srcDir)._2 === 0)
    assert(t.snapshot().count() === 25L) // 25 + 1 - 1

    // FORCE reloads everything (deliberate duplication)
    val (_, n4) = t.copyInto(srcDir, force = true)
    assert(n4 === 3)
    assert(t.snapshot().count() === 50L)
  }

  test("SQL: COPY INTO with FILEFORMAT and FORCE; non-parquet refused") {
    import spark.implicits._
    val base = Files.createTempDirectory("cpy_sql_").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.parquet(s"$base/in")
    val out = spark.sql(
      s"COPY INTO '$base/t' FROM '$base/in' FILEFORMAT = PARQUET").collect()
    assert(out.head.getLong(0) === 0L && out.head.getInt(1) === 1)
    assert(spark.sql(
      s"COPY INTO '$base/t' FROM '$base/in'").collect().head.getInt(1) === 0)
    assert(spark.sql(
      s"COPY INTO '$base/t' FROM '$base/in' FORCE").collect()
      .head.getInt(1) === 1)
    val t = new IncrementalTable(spark, s"$base/t")
    assert(t.snapshot().count() === 4L)

    val e = intercept[Exception](spark.sql(
      s"COPY INTO '$base/t' FROM '$base/in' FILEFORMAT = CSV").collect())
    assert(e.getMessage.contains("parquet only"), e.getMessage)
  }
}
