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

  test("RESTORE rewinds the COPY INTO registry with the data: " +
    "rolled-back files re-load, surviving files still no-op") {
    import spark.implicits._
    val base = Files.createTempDirectory("cpy_rst_").toString
    Seq((1L, 10L)).toDF("id", "v").coalesce(1).write.parquet(s"$base/in1")
    Seq((2L, 20L)).toDF("id", "v").coalesce(1).write.parquet(s"$base/in2")
    val t = new IncrementalTable(spark, s"$base/t")
    t.append(Seq((0L, 0L)).toDF("id", "v").coalesce(1)) // v0: pre-copy
    val (vPost1, _) = t.copyInto(s"$base/in1")
    t.copyInto(s"$base/in2")
    assert(t.snapshot().count() === 3L)

    // rewind to the post-in1 state: in2's rows are gone, so its file
    // must leave the registry — a re-run re-loads it, not skips it
    t.restore(vPost1)
    assert(t.snapshot().count() === 2L)
    assert(t.copiedFiles().nonEmpty && t.copiedFiles().forall(_.contains("in1")))
    assert(t.copyInto(s"$base/in2")._2 === 1,
      "registry must rewind with the data — exactly-once means the " +
        "rolled-back file's rows come back on re-run")
    assert(t.snapshot().count() === 3L)
    // in1 survived the restore: its rows are present, re-run no-ops
    assert(t.copyInto(s"$base/in1")._2 === 0)

    // restore to the PRE-copy version: the registry vanishes entirely
    t.restore(0L)
    assert(t.copiedFiles().isEmpty)
    assert(t.copyInto(s"$base/in1")._2 === 1)
    assert(t.snapshot().count() === 2L)
  }

  test("vacuum reaps superseded _copylog blobs and aged _stage orphans; " +
    "the live registry and recent stages survive") {
    import spark.implicits._
    val base = Files.createTempDirectory("cpy_vac_").toString
    Seq((1L, 10L)).toDF("id", "v").coalesce(1).write.parquet(s"$base/in1")
    Seq((2L, 20L)).toDF("id", "v").coalesce(1).write.parquet(s"$base/in2")
    val t = new IncrementalTable(spark, s"$base/t")
    t.copyInto(s"$base/in1") // blob A (superseded by the next copy)
    t.copyInto(s"$base/in2") // blob B (live)
    def blobs() = Option(new java.io.File(s"$base/t/_copylog").listFiles())
      .map(_.count(!_.getName.startsWith("."))).getOrElse(0) // skip .crc
    assert(blobs() === 2)

    // a crashed writer's orphan stage dir + a "live" (recent) one
    val orphan = new java.io.File(s"$base/t/_stage/deadbeef")
    orphan.mkdirs()
    new java.io.FileOutputStream(
      new java.io.File(orphan, "part-0.parquet")).close()

    // default retention (24h): the orphan is too recent to reap
    t.vacuum(keepLast = 1)
    assert(orphan.exists)
    assert(blobs() === 1, "only the pointed-at copylog blob survives")

    // zero retention: reaped
    spark.conf.set("graft.vacuum.stageRetentionMs", "0")
    try t.vacuum(keepLast = 1)
    finally spark.conf.unset("graft.vacuum.stageRetentionMs")
    assert(!orphan.exists)

    // the surviving blob is CUMULATIVE (already ∪ fresh at each copy),
    // so idempotency covers BOTH earlier loads through the one pointer
    assert(t.copyInto(s"$base/in1")._2 === 0)
    assert(t.copyInto(s"$base/in2")._2 === 0)
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

    // CSV lands under the TABLE's schema (typed, no inference) and is
    // idempotent per file like parquet
    val csv = new java.io.File(s"$base/csv_in"); csv.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(csv, "batch1.csv"))
    w.println("id,s"); w.println("10,x"); w.println("11,y"); w.close()
    assert(spark.sql(
      s"COPY INTO '$base/t' FROM '$base/csv_in' FILEFORMAT = CSV").collect()
      .head.getInt(1) === 1)
    assert(spark.sql(
      s"COPY INTO '$base/t' FROM '$base/csv_in' FILEFORMAT = CSV").collect()
      .head.getInt(1) === 0)
    assert(t.snapshot().count() === 6L)
    assert(t.snapshot().filter(col("id") === 10L).head.getString(1) === "x")

    // JSON-lines: same typed-read contract, .jsonl extension accepted
    val jd = new java.io.File(s"$base/json_in"); jd.mkdirs()
    val jw = new java.io.PrintWriter(new java.io.File(jd, "b.jsonl"))
    jw.println("""{"id": 20, "s": "z"}"""); jw.close()
    assert(spark.sql(
      s"COPY INTO '$base/t' FROM '$base/json_in' FILEFORMAT = JSON").collect()
      .head.getInt(1) === 1)
    assert(t.snapshot().count() === 7L)
    assert(t.snapshot().filter(col("id") === 20L).head.getString(1) === "z")

    // a text format into a schema-less table refuses with remediation
    val e1 = intercept[Exception] {
      val empty = new IncrementalTable(spark, s"$base/empty")
      empty.copyInto(s"$base/csv_in", format = "csv")
    }
    assert(e1.getMessage.contains("schema"), e1.getMessage)
    // unknown formats still refuse up front
    val e2 = intercept[Exception](spark.sql(
      s"COPY INTO '$base/t' FROM '$base/in' FILEFORMAT = AVRO").collect())
    assert(e2.getMessage.contains("not supported"), e2.getMessage)
  }
}
