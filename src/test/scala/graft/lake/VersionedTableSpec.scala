package graft.lake

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.scd.ScdConfig

class VersionedTableSpec extends AnyFunSuite with SparkSpec {

  test("write / time-travel / history / compact / vacuum round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vt").toString
    val t = new VersionedTable(spark, s"$dir/t")
    assert(!t.exists && t.latestVersion.isEmpty)

    val v0 = t.write(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val v1 = t.write(Seq((1, "a"), (2, "b2"), (3, "c")).toDF("id", "v"))
    assert((v0, v1) === (0L, 1L))
    assert(t.snapshot().count() === 3)
    // time travel reads the untouched old version
    assert(t.snapshotAt(0).orderBy("id").collect().map(_.getString(1)).toSeq ===
      Seq("a", "b"))

    val v2 = t.compact(targetFiles = 1)
    assert(t.snapshotAt(v2).orderBy("id").collect() ===
      t.snapshotAt(v1).orderBy("id").collect())
    val h = t.history().collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(2L, 1L, 0L)) // newest first
    assert(h.head.getString(1) === "compact")

    t.vacuum(keepLast = 2) // drops v0's data + manifest
    assert(intercept[IllegalArgumentException](t.snapshotAt(0)).getMessage
      .contains("version 0 does not exist"))
    assert(t.snapshot().count() === 3) // latest unaffected
  }

  test("a version directory without a manifest is invisible to readers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vt2").toString
    val t = new VersionedTable(spark, s"$dir/t")
    t.write(Seq((1, "a")).toDF("id", "v"))
    // simulate a crashed writer: data dir for v=1 exists, no manifest
    Seq((9, "zz")).toDF("id", "v").write.parquet(s"$dir/t/v=1")
    assert(t.latestVersion.contains(0L))
    assert(t.snapshot().collect().map(_.getInt(0)).toSeq === Seq(1))
    // and a leftover _tmp_ manifest from a crash mid-commit is equally
    // invisible (it must not crash version resolution either)
    Files.writeString(java.nio.file.Paths.get(
      s"$dir/t/_log/_tmp_00000000000000000001.json"), "{\"version\":1}")
    assert(t.latestVersion.contains(0L))
    assert(t.history().count() === 1)
  }

  test("VersionedScdTable: SCD applies commit versions; time travel = day snapshots") {
    val dir = Files.createTempDirectory("vscd").toString
    val table = new VersionedScdTable(spark, s"$dir/dim")
    table.create(StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)) ++
      ScdConfig.SystemCols.map(c => StructField(c,
        if (c == "record_status" || c.endsWith("_key")) StringType else TimestampType))))
    val cfg = ScdConfig(pkCols = Seq("k"), scdKeyCols = Seq("v"),
      selectCols = Some(Seq("k", "v")))
    def batch(rows: (Long, String)*) = {
      import spark.implicits._
      rows.toDF("k", "v")
    }
    table.applyScd(batch((1L, "a"), (2L, "b")),
      cfg.copy(clock = () => Instant.parse("2025-07-01T00:00:00Z")))
    table.applyScd(batch((1L, "a2")),
      cfg.copy(clock = () => Instant.parse("2025-07-02T00:00:00Z")))
    // v0 = create, v1 = day1 merge, v2 = day2 merge
    assert(table.versions.latestVersion.contains(2L))
    assert(table.snapshotAt(1).count() === 2) // day-1 state preserved
    assert(table.snapshot().count() === 3)    // day-2: k=1 versioned
    assert(table.history().collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "merge"), (1L, "merge"), (0L, "create")))
    // the reference's day-snapshot assertions, via time travel instead of CTAS
    val day1Eth = table.snapshotAt(1).filter("k = 1").head()
    assert(day1Eth.getAs[String]("v") === "a")
  }

  test("changes: insert/delete/update pairs between versions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vt_cdf").toString
    val t = new VersionedTable(spark, s"$dir/t")
    t.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    t.write(Seq((1, "a"), (2, "B"), (4, "d")).toDF("id", "v"))
    val ch = t.changes(0L, 1L)
      .as[(Int, String, String)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(ch === Seq(
      (2, "b", "delete"), (2, "B", "insert"),   // update = delete + insert
      (3, "c", "delete"), (4, "d", "insert")))
    assert(t.changes(1L, 1L).isEmpty)
  }

  test("writeMergeSchema widens to the union schema with NULL fill") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vt_evolve").toString
    val t = new VersionedTable(spark, s"$dir/t")
    t.write(Seq((1, "a")).toDF("id", "v"))
    t.writeMergeSchema(Seq((2, 9L)).toDF("id", "score"))
    val snap = t.snapshot()
    assert(snap.columns.toSeq === Seq("id", "score", "v"))
    val row = snap.as[(Int, Option[Long], Option[String])].collect().toSeq
    assert(row === Seq((2, Some(9L), None)))
  }
}
