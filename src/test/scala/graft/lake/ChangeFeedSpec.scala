package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Append-only change data feed over the incremental commit log:
  * per-version inserts tagged with their commit version, O(changed
  * files) resolution, loud failure across rewrites, schema evolution
  * null-fills.
  */
class ChangeFeedSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("cdf_").toString + "/t"
    new IncrementalTable(spark, dir)
  }
  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "tag").coalesce(1)
  }

  test("changes() returns per-version inserts with commit tags") {
    val t = fresh()
    t.append(df((1L, "a"), (2L, "b"))) // v0
    t.append(df((3L, "c")))            // v1
    t.append(df((4L, "d"), (5L, "e"))) // v2

    val all = t.changes(-1L, 2L)
      .select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(all === Set((1L, "insert", 0L), (2L, "insert", 0L),
      (3L, "insert", 1L), (4L, "insert", 2L), (5L, "insert", 2L)))

    // a bounded window skips everything at or before fromV
    val tail = t.changes(0L, 2L).select("id").collect().map(_.getLong(0)).toSet
    assert(tail === Set(3L, 4L, 5L))
    // empty range on the head version
    assert(t.changes(2L, 2L).count() === 0L)
  }

  test("compaction in the range is skipped (datachange=false)") {
    val t = fresh()
    t.append(df((1L, "a")))
    t.append(df((2L, "b")))
    t.compact(targetFiles = 1) // v2 rewrites v0+v1's files, rows unchanged
    t.append(df((3L, "c")))    // v3: real data change after the rewrite
    // the feed spans the compaction without failing OR re-delivering:
    // the compacted files never appear as inserts
    val rows = t.changes(0L, 3L)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set((2L, "insert", 1L), (3L, "insert", 3L)))
    assert(t.changes(-1L, 3L).count() === 3L)
  }

  test("a CDC-less data-changing rewrite in the range fails loudly") {
    import spark.implicits._
    val t = fresh()
    t.append(df((1L, "a")))
    t.writeSnapshot(Seq((9L, "z")).toDF("id", "tag"), operation = "overwrite")
    val err = intercept[IllegalStateException](t.changes(-1L, 1L).collect())
    assert(err.getMessage.contains("without change-data files"))
    // a range that stops before the rewrite still works
    assert(t.changes(-1L, 0L).select("id").collect().map(_.getLong(0)).toSeq
      === Seq(1L))
  }

  test("schema evolution across the range null-fills older versions") {
    import spark.implicits._
    val t = fresh()
    t.append(df((1L, "a")))                                        // v0: id, tag
    t.append(Seq((2L, "b", 0.5)).toDF("id", "tag", "score").coalesce(1)) // v1: +score
    val rows = t.changes(-1L, 1L)
      .select("id", "score", "_commit_version")
      .orderBy("id").collect()
    assert(rows(0).getLong(0) === 1L && rows(0).isNullAt(1))
    assert(rows(1).getLong(0) === 2L && rows(1).getDouble(1) === 0.5)
  }
}
