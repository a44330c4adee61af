package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Row-level DML on the incremental format: copy-on-write DELETE /
  * UPDATE (touched-files-only rewrite + atomic CDC sidecar), merge-on-
  * read DELETE via deletion vectors (no data file rewritten), RESTORE,
  * and the change feed replaying all of it.
  */
class DmlSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("dml_").toString + "/t"
    new IncrementalTable(spark, dir)
  }
  private def df(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "tag", "score").coalesce(1)
  }
  private def ids(t: IncrementalTable): Set[Long] =
    t.snapshot().select("id").collect().map(_.getLong(0)).toSet

  test("deleteWhere rewrites only files containing matches, feeds CDC") {
    val t = fresh()
    t.append(df((1L, "a", 1.0), (2L, "b", 2.0))) // v0: file A
    t.append(df((3L, "c", 3.0), (4L, "d", 4.0))) // v1: file B
    val before = t.files(1L).toSet

    val v = t.deleteWhere(col("id") === 2L) // only file A holds a match
    assert(v === 2L)
    assert(ids(t) === Set(1L, 3L, 4L))
    // file B carried forward untouched; file A swapped for its survivors
    val after = t.files(v).toSet
    assert(before.intersect(after).size === 1)
    assert((before -- after).size === 1)

    // the change feed replays the delete row-by-row
    val cdc = t.changes(1L, v)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(cdc === Set((2L, "delete", 2L)))
    // and a full-history feed unions inserts with the delete
    assert(t.changes(-1L, v).count() === 5L)
  }

  test("deleteWhere with no matches is a no-op commit-wise") {
    val t = fresh()
    t.append(df((1L, "a", 1.0)))
    assert(t.deleteWhere(col("id") === 99L) === 0L)
    assert(t.latestVersion === Some(0L))
  }

  test("NULL predicate keeps the row (SQL DELETE truth semantics)") {
    import spark.implicits._
    val t = fresh()
    t.append(Seq((1L, Some(1.0)), (2L, None), (3L, Some(9.0)))
      .toDF("id", "maybe").coalesce(1))
    t.deleteWhere(col("maybe") > 5.0) // NULL > 5.0 is NULL, not TRUE
    assert(ids(t) === Set(1L, 2L))
  }

  test("updateWhere applies simultaneous assignments and feeds pre/post images") {
    val t = fresh()
    t.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    t.append(df((3L, "c", 3.0)))
    val v = t.updateWhere(col("score") >= 2.0,
      Map("score" -> (col("score") * 10), "tag" -> concat(col("tag"), lit("!"))))
    val rows = t.snapshot().orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, "a", 1.0), (2L, "b!", 20.0), (3L, "c!", 30.0)))

    val cdc = t.changes(1L, v)
      .select("id", "tag", "score", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(cdc === Set(
      (2L, "b", 2.0, "update_preimage"), (2L, "b!", 20.0, "update_postimage"),
      (3L, "c", 3.0, "update_preimage"), (3L, "c!", 30.0, "update_postimage")))
  }

  test("deleteVector deletes without rewriting any data file") {
    val t = fresh()
    t.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    t.append(df((3L, "c", 3.0)))
    val filesBefore = t.files(1L).toSet

    val v = t.deleteVector(col("id") === 2L)
    assert(t.files(v).toSet === filesBefore) // zero files touched
    assert(ids(t) === Set(1L, 3L))
    // time travel still sees the pre-delete state
    assert(t.snapshotAt(1L).count() === 3L)
    // scans and filtered scans agree
    assert(t.scan(col("score") <= 2.5).select("id")
      .collect().map(_.getLong(0)).toSet === Set(1L))
    // CDC parity with copy-on-write delete
    val cdc = t.changes(1L, v).select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cdc === Set((2L, "delete")))
  }

  test("deletion vectors stack, survive appends, and compact materializes them") {
    val t = fresh()
    t.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    t.deleteVector(col("id") === 1L)
    t.deleteVector(col("id") === 2L) // second vector supersedes (union)
    assert(ids(t) === Set(3L))
    t.append(df((4L, "d", 4.0))) // append carries the dv pointer forward
    assert(ids(t) === Set(3L, 4L))
    // already-dead rows can't re-match a second delete of the same key
    val head = t.latestVersion.get
    assert(t.deleteVector(col("id") === 1L) === head) // no-op: no new commit
    // compact rewrites live rows only and drops the pointer
    val cv = t.compact(1)
    assert(ids(t) === Set(3L, 4L))
    assert(t.snapshotAt(cv).count() === 2L)
  }

  test("restore rewinds state as a new commit, undoably") {
    val t = fresh()
    t.append(df((1L, "a", 1.0)))             // v0
    t.append(df((2L, "b", 2.0)))             // v1
    t.deleteWhere(col("id") === 1L)          // v2
    val rv = t.restore(1L)                   // v3 = v1's state
    assert(rv === 3L)
    assert(ids(t) === Set(1L, 2L))
    assert(t.operationAt(rv).startsWith("restore"))
    // the bad version is still time-travelable, and the restore undoable
    assert(t.snapshotAt(2L).select("id").collect().map(_.getLong(0)).toSet === Set(2L))
    val back = t.restore(2L)
    assert(ids(t) === Set(2L) && back === 4L)
    // restoring to the current head is a no-op
    assert(t.restore(4L) === 4L)
  }

  test("restore reinstates the restored version's deletion vectors") {
    val t = fresh()
    t.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    val dv = t.deleteVector(col("id") === 1L) // v1: dv pointer
    t.compact(1)                              // v2: materialized, pointer gone
    t.restore(dv)
    assert(ids(t) === Set(2L))
  }

  test("vacuum collects unreferenced CDC sidecars and vector sets") {
    val t = fresh()
    t.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    t.deleteVector(col("id") === 1L)  // writes _dv + _change_data
    t.deleteWhere(col("id") === 2L)   // writes _change_data
    t.compact(1)                      // current version references neither
    t.vacuum(keepLast = 1)
    val root = new java.io.File(t.path)
    def entries(d: String) = Option(new java.io.File(root, d).listFiles())
      .map(_.length).getOrElse(0)
    assert(entries("_change_data") === 0)
    assert(entries("_dv") === 0)
    assert(ids(t) === Set.empty)
  }
}
