package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The delta-encoded commit log: appends write O(batch) manifest bytes
  * (add/remove actions), snapshot commits stay full lists, checkpoint
  * sidecars bound the reconstruction walk, vacuum keeps the oldest
  * retained version reconstructible, and pre-delta-log tables (every
  * manifest a full list) read unchanged.
  */
class DeltaLogSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("deltalog_").toString + "/t"
    new IncrementalTable(spark, dir)
  }
  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "tag").coalesce(1)
  }
  private def manifestText(t: IncrementalTable, v: Long): String =
    new String(Files.readAllBytes(
      java.nio.file.Paths.get(t.path, "_log", f"$v%020d.json")), "UTF-8")

  test("appends are delta commits; reconstruction equals the running union") {
    val t = fresh()
    for (i <- 0 until 7) t.append(df((i.toLong, s"r$i")))
    // files() is the API under test, so pin the format structurally:
    // v0 carries a full list, later appends carry add/remove actions
    // and never the O(table) list
    assert(manifestText(t, 0L).contains("\"files\":["))
    for (v <- 1L until 7L) {
      val txt = manifestText(t, v)
      assert(txt.contains("\"add\":["), s"v$v should be a delta commit")
      assert(!txt.contains("\"files\":["), s"v$v should not carry a full list")
    }
    // each version's reconstructed list is exactly v+1 one-file appends
    for (v <- 0L until 7L) assert(t.files(v).size === v + 1)
    assert(t.snapshot().count() === 7L)
    // manifest bytes for an append must not grow with table size
    val sizes = (1L until 7L).map(v => manifestText(t, v).length)
    assert(sizes.max - sizes.min <= 8, s"append manifests should be O(batch): $sizes")
  }

  test("snapshot rewrite is a full-list commit and resets the walk") {
    val t = fresh()
    (0 until 5).foreach(i => t.append(df((i.toLong, "x"))))
    val v = t.compact(targetFiles = 1)
    assert(manifestText(t, v).contains("\"files\":["))
    assert(t.files(v).size === 1)
    t.append(df((99L, "y")))
    assert(t.files(v + 1).size === 2)
    assert(t.snapshot().count() === 6L)
  }

  test("checkpoint sidecar lands every 10th delta commit and is trusted") {
    val t = fresh()
    (0 until 12).foreach(i => t.append(df((i.toLong, "x"))))
    val ckpt = java.nio.file.Paths.get(
      t.path, "_log", f"${10L}%020d.checkpoint.parquet")
    assert(Files.exists(ckpt), "v10 should have a checkpoint sidecar")
    // reconstruction of v11+ must work even if every manifest below the
    // checkpoint disappears (the walk stops at the sidecar)
    for (v <- 0L until 10L)
      Files.delete(java.nio.file.Paths.get(t.path, "_log", f"$v%020d.json"))
    val t2 = new IncrementalTable(spark, t.path) // fresh cache
    assert(t2.files(11L).size === 12)
    assert(t2.snapshot().count() === 12L)
  }

  test("legacy JSON checkpoint sidecars keep reading (pre-parquet tables)") {
    val t = fresh()
    (0 until 3).foreach(i => t.append(df((i.toLong, "x"))))
    val all = t.files(2L)
    // hand-write the OLD sidecar format at v2, then delete the
    // manifests below it: reconstruction must stop at the JSON sidecar
    val json = s"""{"version":2,"files":[${all.sorted.map("\"" + _ + "\"").mkString(",")}]}"""
    Files.write(java.nio.file.Paths.get(
      t.path, "_log", f"${2L}%020d.checkpoint.json"), json.getBytes("UTF-8"))
    for (v <- 0L until 2L)
      Files.delete(java.nio.file.Paths.get(t.path, "_log", f"$v%020d.json"))
    val t2 = new IncrementalTable(spark, t.path)
    assert(t2.files(2L).toSet === all.toSet)
    assert(t2.snapshot().count() === 3L)
  }

  test("vacuum pins the cutoff version with a checkpoint before dropping") {
    val t = fresh()
    (0 until 6).foreach(i => t.append(df((i.toLong, "x"))))
    t.vacuum(keepLast = 3) // keeps v3..v5, all delta commits
    val t2 = new IncrementalTable(spark, t.path)
    assert(t2.files(3L).size === 4)
    assert(t2.files(5L).size === 6)
    assert(t2.snapshot().count() === 6L)
    assertThrows[Exception](t2.files(2L)) // vacuumed versions fail loudly
    // history's forward fold must seed from the pinned checkpoint, not
    // an empty set — numFiles would otherwise report per-version adds
    val h = t2.history().orderBy("version").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toSeq
    assert(h === Seq(3L -> 4, 4L -> 5, 5L -> 6),
      s"history numFiles wrong after vacuum: $h")
  }

  test("vacuum evicts dropped versions from the read caches of its own instance") {
    val t = fresh()
    (0 until 6).foreach(i => t.append(df((i.toLong, "x"))))
    // warm both caches on the SAME instance that will vacuum — a fresh
    // instance would re-check the filesystem anyway
    assert(t.files(1L).size === 2)
    assert(t.metaAt(1L) != null)
    t.vacuum(keepLast = 2) // drops v0..v3
    // the documented VACUUM contract: reads of dropped versions fail
    // loudly; a warm cache must not silently serve them
    assertThrows[Exception](t.files(1L))
    assertThrows[Exception](t.metaAt(1L))
    assert(t.files(5L).size === 6)
  }

  test("pre-delta-log tables (full-list manifests) read unchanged") {
    val t = fresh()
    t.append(df((1L, "a")))
    val staged = t.stage(df((2L, "b")))
    // hand-write a legacy-format manifest: full list, no actions
    val all = (t.files(0L) ++ staged).sorted
    val json = s"""{"version":1,"operation":"legacy","committedAt":${System.currentTimeMillis()},""" +
      s""""files":[${all.map("\"" + _ + "\"").mkString(",")}]}"""
    Files.write(java.nio.file.Paths.get(t.path, "_log", f"${1L}%020d.json"),
      json.getBytes("UTF-8"))
    val t2 = new IncrementalTable(spark, t.path)
    assert(t2.files(1L).toSet === all.toSet)
    assert(t2.snapshot().count() === 2L)
    // and new commits on top of a legacy log delta-encode fine
    t2.append(df((3L, "c")))
    assert(t2.files(2L).size === 3)
  }

  test("time travel and change feed span delta and full-list commits") {
    val t = fresh()
    (0 until 4).foreach(i => t.append(df((i.toLong, "x"))))
    t.compact(targetFiles = 1) // v4 full list
    t.append(df((9L, "y"))) // v5 delta
    assert(t.snapshotAt(2L).count() === 3L)
    assert(t.snapshotAt(5L).count() === 5L)
    val ch = t.changes(4L, 5L)
    assert(ch.count() === 1L)
  }
}
