package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Column mapping: RENAME/DROP COLUMN as metadata-only commits — no
  * data file is rewritten, old versions keep their era's names, writes
  * reverse-map, and retired names cannot resurrect ghost data.
  */
class ColumnMappingSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("colmap_").toString + "/t"
    new IncrementalTable(spark, dir)
  }
  private def df(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "name", "score").coalesce(1)
  }

  test("rename is metadata-only: same files, new name, old versions keep the old name") {
    val t = fresh()
    t.append(df((1L, "a", 1.5), (2L, "b", 2.5)))
    val filesBefore = t.files(t.latestVersion.get)
    val v = t.renameColumn("name", "label")
    assert(t.files(v) === filesBefore, "rename must not touch data files")
    assert(t.snapshot().columns.toSeq === Seq("id", "label", "score"))
    assert(t.snapshot().filter(col("label") === "a").count() === 1)
    // time travel shows the pre-rename name
    assert(t.snapshotAt(v - 1).columns.contains("name"))
    // writes speak the NEW logical name; files keep the physical one
    t.append(spark.range(1).select(lit(3L).as("id"), lit("c").as("label"),
      lit(3.5).as("score")))
    assert(t.snapshot().count() === 3)
    assert(t.snapshot().filter(col("label") === "c").count() === 1)
    // and the whole chain survives a second rename
    t.renameColumn("label", "title")
    assert(t.snapshot().columns.toSeq === Seq("id", "title", "score"))
    assert(t.snapshot().filter(col("title") === "c").count() === 1)
  }

  test("drop hides the column without rewriting; the name is retired") {
    val t = fresh()
    t.append(df((1L, "a", 1.5)))
    val filesBefore = t.files(t.latestVersion.get)
    val v = t.dropColumn("score")
    assert(t.files(v) === filesBefore)
    assert(t.snapshot().columns.toSeq === Seq("id", "name"))
    assert(t.snapshotAt(v - 1).columns.contains("score"), "time travel resurrects")
    // re-adding the retired name must fail loudly — old files still
    // hold ghost data under it
    val bad = spark.range(1).select(lit(9L).as("id"), lit("x").as("name"),
      lit(9.9).as("score"))
    assertThrows[IllegalArgumentException](t.append(bad))
    // rewrites physically purge the ghost column
    t.compact(targetFiles = 1)
    assert(t.snapshot().columns.toSeq === Seq("id", "name"))
  }

  test("DML and stats pruning speak the logical name after a rename") {
    val t = fresh()
    import spark.implicits._
    (0 until 4).foreach { i =>
      t.append(Seq((i.toLong * 10, s"n$i", i * 1.0)).toDF("id", "name", "score")
        .coalesce(1))
    }
    t.renameColumn("id", "key")
    // stats pruning: the rename must not defeat min/max skipping
    val all = t.files(t.latestVersion.get)
    val kept = t.prunedFiles(all, Seq(col("key") === 20L))
    assert(kept.size === 1, s"rename broke stats pruning: kept $kept")
    assert(t.scan(col("key") === 20L).count() === 1)
    // copy-on-write DELETE under the logical name
    t.deleteWhere(col("key") === 30L)
    assert(t.snapshot().count() === 3)
    assert(t.snapshot().filter(col("key") === 30L).count() === 0)
    // UPDATE under the logical name
    t.updateWhere(col("key") === 20L, Map("name" -> lit("renamed")))
    assert(t.snapshot().filter(col("name") === "renamed").count() === 1)
  }

  test("rename collisions, constraint references, and connector reads refuse loudly") {
    val t = fresh()
    t.append(df((1L, "a", 1.5)))
    assertThrows[IllegalArgumentException](t.renameColumn("name", "score"))
    assertThrows[IllegalArgumentException](t.renameColumn("nope", "x"))
    t.addConstraint("pos_score", "score >= 0")
    assertThrows[IllegalArgumentException](t.renameColumn("score", "pts"))
    assertThrows[IllegalArgumentException](t.dropColumn("score"))
    t.dropConstraint("pos_score")
    t.renameColumn("score", "pts")
    // a protocol-less reader must refuse, not show stale names
    val e = intercept[Exception](
      spark.read.format("graft").load(t.path).collect())
    assert(e.getMessage.contains("column mapping"), e.getMessage)
  }

  test("bloom index follows the physical column across a rename") {
    val t = fresh()
    import spark.implicits._
    t.setBloomColumns("name")
    (0 until 4).foreach { i =>
      // interleaved so min/max can't separate the files
      t.append(Seq((i.toLong, s"zz${i}a", 0.0), (i.toLong, s"aa${i}z", 0.0))
        .toDF("id", "name", "score").coalesce(1))
    }
    t.renameColumn("name", "handle")
    val all = t.files(t.latestVersion.get)
    val kept = t.prunedFiles(all, Seq(col("handle") === "zz2a"))
    assert(kept.size <= 2, s"bloom probe should survive the rename: kept $kept")
    assert(t.scan(col("handle") === "zz2a").count() === 1)
  }

  test("compact materializes the mapping: logical names on disk, connector reads recover") {
    val t = fresh()
    t.append(df((1L, "a", 1.5), (2L, "b", 2.5)))
    t.renameColumn("name", "label")
    t.dropColumn("score")
    t.compact(targetFiles = 1)
    assert(t.colMap.isEmpty && t.droppedCols.isEmpty,
      "compact must clear the mapping after realigning the files")
    assert(t.snapshot().columns.toSeq === Seq("id", "label"))
    // the connector refusal lifts — files now carry logical names
    val rows = spark.read.format("graft").load(t.path)
    assert(rows.columns.toSeq === Seq("id", "label") && rows.count() === 2)
    // the retired name is usable again: its ghost bytes were purged
    import spark.implicits._
    t.append(Seq((3L, "c", 9.0)).toDF("id", "label", "score"))
    assert(t.snapshot().columns.toSeq === Seq("id", "label", "score"))
  }

  test("standard SQL ALTER TABLE RENAME/DROP COLUMN routes through the catalog") {
    val wh = Files.createTempDirectory("colmap_wh_").toString
    spark.conf.set("spark.sql.catalog.cmlake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cmlake.warehouse", wh)
    val t = new IncrementalTable(spark, s"$wh/people")
    t.append(df((1L, "ann", 4.0)))
    spark.sql("ALTER TABLE cmlake.people RENAME COLUMN name TO handle")
    assert(t.snapshot().columns.toSeq === Seq("id", "handle", "score"))
    spark.sql("ALTER TABLE cmlake.people DROP COLUMN score")
    assert(t.snapshot().columns.toSeq === Seq("id", "handle"))
    assert(t.files(t.latestVersion.get).size === 1, "DDL must not rewrite data")
  }

  test("streaming reads refuse a mapped table until materialized") {
    val t = fresh()
    t.append(df((1L, "a", 1.5)))
    t.renameColumn("name", "label")
    // the gate fires at stream SETUP (table resolution), before any
    // batch is planned — a second gate inside planInputPartitions
    // covers renames landing under an already-running stream
    val failed = intercept[Exception] {
      val q = spark.readStream.format("graft").load(t.path)
        .writeStream.format("memory").queryName("colmap_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination(60000) finally q.stop()
    }
    assert(failed.getMessage.contains("column mapping") ||
      Option(failed.getCause).exists(_.getMessage.contains("column mapping")),
      s"expected the mapping gate, got: ${failed.getMessage}")
    // materialize → the stream works from a fresh checkpoint
    t.compact(targetFiles = 1)
    val q2 = spark.readStream.format("graft").load(t.path)
      .writeStream.format("memory").queryName("colmap_stream2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(60000); q2.stop()
    assert(spark.table("colmap_stream2").columns.toSeq === Seq("id", "label", "score"))
  }

  test("restore rewinds the mapping with the data; table properties follow the head") {
    val t = fresh()
    t.append(df((1L, "a", 1.5)))
    val before = t.latestVersion.get
    t.renameColumn("name", "label")
    t.setWriteOrder("id")
    t.setBloomColumns("id")
    t.restore(before)
    assert(t.snapshot().columns.toSeq === Seq("id", "name", "score"))
    // properties (write order, bloom config) are TABLE properties, not
    // data state — they survive the rewind (Delta's RESTORE split)
    assert(t.writeOrder === Seq("id") && t.bloomColumns === Seq("id"))
  }

  test("materializing the mapping rebuilds blooms under the new name") {
    val t = fresh()
    import spark.implicits._
    t.setBloomColumns("name")
    (0 until 4).foreach(i =>
      t.append(Seq((i.toLong, s"zz${i}a", 0.0), (i.toLong, s"aa${i}z", 0.0))
        .toDF("id", "name", "score").coalesce(1)))
    t.renameColumn("name", "handle")
    t.compact(targetFiles = 4) // materializes the mapping
    assert(t.bloomColumns === Seq("handle"))
    val all = t.files(t.latestVersion.get)
    // the restaged files must carry fresh blooms for the renamed column
    val gone = t.prunedFiles(all, Seq(col("handle") === "no-such-key"))
    assert(gone.isEmpty,
      s"materialize must rebuild blooms under the logical name: kept $gone")
    assert(t.scan(col("handle") === "zz2a").count() === 1)
  }
}
