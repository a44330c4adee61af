package graft.lake

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Row tracking (stable `_row_id` identity, Delta's row-tracking
  * reader+writer feature re-derived): assignment at first write,
  * backfill on enable, preservation through every rewrite path
  * (copy-on-write UPDATE/DELETE, compaction, z-order, clone, restore),
  * feature stamping, and a two-JVM allocation race.
  */
class RowTrackingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("rowtrack_").toString + "/t"
    new IncrementalTable(spark, dir)
  }

  private def rids(t: IncrementalTable): Map[Long, Long] =
    t.snapshot().select("k", "_row_id").as[(Long, Long)].collect().toMap

  test("appends allocate dense unique ids; enable on empty table") {
    val t = fresh()
    t.enableRowTracking()
    assert(t.rowTrackingEnabled)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    t.append(Seq((3L, "c")).toDF("k", "v").coalesce(1))
    val ids = rids(t)
    assert(ids.values.toSeq.sorted == Seq(1L, 2L, 3L))
    assert(t.rowIdHighWatermark === 3L)
  }

  test("enable on a populated table backfills every existing row") {
    val t = fresh()
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1))
    val v = t.enableRowTracking()
    assert(t.rowTrackingEnabled && t.operationAt(v) == "enable row tracking")
    val ids = rids(t)
    assert(ids.size === 3 && ids.values.toSeq.sorted == Seq(1L, 2L, 3L))
    // re-enable is a no-op, not a second backfill
    assert(t.enableRowTracking() === t.latestVersion.get)
    assert(rids(t) == ids)
  }

  test("ids survive update, delete, compact, z-order and restore") {
    val t = fresh()
    t.enableRowTracking()
    t.append((1L to 20L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(2))
    val before = rids(t)
    assert(before.values.toSeq.sorted == (1L to 20L).toSeq)

    t.updateWhere(col("k") % 2 === 0, Map("v" -> lit("even")))
    assert(rids(t) == before, "copy-on-write UPDATE must preserve row ids")

    val preDelete = t.latestVersion.get
    t.deleteWhere(col("k") > 18)
    assert(rids(t) == before.filter(_._1 <= 18L),
      "DELETE must not disturb surviving ids")

    t.compact(targetFiles = 2)
    assert(rids(t) == before.filter(_._1 <= 18L),
      "compaction must preserve row ids")

    t.clusterZ(targetFiles = 2, bits = 8, "k", "_row_id")
    assert(rids(t) == before.filter(_._1 <= 18L),
      "z-order must preserve row ids")

    t.restore(preDelete)
    assert(rids(t) == before, "restore must bring back the original ids")

    // new rows after all of it still get FRESH ids (watermark never
    // rewound by the restore)
    t.append(Seq((21L, "new")).toDF("k", "v").coalesce(1))
    val after = rids(t)
    assert(after(21L) > before.values.max,
      s"fresh id ${after(21L)} must exceed every pre-existing id")
  }

  test("clone carries ids and the watermark; clone inserts don't collide") {
    val t = fresh()
    t.enableRowTracking()
    t.append((1L to 5L).map(k => (k, "x")).toDF("k", "v").coalesce(1))
    val c = fresh()
    c.cloneFrom(t)
    assert(c.rowTrackingEnabled, "clone must carry the rowtracking property")
    assert(rids(c) == rids(t))
    c.append(Seq((6L, "y")).toDF("k", "v").coalesce(1))
    val ids = rids(c)
    assert(ids.values.toSeq.distinct.size === 6,
      s"clone insert re-issued an id: $ids")
  }

  test("feature stamp: the enabling version demands row-tracking") {
    val t = fresh()
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    val v0 = t.latestVersion.get
    t.enableRowTracking()
    assert(t.readerFeaturesAt(t.latestVersion.get).contains("row-tracking"))
    assert(!t.readerFeaturesAt(v0).contains("row-tracking"),
      "pre-enable versions must stay feature-free (time travel)")
  }

  test("rename/drop of _row_id are refused while tracking is on") {
    val t = fresh()
    t.enableRowTracking()
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    intercept[IllegalArgumentException](t.renameColumn("_row_id", "rid"))
    intercept[IllegalArgumentException](t.dropColumn("_row_id"))
    // and UPDATE may not SET it — a duplicated id would silently break
    // every identity-keyed consumer
    val err = intercept[IllegalArgumentException](t.updateWhere(
      org.apache.spark.sql.functions.col("k") === 1L,
      Map("_row_id" -> org.apache.spark.sql.functions.lit(1L))))
    assert(err.getMessage.contains("row ids"))
  }

  test("identity column and row tracking allocate together in one write") {
    val t = fresh()
    t.append(Seq((null.asInstanceOf[java.lang.Long], "a"))
      .toDF("id", "v").coalesce(1))
    t.setIdentity("id", start = 10L, step = 5L)
    t.enableRowTracking()
    t.append(Seq(("b"), ("c")).toDF("v").coalesce(1))
    // row "a" predates the identity declaration, so its id is NULL —
    // read through Rows, not a non-nullable tuple encoder
    val rows = t.snapshot().select("id", "v", "_row_id").collect()
      .map(r => (Option(r.getAs[java.lang.Long]("id")).map(_.longValue),
        r.getAs[String]("v"), r.getAs[Long]("_row_id")))
    assert(rows.map(_._3).distinct.length === 3, s"dup row ids: ${rows.toSeq}")
    // identity stays on its 10 + 5k grid for the allocated rows
    val allocatedIds = rows.filter(r => r._2 == "b" || r._2 == "c")
      .flatMap(_._1)
    assert(allocatedIds.length === 2 &&
      allocatedIds.forall(id => id >= 10 && (id - 10) % 5 == 0),
      s"identity off-grid: ${rows.toSeq}")
  }

  test("two JVMs race appends: every id unique, no row lost") {
    val t = fresh()
    val dir = t.path
    t.enableRowTracking()
    t.append(Seq((1, "main")).toDF("k", "writer").coalesce(1))

    val n = 6
    val jdk17AddOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = new java.io.File(new java.io.File(
      sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.lake.RowIdRaceWorker", dir, "B", n.toString)
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new java.lang.StringBuilder
    val drain = new Thread(() => {
      val src = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
      src.getLines().foreach(l => out.append(l).append('\n'))
    })
    drain.setDaemon(true)
    drain.start()
    try {
      val ready = java.nio.file.Paths.get(dir, "_worker_B_ready")
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(120)
      while (!java.nio.file.Files.exists(ready) &&
        System.nanoTime() < deadline && proc.isAlive) Thread.sleep(100)
      assert(java.nio.file.Files.exists(ready), s"worker never ready:\n$out")
      (0 until n).foreach(i =>
        t.append(Seq((100 + i, "main")).toDF("k", "writer").coalesce(1)))
      assert(proc.waitFor(180, TimeUnit.SECONDS), s"worker timed out:\n$out")
      assert(proc.exitValue() === 0, s"worker failed:\n$out")
    } finally if (proc.isAlive) proc.destroyForcibly()

    val fresh2 = new IncrementalTable(spark, dir)
    val rows = fresh2.snapshot().select("_row_id", "writer")
      .as[(Long, String)].collect().toSeq
    assert(rows.size === 2 * n + 1, s"row lost in the race:\n$out")
    assert(rows.map(_._1).distinct.size === rows.size,
      s"row id issued twice across JVMs: ${rows.sorted}\n$out")
    assert(fresh2.rowIdHighWatermark >= rows.map(_._1).max,
      "watermark fell behind the issued ids")
  }
}
