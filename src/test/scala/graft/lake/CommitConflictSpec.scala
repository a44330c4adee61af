package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Optimistic multi-writer arbitration on the incremental table: the
  * manifest rename is the atomic commit point, append losers rebase
  * and retry, logically-conflicting rewrites fail loudly.
  */
class CommitConflictSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("conflict_").toString + "/t"
    new IncrementalTable(spark, dir)
  }
  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "tag").coalesce(1)
  }

  test("publishing the same version twice raises CommitConflictException") {
    val t = fresh()
    t.append(df((1L, "a")))
    val orphan = t.stage(df((2L, "b")))
    t.writeManifest(1L, "append", orphan)
    assertThrows[CommitConflictException](
      t.writeManifest(1L, "append", orphan))
    // the loser's tmp file must not linger as garbage in _log
    val leftovers = new java.io.File(t.path + "/_log").list()
      .filter(_.startsWith("_tmp"))
    assert(leftovers.isEmpty)
  }

  test("append rebases over a concurrent commit instead of failing") {
    val t = fresh()
    t.append(df((1L, "a")))
    // writer A stages, then B commits first — A's commitFiles sees the
    // race at publish time and rebases onto B's version
    val aFiles = t.stage(df((2L, "a2")))
    val other = new IncrementalTable(spark, t.path)
    other.append(df((3L, "b")))
    val v = t.commitFiles(aFiles, Set.empty, "append")
    assert(v === 2L)
    assert(t.snapshot().count() === 3L)
    // both writers' files are referenced — nothing was lost
    assert(t.files(2L).toSet.size === 3)
  }

  test("removing a file a concurrent commit rewrote is a logical conflict") {
    val t = fresh()
    t.append(df((1L, "a")))
    t.append(df((2L, "b")))
    val victim = t.files(1L).head
    val staged = t.stage(df((9L, "rewritten")))
    // concurrent writer compacts — every old file reference is rewritten
    val other = new IncrementalTable(spark, t.path)
    other.compact(targetFiles = 1)
    val err = intercept[CommitConflictException](
      t.commitFiles(staged, Set(victim), "rewrite"))
    assert(err.getMessage.contains(victim))
  }

  test("a rewrite racing a deletion-vector commit fails loudly (no resurrection)") {
    import org.apache.spark.sql.functions.col
    val t = fresh()
    (0 until 4).foreach(i => t.append(df((i.toLong, s"v$i"))))
    val v0 = t.latestVersion.get
    // the rewrite READS v0 (pre-DV) and stages — then the DV lands
    val staged = t.stage(t.snapshotAt(v0).repartition(1))
    assert(t.deleteVector(col("id") === 2L) === v0 + 1)
    // committing the stale rewrite must fail loudly: its staged rows
    // still contain id=2
    val err = intercept[CommitConflictException](
      t.commitFiles(staged, t.files(v0).toSet, "compact",
        readVersion = Some(v0), dropMeta = Set("dv")))
    assert(err.getMessage.contains("deletion vectors"))
    assert(t.snapshot().filter("id = 2").count() === 0L,
      "deleted row resurrected by a stale rewrite")
    // the reverse order is already loud: a commit landing first makes
    // deleteVector's un-rebased publish conflict
    val staged2 = t.stage(t.snapshot().repartition(1))
    val v2 = t.commitFiles(staged2, t.files(t.latestVersion.get).toSet,
      "compact", readVersion = Some(t.latestVersion.get), dropMeta = Set("dv"))
    assert(t.snapshot().filter("id = 2").count() === 0L)
    assert(t.latestVersion.contains(v2))
  }

  test("compactSmall racing DV deletes: either order, deleted rows stay deleted") {
    import org.apache.spark.sql.functions.col
    val t = fresh()
    (0 until 6).foreach(i => t.append(df((i.toLong, s"v$i"))))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def retry[A](f: => A): A = {
      var out: Option[A] = None
      var tries = 0
      while (out.isEmpty)
        try out = Some(f)
        catch {
          case _: CommitConflictException if tries < 10 => tries += 1
          case e: Throwable => errors.add(e); throw e
        }
      out.get
    }
    val compactor = new Thread(() => {
      val mine = new IncrementalTable(spark, t.path)
      barrier.await()
      // maintenance is idempotent: a loud DV conflict is re-run
      retry(mine.compactSmall(minFileBytes = 1L << 30, targetFileBytes = 1L << 30))
    })
    val deleter = new Thread(() => {
      val mine = new IncrementalTable(spark, t.path)
      barrier.await()
      // the DV protocol: a loser re-runs on fresh state
      retry(mine.deleteVector(col("id").isin(1L, 3L)))
    })
    compactor.start(); deleter.start()
    compactor.join(120000); deleter.join(120000)
    assert(errors.isEmpty, s"unexpected failures: ${errors}")
    val rows = t.snapshot().select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(rows === Seq(0L, 2L, 4L, 5L),
      s"DV-vs-compaction race lost or resurrected rows: $rows")
  }

  test("compact racing appends keeps the racer's rows (maintenance commutes)") {
    val t = fresh()
    (0 until 5).foreach(i => t.append(df((i.toLong, s"v$i"))))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val compactor = new Thread(() => {
      val mine = new IncrementalTable(spark, t.path)
      barrier.await()
      try mine.compact(targetFiles = 2)
      catch { case e: Throwable => errors.add(e) }
    })
    val appender = new Thread(() => {
      val mine = new IncrementalTable(spark, t.path)
      barrier.await()
      try (0 until 4).foreach(i => mine.append(df((100L + i, s"new$i"))))
      catch { case e: Throwable => errors.add(e) }
    })
    compactor.start(); appender.start()
    compactor.join(120000); appender.join(120000)
    // no caller-visible conflicts, and EVERY row survives — the old
    // full-list republish silently dropped appends that landed between
    // compact's read and its commit
    assert(errors.isEmpty, s"append-vs-compact must not surface conflicts: $errors")
    val ids = t.snapshot().select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids === ((0L until 5L) ++ (100L until 104L)).sorted,
      s"rows lost in append-vs-compact race: $ids")
  }

  test("four concurrent appenders, no lost updates") {
    val t = fresh()
    val writers = 4
    val perWriter = 5
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          val mine = new IncrementalTable(spark, t.path)
          (0 until perWriter).foreach { i =>
            mine.append(df((w * 100L + i, s"w$w-$i")))
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"appender died: ${errors.peek()}")
    assert(t.latestVersion === Some((writers * perWriter - 1).toLong))
    assert(t.snapshot().count() === (writers * perWriter).toLong)
    // every writer's every row survived the races
    assert(t.snapshot().select("tag").distinct().count() ===
      (writers * perWriter).toLong)
  }

  test("schema evolution rebases inside the commit CAS: no column lost") {
    import spark.implicits._
    val t = fresh()
    t.append(df((1L, "a")))
    // writer A stages an add-column(c1) commit, then B lands an
    // add-column(c2) commit first — A's rebase must re-merge against
    // B's schema, keeping BOTH columns (the pre-CAS design lost one)
    val withC1 = Seq((2L, "b", 1.5)).toDF("id", "tag", "c1").coalesce(1)
    val withC2 = Seq((3L, "c", 7L)).toDF("id", "tag", "c2").coalesce(1)
    val aFiles = t.stage(withC1)
    new IncrementalTable(spark, t.path).append(withC2)
    t.commitFiles(aFiles, Set.empty, "append", schema = Some(withC1.schema))
    assert(t.tableSchema.get.fieldNames.toSet === Set("id", "tag", "c1", "c2"))
    assert(t.snapshot().columns.toSet === Set("id", "tag", "c1", "c2"))
    // schema metadata time-travels with the version
    assert(t.schemaAt(0L).get.fieldNames.toSeq === Seq("id", "tag"))
    assert(t.schemaAt(1L).get.fieldNames.toSet === Set("id", "tag", "c2"))
  }

  test("racing add-column appends: both columns in the tracked schema") {
    import spark.implicits._
    val t = fresh()
    t.append(df((1L, "a")))
    val frames = Seq(
      Seq((2L, "b", 1.5)).toDF("id", "tag", "c1").coalesce(1),
      Seq((3L, "c", 7L)).toDF("id", "tag", "c2").coalesce(1))
    val threads = frames.map { d =>
      new Thread(() => { new IncrementalTable(spark, t.path).append(d); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(t.latestVersion === Some(2L))
    assert(t.tableSchema.get.fieldNames.toSet === Set("id", "tag", "c1", "c2"),
      "a concurrent add-column commit dropped the other's column")
  }

  test("manifest meta rejects the delimiters metaAt's parser splits on") {
    val t = fresh()
    val staged = t.stage(df((1L, "a")))
    // ',' splits pairs, ':' splits key from value — a value carrying
    // them would mis-parse (or MatchError) on read, so the write side
    // must reject them up front
    assertThrows[IllegalArgumentException](
      t.writeManifest(0L, "m", staged, Map("k" -> "a,b")))
    assertThrows[IllegalArgumentException](
      t.writeManifest(0L, "m", staged, Map("k:x" -> "v")))
    // ':' inside a VALUE is fine — the parser splits key:value once
    t.writeManifest(0L, "m", staged, Map("ts" -> "12:30"))
    assert(t.metaAt(0L) === Map("ts" -> "12:30"))
  }

  test("copy-on-write DELETE conflicts when a concurrent commit rewrote its files") {
    import org.apache.spark.sql.functions.col
    val t = fresh()
    t.append(df((1L, "a"), (2L, "b")))
    t.append(df((3L, "c")))
    // DELETE will want to remove the file holding id=1; a concurrent
    // compact rewrites ALL files first — the removal set is stale
    val h2 = new IncrementalTable(spark, t.path)
    h2.compact(1)
    // h1's view of candidate files is recomputed inside deleteWhere
    // (it reads latestVersion), so a *completed* compact is fine:
    assert(t.deleteWhere(col("id") === 1L) === 3L)
    assert(t.snapshot().count() === 2L)
    // the true stale-removal race arbitrates in commitFiles: removing a
    // file the winner rewrote is a logical conflict
    assertThrows[CommitConflictException] {
      t.commitFiles(Seq.empty, Set("no-longer-referenced.parquet"), "delete")
    }
  }

  test("racing DV deletes: exactly one wins, the loser's vectors are not lost silently") {
    import org.apache.spark.sql.functions.col
    val t = fresh()
    t.append(df((1L, "a"), (2L, "b"), (3L, "c")))
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = Seq(1L, 2L).map { id =>
      new Thread(() => {
        try {
          new IncrementalTable(spark, t.path).deleteVector(col("id") === id)
          outcomes.add(s"ok$id")
        } catch {
          case _: CommitConflictException => outcomes.add(s"conflict$id")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    val res = outcomes.toArray.map(_.toString).toSet
    // either serialized cleanly (both ok) or the loser failed loudly —
    // never a silent overwrite of the winner's vectors
    val survivors = t.snapshot().select("id").collect().map(_.getLong(0)).toSet
    if (res === Set("ok1", "ok2")) assert(survivors === Set(3L))
    else {
      assert(res.count(_.startsWith("ok")) === 1)
      val winner = res.find(_.startsWith("ok")).get.stripPrefix("ok").toLong
      assert(survivors === Set(1L, 2L, 3L) - winner)
    }
  }

  test("overwrite races resolve last-writer-wins at distinct versions") {
    val t = fresh()
    t.append(df((1L, "a")))
    val threads = (0 until 3).map { w =>
      new Thread(() => {
        new IncrementalTable(spark, t.path)
          .writeSnapshot(df((100L + w, s"snap$w")), operation = "overwrite")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(t.latestVersion === Some(3L))
    // the latest version is exactly ONE of the snapshots, intact
    val tags = t.snapshot().select("tag").collect().map(_.getString(0)).toSeq
    assert(tags.size === 1 && tags.head.startsWith("snap"))
  }
}
