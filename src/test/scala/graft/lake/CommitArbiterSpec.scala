package graft.lake

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.Executors

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The pluggable commit-arbitration seam: resolution/wiring, the
  * object-store (external-CAS) arbiter's no-lost-update guarantee, and
  * the two failure-mode regressions from the round-5 advice — a failed
  * tmp cleanup after a WON link CAS must not read as a failed commit,
  * and a transient probe error must not permanently degrade the CAS.
  */
class CommitArbiterSpec extends AnyFunSuite with SparkSpec {

  private def localFs(): FileSystem = {
    val fs = new RawLocalFileSystem()
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  private def writeTmp(dir: java.nio.file.Path, name: String, body: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
    new Path(p.toUri)
  }

  test("arbiter resolution: defaults by scheme, prefix override wins over scheme") {
    assert(CommitArbiters.forTable("/x/t", "file") === LinkCasArbiter)
    assert(CommitArbiters.forTable("/x/t", "hdfs") === RenameArbiter)
    val custom = new ExternalCasArbiter(new InMemoryCas)
    CommitArbiters.register("hdfs", custom)
    try assert(CommitArbiters.forTable("/x/t", "hdfs") === custom)
    finally CommitArbiters.unregister("hdfs")
    CommitArbiters.registerPath("/x/", custom)
    try {
      assert(CommitArbiters.forTable("/x/t", "file") === custom)
      assert(CommitArbiters.forTable("/y/t", "file") === LinkCasArbiter)
      // longest prefix is the most specific override
      val inner = new ExternalCasArbiter(new InMemoryCas)
      CommitArbiters.registerPath("/x/t", inner)
      try assert(CommitArbiters.forTable("/x/t/v", "file") === inner)
      finally CommitArbiters.unregisterPath("/x/t")
    } finally CommitArbiters.unregisterPath("/x/")
  }

  test("external-CAS arbiter: 32 racers on one version — exactly one winner, no clobber") {
    val fs = localFs()
    val dir = Files.createTempDirectory("cas_race_")
    val dest = new Path(dir.resolve("00000000000000000001.json").toUri)
    val arbiter = new ExternalCasArbiter(new InMemoryCas)
    val pool = Executors.newFixedThreadPool(32)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results =
      try {
        val futures = (0 until 32).map { i =>
          val tmp = writeTmp(dir, s"_tmp_$i.json", s"writer-$i")
          pool.submit(new java.util.concurrent.Callable[Option[Int]] {
            def call(): Option[Int] = {
              gate.await()
              if (arbiter.publish(fs, tmp, dest)) Some(i) else None
            }
          })
        }
        gate.countDown()
        futures.map(_.get())
      } finally pool.shutdown()
    val winners = results.flatten
    assert(winners.size === 1, s"expected exactly one CAS winner, got $winners")
    val committed = new String(
      Files.readAllBytes(java.nio.file.Paths.get(dest.toUri)), StandardCharsets.UTF_8)
    assert(committed === s"writer-${winners.head}",
      "committed manifest is not the CAS winner's payload — a lost update")
    // losers' tmp files survive for their callers to clean up
    assert((0 until 32).count(i => Files.exists(dir.resolve(s"_tmp_$i.json"))) === 31)
  }

  test("table commits through a registered external-CAS arbiter: contiguous versions, no lost rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cas_table_").toString + "/t"
    CommitArbiters.registerPath(dir, new ExternalCasArbiter(new InMemoryCas))
    try {
      val pool = Executors.newFixedThreadPool(4)
      try {
        val futures = (0 until 4).map { w =>
          pool.submit(new Runnable {
            def run(): Unit = {
              val t = new IncrementalTable(spark, dir)
              (0 until 4).foreach(i =>
                t.append(Seq((s"$w-$i", w)).toDF("key", "writer").coalesce(1)))
            }
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
      val t = new IncrementalTable(spark, dir)
      assert(t.latestVersion.get === 15L)
      (0L to 15L).foreach(v => assert(t.versionExists(v), s"version $v missing"))
      val rows = t.snapshot().select("key").as[String].collect().toSeq
      assert(rows.size === 16 && rows.distinct.size === 16)
    } finally CommitArbiters.unregisterPath(dir)
  }

  test("conflict error names the arbiter that arbitrated it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cas_lose_").toString + "/t"
    val t0 = new IncrementalTable(spark, dir)
    t0.append(Seq(("seed", 0)).toDF("key", "writer").coalesce(1))
    object AlwaysLose extends CommitArbiter {
      val name = "always-lose-fake"
      def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean = false
    }
    CommitArbiters.registerPath(dir, AlwaysLose)
    try {
      val e = intercept[CommitConflictException] {
        t0.commitFiles(Seq.empty, Set.empty, "noop", maxRetries = 1)
      }
      assert(e.getMessage.contains("always-lose-fake"), e.getMessage)
    } finally CommitArbiters.unregisterPath(dir)
  }

  test("link CAS: a failed tmp cleanup after a WON link is still a committed publish") {
    // after createLink lands dest, tmp is merely a second hard link to
    // the committed manifest — an IOException from the cleanup must not
    // surface as a commit failure (retrying callers would double-commit)
    val dir = Files.createTempDirectory("cas_cleanup_")
    val tmp = writeTmp(dir, "_tmp_x.json", "payload")
    val dest = new Path(dir.resolve("00000000000000000002.json").toUri)
    val deleteBombFs = new RawLocalFileSystem() {
      override def delete(p: Path, recursive: Boolean): Boolean =
        throw new IOException("injected cleanup failure")
    }
    deleteBombFs.initialize(java.net.URI.create("file:///"), new Configuration())
    assert(LinkCasArbiter.publish(deleteBombFs, tmp, dest) === true)
    assert(Files.exists(java.nio.file.Paths.get(dest.toUri)))
    // and the loser path still reports a clean loss with dest intact
    val tmp2 = writeTmp(dir, "_tmp_y.json", "other")
    assert(LinkCasArbiter.publish(localFs(), tmp2, dest) === false)
    val committed = new String(
      Files.readAllBytes(java.nio.file.Paths.get(dest.toUri)), StandardCharsets.UTF_8)
    assert(committed === "payload")
  }

  test("link-capability probe: transient failure is not cached as 'links unsupported'") {
    val missing = Files.createTempDirectory("cas_probe_").resolve("not_yet")
    // probe write fails (directory doesn't exist) → undecided: rethrow
    intercept[IOException] { LinkCasArbiter.hardLinksWork(missing) }
    // once the transient condition clears, the SAME directory probes
    // true — a cached negative would be the permanent silent
    // degradation to exists+rename the advice flagged
    Files.createDirectories(missing)
    assert(LinkCasArbiter.hardLinksWork(missing) === true)
  }
}
