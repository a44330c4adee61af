package graft.lake

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CROSS-PROCESS commit arbitration: two JVMs — this one and a forked
  * [[CommitRaceWorker]] — race appends on one table with nothing
  * shared but the directory. The per-table JVM publish lock cannot
  * serialize them; only the on-disk protocol (tmp write + link(2)
  * create-if-absent CAS) arbitrates. A lost update here is exactly the
  * multi-writer deployment bug Delta's LogStore exists to prevent.
  */
class CommitRaceSpec extends AnyFunSuite with SparkSpec {

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two OS processes racing appends: no lost commits, contiguous versions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("race2jvm_").toString + "/t"
    val t = new IncrementalTable(spark, dir)
    t.append(Seq(("seed", "main")).toDF("key", "writer").coalesce(1))

    val n = 8
    val javaBin = new java.io.File(new java.io.File(
      sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.lake.CommitRaceWorker", dir, "B", n.toString)
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new java.lang.StringBuilder
    val drain = new Thread(() => {
      val src = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
      src.getLines().foreach(l => out.append(l).append('\n'))
    })
    drain.setDaemon(true)
    drain.start()
    try {
      // wait for the worker's session to be up, so the two append
      // loops genuinely overlap instead of racing against JVM boot
      val ready = java.nio.file.Paths.get(dir, "_worker_B_ready")
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(120)
      while (!Files.exists(ready) && System.nanoTime() < deadline && proc.isAlive)
        Thread.sleep(100)
      assert(Files.exists(ready), s"worker never became ready:\n$out")
      (0 until n).foreach(i =>
        t.append(Seq((s"A-$i", "A")).toDF("key", "writer").coalesce(1)))
      assert(proc.waitFor(180, TimeUnit.SECONDS), s"worker timed out:\n$out")
      assert(proc.exitValue() === 0, s"worker failed:\n$out")
    } finally if (proc.isAlive) proc.destroyForcibly()

    // every commit from both writers survived: 1 seed + 2n appends at
    // contiguous versions, every row present exactly once
    val fresh = new IncrementalTable(spark, dir)
    val latest = fresh.latestVersion.get
    assert(latest === (2 * n).toLong,
      s"expected version ${2 * n}, got $latest — a commit was lost:\n$out")
    (0L to latest).foreach(v => assert(fresh.versionExists(v),
      s"version $v missing from the log"))
    val rows = fresh.snapshot().select("key").as[String].collect().toSeq
    assert(rows.size === 2 * n + 1, s"row count: ${rows.size} of ${2 * n + 1}")
    assert(rows.distinct.size === rows.size, "duplicate rows after the race")
    assert(rows.count(_.startsWith("A-")) === n)
    assert(rows.count(_.startsWith("B-")) === n)
  }

  test("two OS processes racing identity allocation: no duplicate ids, grid kept") {
    import spark.implicits._
    val dir = Files.createTempDirectory("idrace2jvm_").toString + "/t"
    val t = new IncrementalTable(spark, dir)
    t.append(Seq(("seed", "main")).toDF("key", "writer")
      .withColumn("id", org.apache.spark.sql.functions.lit(null).cast("long"))
      .coalesce(1))
    t.setIdentity("id", start = 10L, step = 3L)

    val n = 6
    val rowsPerBatch = 3
    val javaBin = new java.io.File(new java.io.File(
      sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.lake.IdentityRaceWorker", dir, "B", n.toString, rowsPerBatch.toString)
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
      while (!Files.exists(ready) && System.nanoTime() < deadline && proc.isAlive)
        Thread.sleep(100)
      assert(Files.exists(ready), s"worker never became ready:\n$out")
      (0 until n).foreach(i =>
        t.append((0 until rowsPerBatch).map(j => (s"A-$i-$j", "A"))
          .toDF("key", "writer").coalesce(1)))
      assert(proc.waitFor(180, TimeUnit.SECONDS), s"worker timed out:\n$out")
      assert(proc.exitValue() === 0, s"worker failed:\n$out")
    } finally if (proc.isAlive) proc.destroyForcibly()

    // every id allocated exactly once across both JVMs, all on the
    // start + k*step grid — a watermark rewind or a missed commit-time
    // re-check shows up here as a duplicate
    val fresh = new IncrementalTable(spark, dir)
    val idRows = fresh.snapshot().filter("id IS NOT NULL")
      .select("id", "key").as[(Long, String)].collect().toSeq
    assert(idRows.size === 2 * n * rowsPerBatch,
      s"expected ${2 * n * rowsPerBatch} allocated rows, got ${idRows.size}:\n$out")
    val ids = idRows.map(_._1)
    assert(ids.distinct.size === ids.size,
      s"duplicate identity ids across JVMs: ${ids.groupBy(identity).collect {
        case (v, g) if g.size > 1 => v }.toSeq.sorted}\n$out")
    assert(ids.forall(id => id >= 10L && (id - 10L) % 3L == 0L),
      s"ids off the start=10/step=3 grid: ${ids.filterNot(id => (id - 10L) % 3L == 0L)}")
    assert(fresh.identityHighWatermark >= ids.max)
  }
}
