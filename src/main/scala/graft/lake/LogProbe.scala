package graft.lake

import org.apache.spark.sql.SparkSession

/** Measurement probe for the delta-encoded commit log (numbers quoted
  * in SCALE.md): on a table already holding N file references, what
  * does ONE 1-file append cost in manifest bytes — full-list encoding
  * (the round-3 format, still what v0/snapshot commits write) vs the
  * add/remove delta encoding — and how long does a cold reconstruction
  * take through a checkpoint?
  *
  * Lives in `graft.lake` to drive `writeManifest` directly with
  * synthetic file names: the point is log mechanics, not parquet IO.
  */
object LogProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("logprobe_").toString + "/t"
    val t = new IncrementalTable(spark, dir, collectStats = false)

    val base = (0 until n).map(i => f"part-$i%08d-0deadbeef.parquet")
    t.writeManifest(0L, "bulk-load", base) // full list (v0 has no prev)
    def manifestBytes(v: Long) =
      new java.io.File(f"$dir/_log/$v%020d.json").length

    // 25 single-file appends: the steady-state ingest pattern
    var prev = base
    val t0 = System.nanoTime()
    (1 to 25).foreach { i =>
      val f = Seq(f"append-$i%08d.parquet")
      t.writeManifest(i.toLong, "append", prev ++ f, prevFiles = Some(prev))
      prev = prev ++ f
    }
    val commitMs = (System.nanoTime() - t0) / 1e6 / 25
    val full = manifestBytes(0L)
    val delta = (1L to 25L).map(manifestBytes).max

    // cold reconstruction of the head (new instance, no cache): walks
    // back to the nearest checkpoint/full list and replays
    val t1 = System.nanoTime()
    val got = new IncrementalTable(spark, dir, collectStats = false).files(25L)
    val reconMs = (System.nanoTime() - t1) / 1e6
    require(got.size == n + 25, s"reconstruction lost files: ${got.size}")
    // second FRESH INSTANCE (cold caches, warm JVM): separates the
    // one-time parquet-reader class-loading from the per-read cost
    val t2 = System.nanoTime()
    val got2 = new IncrementalTable(spark, dir, collectStats = false).files(25L)
    val recon2Ms = (System.nanoTime() - t2) / 1e6
    require(got2.size == n + 25, s"reconstruction lost files: ${got2.size}")

    println(f"[logprobe] N=$n%,d files: full-list manifest $full%,d B; " +
      f"1-file append manifest $delta%,d B (${full.toDouble / delta}%.0fx smaller); " +
      f"append commit $commitMs%.1f ms; cold head reconstruction $reconMs%.1f ms " +
      f"(fresh-instance steady state $recon2Ms%.1f ms)")
    spark.stop()
  }
}
