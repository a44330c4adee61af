package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The generic reader/writer feature gate (`rf` manifest meta — the
  * Delta table-features idea): versions stamp the features a reader
  * must implement; unknown features make every data read AND every
  * commit refuse loudly; known features (column mapping, deletion
  * vectors) gate uniformly through the same mechanism; pre-gate
  * tables derive their feature set from the meta keys and behave
  * identically.
  */
class ProtocolGateSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("protogate_").toString + "/t"
    new IncrementalTable(spark, dir)
  }
  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "tag").coalesce(1)
  }

  test("an unknown (future) feature refuses reads and writes; time travel below it works") {
    val t = fresh()
    t.append(df((1L, "a")))
    // a future writer publishes v1 demanding a feature we don't have
    t.commitFiles(Seq.empty, Set.empty, "future-feature",
      meta = Map("rf" -> "time-crystals"))
    assert(t.readerFeaturesAt(1L) === Set("time-crystals"))
    val e = intercept[IllegalStateException](t.snapshot().collect())
    assert(e.getMessage.contains("time-crystals") &&
      e.getMessage.contains("does not support"), e.getMessage)
    assertThrows[IllegalStateException](t.scan().collect())
    assertThrows[IllegalStateException](t.changes(0L, 1L).collect())
    // the path connector refuses through the SAME gate
    val p = intercept[IllegalStateException](
      spark.read.format("graft").load(t.path).collect())
    assert(p.getMessage.contains("time-crystals"), p.getMessage)
    // an old writer must not commit over state it cannot read
    val w = intercept[IllegalStateException](t.append(df((2L, "b"))))
    assert(w.getMessage.contains("time-crystals"), w.getMessage)
    // time travel BELOW the feature version needs no feature support
    assert(t.snapshotAt(0L).count() === 1L)
    assert(spark.read.format("graft").option("versionAsOf", "0")
      .load(t.path).count() === 1L)
  }

  test("every manifest-publishing path refuses to write over an unknown feature") {
    val t = fresh()
    t.append(df((1L, "a")))
    t.commitFiles(Seq.empty, Set.empty, "future-feature",
      meta = Map("rf" -> "time-crystals"))
    // full-snapshot publish, compact, restore-over, clone-of: all must
    // refuse rather than clobber (or launder) the feature
    assertThrows[IllegalStateException](t.writeSnapshot(df((9L, "z"))))
    assertThrows[IllegalStateException](t.compact(targetFiles = 1))
    assertThrows[IllegalStateException](t.restore(0L))
    val cloneDir = Files.createTempDirectory("protogate_clone_").toString + "/c"
    assertThrows[IllegalStateException](
      new IncrementalTable(spark, cloneDir).cloneFrom(t))
    // nothing committed by the refusals
    assert(t.latestVersion.contains(1L))
  }

  test("restore TO a feature version carries its requirement forward") {
    val t = fresh()
    t.append(df((1L, "a")))                                   // v0
    t.commitFiles(Seq.empty, Set.empty, "future-feature",
      meta = Map("rf" -> "time-crystals"))                    // v1
    // a feature-AWARE writer clears it (simulated: plain full list)
    t.writeManifest(2L, "feature-cleared", t.files(0L))       // v2
    assert(t.readerFeaturesAt(2L) === Set.empty)
    assert(t.snapshot().count() === 1L)
    // restoring to v1 must re-stamp the requirement, not launder it
    val rv = t.restore(1L)
    assert(t.readerFeaturesAt(rv) === Set("time-crystals"))
    assertThrows[IllegalStateException](t.snapshot().collect())
  }

  test("the streaming path refuses an unknown feature through the same gate") {
    val t = fresh()
    t.append(df((1L, "a")))
    t.commitFiles(Seq.empty, Set.empty, "future-feature",
      meta = Map("rf" -> "time-crystals"))
    // the refusal may surface at stream LOAD (schema resolution goes
    // through the gated batch connector) or at the first micro-batch
    // (GraftMicroBatchStream's own gate) — either way, loudly
    val err = intercept[Exception] {
      val q = spark.readStream.format("graft").load(t.path)
        .writeStream.format("memory")
        .queryName("gate_stream_" + java.util.UUID.randomUUID().toString.take(8))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(60000) finally q.stop()
    }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("time-crystals")),
      s"stream must refuse the unknown feature: ${messages(err)}")
  }

  test("known features stamp rf automatically and clear when their state clears") {
    import org.apache.spark.sql.functions.col
    val t = fresh()
    (0 until 3).foreach(i => t.append(df((i.toLong, s"v$i"))))
    assert(t.readerFeaturesAt(t.latestVersion.get) === Set.empty)
    t.deleteVector(col("id") === 1L)
    assert(t.readerFeaturesAt(t.latestVersion.get) === Set("deletion-vectors"))
    t.renameColumn("tag", "label")
    assert(t.readerFeaturesAt(t.latestVersion.get) ===
      Set("deletion-vectors", "column-mapping"))
    // IncrementalTable implements both: reads keep working
    assert(t.snapshot().count() === 2L)
    // the path connector refuses BOTH, each with its remediation
    val e = intercept[IllegalStateException](
      spark.read.format("graft").load(t.path).collect())
    assert(e.getMessage.contains("column mapping") &&
      e.getMessage.contains("deletion vectors"), e.getMessage)
    // materializing clears the state AND the stamped features
    t.compact(targetFiles = 1)
    assert(t.readerFeaturesAt(t.latestVersion.get) === Set.empty)
    assert(spark.read.format("graft").load(t.path).count() === 2L)
  }
}
