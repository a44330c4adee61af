package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Lossless type widening (int → long, float → double — Delta's
  * type-widening feature): OPT-IN via setTypeWidening / TBLPROPERTIES
  * `graft.enableTypeWidening` (default off, like Delta's
  * `delta.enableTypeWidening`); once enabled, a wide batch commits
  * without rewriting the table, old narrow files upcast at scan, time
  * travel keeps each version's own width, stats skipping survives the
  * mixed-width store, a widened column's bloom index is retired in the
  * same commit (its filters hashed the narrow values — a wide probe
  * would wrongly prune), re-enabling bloom purges the stale narrow
  * rows, and the commit demands the `type-widening` reader feature so
  * pre-widening readers refuse cleanly.
  */
class TypeWideningSpec extends AnyFunSuite with SparkSpec {

  private def mkDir(tag: String) =
    Files.createTempDirectory(s"widen_${tag}_").toString + "/t"

  test("widening is opt-in: a wide batch is refused until enabled") {
    import spark.implicits._
    val dir = mkDir("gate")
    val t = new IncrementalTable(spark, dir)
    t.append(Seq((1, "a")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((1L << 40, "wide")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("incompatible schema change") &&
      e.getMessage.contains("graft.enableTypeWidening"), e.getMessage)
    assert(t.tableSchema.get("k").dataType === IntegerType)
    // enable -> the same batch commits
    t.setTypeWidening(true)
    assert(t.typeWideningEnabled)
    t.append(Seq((1L << 40, "wide")).toDF("k", "v"))
    assert(t.tableSchema.get("k").dataType === LongType)
    t.setTypeWidening(false)
    assert(!t.typeWideningEnabled)
    // a NARROW batch still commits with the gate off — conformWidths
    // upcasts it at write, so it is no schema event (the gate governs
    // schema changes only); the already-widened state survives
    t.append(Seq((7, "g")).toDF("k", "v"))
    assert(t.tableSchema.get("k").dataType === LongType)
    assert(t.snapshot().count() === 3)
  }

  test("int->long widening: wide batch commits, narrow files upcast at read") {
    import spark.implicits._
    val dir = mkDir("il")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))      // k: int
    assert(t.tableSchema.get("k").dataType === IntegerType)
    val v0 = t.latestVersion.get
    t.append(Seq((3L, "c"), (1L << 40, "d")).toDF("k", "v")) // k: long
    assert(t.tableSchema.get("k").dataType === LongType)
    val rows = t.snapshot().select("k", "v").as[(Long, String)].collect().toMap
    assert(rows === Map(1L -> "a", 2L -> "b", 3L -> "c", (1L << 40) -> "d"))
    // a narrow batch into the widened table stays committable and the
    // table schema stays wide
    t.append(Seq((5, "e")).toDF("k", "v"))
    assert(t.tableSchema.get("k").dataType === LongType)
    assert(t.snapshot().count() === 5)
    // time travel: the pre-widening version keeps its own narrow width
    assert(t.schemaAt(v0).get("k").dataType === IntegerType)
    assert(t.snapshotAt(v0).schema("k").dataType === IntegerType)
    assert(t.snapshotAt(v0).count() === 2)
    // post-widening versions read their mixed-width file sets
    assert(t.snapshotAt(t.latestVersion.get).schema("k").dataType === LongType)
  }

  test("float->double widening; lossy changes still refused") {
    import spark.implicits._
    val dir = mkDir("fd")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1.5f, "a")).toDF("x", "v"))
    t.append(Seq((2.25d, "b")).toDF("x", "v"))
    assert(t.tableSchema.get("x").dataType === DoubleType)
    assert(t.snapshot().select("x").as[Double].collect().toSet === Set(1.5d, 2.25d))
    // long -> int (narrowing) and string -> int are NOT widenings
    val e = intercept[IllegalArgumentException] {
      t.append(Seq(("oops", "c")).toDF("x", "v"))
    }
    assert(e.getMessage.contains("incompatible schema change"))
  }

  test("stats skipping survives a widening (mixed-width stats store)") {
    import spark.implicits._
    val dir = mkDir("st")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    // two narrow files with disjoint ranges, then a widening append
    t.append(Seq.tabulate(100)(i => (i, "lo")).toDF("k", "v").coalesce(1))
    t.append(Seq.tabulate(100)(i => (1000 + i, "mid")).toDF("k", "v").coalesce(1))
    t.append(Seq((1L << 40, "hi")).toDF("k", "v").coalesce(1))
    val all = t.files(t.latestVersion.get)
    // pruning still engages across int- and long-typed stats rows
    val pruned = t.prunedFiles(all, Seq(col("k") >= (1L << 40)))
    assert(pruned.size < all.size,
      s"stats pruning dead after widening: kept ${pruned.size} of ${all.size}")
    assert(t.scan(col("k") >= (1L << 40)).count() === 1)
    assert(t.scan(col("k") < 100).count() === 100)
    assert(t.scan(col("k") >= 1000 && col("k") < 1100).count() === 100)
  }

  test("widening a bloom-indexed column retires it from the bloom config") {
    import spark.implicits._
    val dir = mkDir("bl")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.setBloomColumns("k", "v")
    t.append(Seq.tabulate(50)(i => (10 + i, s"r$i")).toDF("k", "v").coalesce(1))
    assert(t.bloomColumns.toSet === Set("k", "v"))
    t.append(Seq((1L << 40, "wide")).toDF("k", "v"))
    // k's filters hashed INT values — a LONG probe would miss and
    // wrongly prune, so the widening commit retires k (v survives)
    assert(t.bloomColumns.toSet === Set("v"),
      s"widened column must leave the bloom config: ${t.bloomColumns}")
    // correctness: the point lookup still finds its row
    assert(t.scan(col("k") === 15L).count() === 1)
    assert(t.scan(col("k") === (1L << 40)).count() === 1)
  }

  test("re-enabling bloom on a widened column purges its stale narrow rows") {
    import spark.implicits._
    val dir = mkDir("rb")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "seed")).toDF("k", "v"))
    t.setBloomColumns("k")
    // this batch's file gets a bloom row hashing INT values of k
    t.append(Seq.tabulate(50)(i => (10 + i, s"r$i")).toDF("k", "v").coalesce(1))
    t.append(Seq((1L << 40, "wide")).toDF("k", "v")) // widens; k retired
    assert(t.bloomColumns.isEmpty)
    // re-enable WITHOUT compacting: the stored int-hashed rows must not
    // be probed with long-typed hashes — that would false-negative and
    // silently prune the file holding k=15
    t.setBloomColumns("k")
    assert(t.bloomColumns === Seq("k"))
    assert(t.scan(col("k") === 15L).count() === 1,
      "stale narrow-hashed bloom row wrongly pruned the file holding k=15")
    assert(t.scan(col("k") === (1L << 40)).count() === 1)
    // rebuilt-from-here filters engage for NEW data as usual
    t.append(Seq.tabulate(50)(i => (1000L + i, s"n$i")).toDF("k", "v").coalesce(1))
    assert(t.scan(col("k") === 1005L).count() === 1)
  }

  test("a narrow batch into a widened bloom-indexed table stays probe-consistent") {
    import spark.implicits._
    val dir = mkDir("nb")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((1L << 40, "wide")).toDF("k", "v")) // widens k
    t.setBloomColumns("k")
    val before = t.files(t.latestVersion.get).toSet
    // a narrow INT batch after the widening: conformWidths upcasts it
    // at write, so its bloom rows hash LONG values — a long-typed
    // probe must find them (without the write-side cast this batch
    // would bloom-hash int and the probe would silently prune it)
    t.append(Seq.tabulate(50)(i => (100 + i, s"n$i")).toDF("k", "v").coalesce(1))
    assert(t.scan(col("k") === 123L).count() === 1,
      "narrow-batch bloom rows must hash at the tracked wide type")
    // the staged file is genuinely wide on disk, not narrow
    val newFile = (t.files(t.latestVersion.get).toSet -- before).head
    val footer = spark.read.parquet(
      s"$dir/data/$newFile").schema("k").dataType
    assert(footer === LongType, s"staged narrow batch landed as $footer")
  }

  test("dropTypeWideningDemand: refused while narrow files remain, clears after compact") {
    import spark.implicits._
    val dir = mkDir("df")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.append(Seq((1L << 40, "wide")).toDF("k", "v"))
    assert(t.readerFeaturesAt(t.latestVersion.get) === Set("type-widening"))
    // the pre-widening file is still INT32 on disk — refuse, name compact
    val e = intercept[IllegalStateException](t.dropTypeWideningDemand())
    assert(e.getMessage.contains("compact()"), e.getMessage)
    assert(t.readerFeaturesAt(t.latestVersion.get) === Set("type-widening"))
    // compact restages everything at the wide tracked schema
    t.compact(targetFiles = 1)
    val dv = t.dropTypeWideningDemand()
    assert(t.readerFeaturesAt(dv) === Set.empty)
    assert(t.metaAt(dv).get("widened") === None)
    // reads keep working; time travel to a demanding version still demands
    assert(t.snapshot().count() === 3)
    assert(t.readerFeaturesAt(dv - 2).contains("type-widening"))
    // idempotent when nothing is demanded
    assert(t.dropTypeWideningDemand() === dv)
  }

  test("graft.enableTypeWidening TBLPROPERTY drives the gate through SQL") {
    import spark.implicits._
    val wh = Files.createTempDirectory("widen_wh_").toString
    spark.conf.set("spark.sql.catalog.wlake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wlake.warehouse", wh)
    val t = new IncrementalTable(spark, s"$wh/w")
    t.append(Seq((1, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException](
      t.append(Seq((1L << 40, "x")).toDF("k", "v")))
    spark.sql("ALTER TABLE wlake.w SET TBLPROPERTIES " +
      "('graft.enableTypeWidening'='true')")
    assert(t.typeWideningEnabled)
    t.append(Seq((1L << 40, "x")).toDF("k", "v"))
    assert(t.tableSchema.get("k").dataType === LongType)
    // DESCRIBE DETAIL surfaces the gate and the stamped demand
    val props = spark.sql("DESCRIBE DETAIL wlake.w").head.getString(7)
    assert(props.contains("graft.enableTypeWidening=true") &&
      props.contains("readerFeatures=type-widening"), props)
    spark.sql("ALTER TABLE wlake.w UNSET TBLPROPERTIES " +
      "('graft.enableTypeWidening')")
    assert(!t.typeWideningEnabled)
    // a bad value is refused loudly
    assertThrows[Exception](spark.sql("ALTER TABLE wlake.w SET " +
      "TBLPROPERTIES ('graft.enableTypeWidening'='maybe')"))
  }

  test("ALTER TABLE ... DROP FEATURE type-widening through SQL") {
    import spark.implicits._
    val dir = mkDir("sq")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((1L << 40, "w")).toDF("k", "v"))
    t.compact(targetFiles = 1)
    val v = spark.sql(s"ALTER TABLE '$dir' DROP FEATURE type-widening")
      .collect().head.getLong(0)
    assert(t.readerFeaturesAt(v) === Set.empty)
    // features deriving from live state point at their materializer
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE '$dir' DROP FEATURE column-mapping").collect())
    assert(e.getMessage.contains("OPTIMIZE"), e.getMessage)
  }

  test("path connector reads a widened table: latest and time travel") {
    import spark.implicits._
    val dir = mkDir("pc")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val v0 = t.latestVersion.get
    t.append(Seq((1L << 40, "wide")).toDF("k", "v"))
    // latest: tracked wide schema, narrow footers upcast natively
    val latest = spark.read.format("graft").load(dir)
    assert(latest.schema("k").dataType === LongType)
    assert(latest.select("k").as[Long].collect().toSet ===
      Set(1L, 2L, 1L << 40))
    // time travel to the narrow version serves ITS schema
    val tt = spark.read.format("graft")
      .option("versionAsOf", v0.toString).load(dir)
    assert(tt.schema("k").dataType === IntegerType)
    assert(tt.count() === 2)
    // time travel to the post-widening version reads the mixed-width
    // file set under the wide schemaAt(v) — not a bare footer merge
    val tt2 = spark.read.format("graft")
      .option("versionAsOf", t.latestVersion.get.toString).load(dir)
    assert(tt2.schema("k").dataType === LongType)
    assert(tt2.select("k").as[Long].collect().toSet ===
      Set(1L, 2L, 1L << 40))
  }

  test("a running stream refuses a mid-stream widening with a restart message") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = mkDir("ms")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "a")).toDF("k", "v"))
    val sink = "widen_stream_" + java.util.UUID.randomUUID().toString.take(8)
    // ONE long-running query: its read schema is fixed (narrow) at
    // start — a restart would simply re-infer the wide schema, which
    // is exactly the remediation the refusal prescribes
    val q = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName(sink).start()
    val err = try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 1)
      t.append(Seq((1L << 40, "wide")).toDF("k", "v")) // widens k
      // the running stream's next batch reads the WIDE file under its
      // fixed NARROW schema: must refuse loudly, not misread
      intercept[Exception](q.processAllAvailable())
    } finally q.stop()
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("restart the stream")),
      s"expected the widening restart remediation: ${messages(err)}")
    // a FRESH stream (new checkpoint) reads wide and catches up
    val sink2 = sink + "_2"
    val q2 = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName(sink2)
      .trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination(60000) finally q2.stop()
    assert(spark.table(sink2).select("k").as[Long].collect().toSet ===
      Set(1L, 1L << 40))
  }

  test("row-level DML and the change feed work on a widened mixed-width table") {
    import spark.implicits._
    val dir = mkDir("dml")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v").coalesce(1)) // int file
    t.append(Seq((1L << 40, "wide")).toDF("k", "v").coalesce(1))           // widens
    // copy-on-write UPDATE: candidates stats-pruned over MIXED-width
    // stats rows, the long-literal predicate hits the int-era file,
    // the rewrite restages conformed (wide)
    t.updateWhere(col("k") === 2L,
      Map("v" -> org.apache.spark.sql.functions.lit("updated")))
    assert(t.scan(col("k") === 2L).select("v").as[String].head() === "updated")
    // copy-on-write DELETE of the wide-era row
    t.deleteWhere(col("k") === (1L << 40))
    assert(t.snapshot().count() === 3)
    // merge-on-read DELETE (deletion vector) against an int-era row
    t.deleteVector(col("k") === 3L)
    assert(t.snapshot().select("k").as[Long].collect().toSet === Set(1L, 2L))
    val preMerge = t.latestVersion.get
    // MERGE upserts across the width boundary, committed as a
    // manifest snapshot (the SQL MERGE path's shape)
    val merged = MergeInto(t.snapshot(),
      Seq((2L, "merged"), (1L << 41, "new")).toDF("k", "v"),
      "target.k = updates.k")
      .whenMatchedUpdate(Map("v" -> "updates.v"))
      .whenNotMatchedInsert(Map("k" -> "updates.k", "v" -> "updates.v"))
      .resolve()
    t.writeSnapshot(merged, "merge")
    val state = t.snapshot().select("k", "v").as[(Long, String)].collect().toMap
    assert(state === Map(1L -> "a", 2L -> "merged", (1L << 41) -> "new"))
    // the change feed replays the mixed-width DML history (up to the
    // merge snapshot — a CDC-less full rewrite is uncrossable by
    // contract, so the feed is read to the pre-merge head)
    assert(t.changes(-1L, preMerge)
      .filter(col("_change_type") === "delete").count() === 2)
    // the demand is still stamped; this library reads everything above
    assert(t.readerFeaturesAt(t.latestVersion.get).contains("type-widening"))
  }

  test("width-conformance lattice: staged footers always at tracked width, values exact") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // every lossless (narrow table-type, wider batch-or-table) pair in
    // the lattice; boundary values + nulls must survive both the
    // widening read path and the write-side conform path bit-exactly
    val intPairs = Seq[(DataType, DataType)](
      (ByteType, ShortType), (ByteType, IntegerType), (ByteType, LongType),
      (ShortType, IntegerType), (ShortType, LongType),
      (IntegerType, LongType))
    for ((narrow, wide) <- intPairs) {
      val dir = mkDir(s"lat_${narrow.simpleString}_${wide.simpleString}")
      val t = new IncrementalTable(spark, dir)
      t.setTypeWidening(true)
      def df(dt: DataType, vs: Seq[Any]) = spark.createDataFrame(
        java.util.Arrays.asList(vs.map(v => Row(v, "x")): _*),
        StructType(Seq(StructField("k", dt), StructField("v", StringType))))
      // narrow-type boundary values (+ null), then a widening batch,
      // then a post-widening NARROW batch (conformWidths path)
      val maxNarrow: Any = narrow match {
        case ByteType => Byte.MaxValue
        case ShortType => Short.MaxValue
        case IntegerType => Int.MaxValue
        case _ => fail("unexpected")
      }
      val minNarrow: Any = narrow match {
        case ByteType => Byte.MinValue
        case ShortType => Short.MinValue
        case IntegerType => Int.MinValue
        case _ => fail("unexpected")
      }
      val wideVal: Any = wide match {
        case ShortType => Short.MaxValue
        case IntegerType => Int.MaxValue
        case LongType => Long.MaxValue
        case _ => fail("unexpected")
      }
      t.append(df(narrow, Seq(maxNarrow, minNarrow, null)))
      t.append(df(wide, Seq(wideVal)))
      assert(t.tableSchema.get("k").dataType === wide,
        s"$narrow -> $wide merge")
      t.append(df(narrow, Seq(maxNarrow)))
      // post-widening file is physically WIDE on disk (conformed)
      val newest = t.files(t.latestVersion.get)
        .filterNot(t.files(t.latestVersion.get - 1).toSet).head
      assert(spark.read.parquet(s"$dir/data/$newest").schema("k").dataType
        === wide, s"post-widening $narrow batch landed narrow")
      def asLong(a: Any): Long = a match {
        case b: Byte => b.toLong; case s: Short => s.toLong
        case i: Int => i.toLong; case l: Long => l
      }
      val got = t.snapshot().select(col("k").cast("long")).as[java.lang.Long]
        .collect().toSeq.map(Option(_).map(_.toLong))
      val want = Seq(Some(asLong(maxNarrow)), Some(asLong(minNarrow)), None,
        Some(asLong(wideVal)), Some(asLong(maxNarrow)))
      assert(got.sortBy(_.getOrElse(Long.MinValue)) ===
        want.sortBy(_.getOrElse(Long.MinValue)),
        s"$narrow -> $wide values: $got")
    }
    // float -> double: exact IEEE widening incl. subnormal and null
    val dir = mkDir("lat_fd")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    val subnormal = java.lang.Float.MIN_VALUE
    t.append(Seq[(java.lang.Float, String)]((Float.MaxValue, "a"),
      (subnormal, "b"), (null, "c")).toDF("x", "v"))
    t.append(Seq((Double.MaxValue, "d")).toDF("x", "v"))
    assert(t.tableSchema.get("x").dataType === DoubleType)
    t.append(Seq[(java.lang.Float, String)]((-1.5f, "e")).toDF("x", "v"))
    val xs = t.snapshot().select("x").as[java.lang.Double].collect().toSet
    assert(xs === Set(Float.MaxValue.toDouble, subnormal.toDouble, null,
      Double.MaxValue, -1.5d), xs.toString)
  }

  test("cross-JVM race: widening mid-race against narrow appends stays sound") {
    import spark.implicits._
    import java.util.concurrent.TimeUnit
    val dir = Files.createTempDirectory("widenrace2jvm_").toString + "/t"
    val t = new IncrementalTable(spark, dir)
    t.append(Seq((1, "main")).toDF("k", "v").coalesce(1)) // int k seed
    t.setTypeWidening(true)

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
      "graft.lake.WideningRaceWorker", dir, "B", n.toString)
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
      // widen mid-race, then keep appending LONG batches against the
      // worker's int batches
      t.append(Seq((1L << 40, "main")).toDF("k", "v").coalesce(1))
      (0 until n).foreach(i =>
        t.append(Seq(((1L << 40) + 1 + i, "main")).toDF("k", "v").coalesce(1)))
      assert(proc.waitFor(180, TimeUnit.SECONDS), s"worker timed out:\n$out")
      assert(proc.exitValue() === 0, s"worker failed:\n$out")
    } finally if (proc.isAlive) proc.destroyForcibly()

    val fresh = new IncrementalTable(spark, dir)
    // no lost commits: seed + enable + (1 + n) main + n worker
    assert(fresh.latestVersion.get === (2 * n + 2).toLong,
      s"version count off — a commit was lost:\n$out")
    assert(fresh.tableSchema.get("k").dataType === LongType)
    // every value exact under the wide read schema — including the
    // worker's narrow batches that landed AFTER the widening commit
    val rows = fresh.snapshot().select("k").as[Long].collect().toSeq
    assert(rows.size === 2 * n + 2 && rows.distinct.size === rows.size,
      s"rows: $rows\n$out")
    (0 until n).foreach(i => assert(rows.contains(1000L + i),
      s"worker row ${1000 + i} lost or corrupted: $rows\n$out"))
    assert(rows.contains(1L << 40))
    // the demand survived every rebase — a post-widening narrow file
    // is exactly what it protects old readers from
    assert(fresh.readerFeaturesAt(fresh.latestVersion.get) ===
      Set("type-widening"))
  }

  test("a widening commit demands the type-widening reader feature") {
    import spark.implicits._
    val dir = mkDir("rf")
    val t = new IncrementalTable(spark, dir)
    t.setTypeWidening(true)
    t.append(Seq((1, "a")).toDF("k", "v"))
    assert(t.readerFeaturesAt(t.latestVersion.get) === Set.empty)
    t.append(Seq((1L << 40, "wide")).toDF("k", "v"))
    val v = t.latestVersion.get
    assert(t.readerFeaturesAt(v) === Set("type-widening"),
      s"widening must stamp rf: ${t.metaAt(v)}")
    assert(t.metaAt(v).get("widened") === Some("k"))
    // the demand (and the audit entry) carry across later commits
    t.append(Seq((7L, "later")).toDF("k", "v"))
    assert(t.readerFeaturesAt(t.latestVersion.get) === Set("type-widening"))
    assert(t.metaAt(t.latestVersion.get).get("widened") === Some("k"))
    // this library implements the feature: reads keep working
    assert(t.snapshot().count() === 3)
    // time travel to the pre-widening version demands nothing
    assert(t.readerFeaturesAt(v - 1) === Set.empty)
  }
}
