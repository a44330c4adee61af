package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** O(new-data) maintenance: bin-packing compaction touches only the
  * small-file tail, incremental clustering z-orders only files added
  * since the last clustering commit — neither is O(table), which is
  * what makes them usable as a cadence on a growing table.
  */
class IncrementalMaintenanceSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): IncrementalTable = {
    val dir = Files.createTempDirectory("maint_").toString + "/t"
    new IncrementalTable(spark, dir)
  }

  test("compactSmall packs only the small-file tail; big files untouched") {
    val t = fresh()
    import spark.implicits._
    // one "big" file (1000 rows) + 5 tiny ones
    t.append((0 until 1000).map(i => (i.toLong, s"row$i")).toDF("id", "tag")
      .coalesce(1))
    val big = t.files(t.latestVersion.get).head
    (0 until 5).foreach(i =>
      t.append(Seq((10000L + i, s"tiny$i")).toDF("id", "tag").coalesce(1)))
    val before = t.snapshot().count()
    val bigBytes = new java.io.File(t.path + "/data/" + big).length
    val v = t.compactSmall(minFileBytes = bigBytes) // big file is NOT small
    val now = t.files(v)
    assert(now.contains(big), "the big file must not be rewritten")
    assert(now.size === 2, s"5 tiny files should pack into 1: $now")
    assert(t.snapshot().count() === before)
    // idempotent: one small file per dir left -> nothing to do
    assert(t.compactSmall(minFileBytes = bigBytes) === v)
  }

  test("compactSmall respects partition subdirectories and deletion vectors") {
    val t = fresh()
    import spark.implicits._
    // two bucket dirs, 3 tiny files each
    for (b <- Seq("__bucket=0", "__bucket=1"); i <- 0 until 3)
      t.commitFiles(
        t.stage(Seq((s"$b-$i", i.toLong)).toDF("k", "n").coalesce(1), b),
        Set.empty, "append")
    t.deleteVector(col("k") === "__bucket=0-1")
    val v = t.compactSmall()
    val now = t.files(v)
    assert(now.size === 2 && now.forall(f => f.contains("/")),
      s"each bucket should pack to one file in its own dir: $now")
    assert(t.snapshot().count() === 5, "the DV-deleted row must stay gone")
    assert(t.snapshot().filter(col("k") === "__bucket=0-1").count() === 0)
  }

  test("compactWhere rewrites only the files whose stats admit a match") {
    val t = fresh()
    import spark.implicits._
    // key-clustered appends: four files with disjoint id ranges
    (0 until 4).foreach { b =>
      t.append((0 until 50).map(i => (b * 1000L + i, s"r$i"))
        .toDF("id", "tag").coalesce(1))
    }
    val v0 = t.latestVersion.get
    val all = t.files(v0)
    assert(all.size === 4)
    val hot = all.filter(f =>
      t.prunedFiles(Seq(f), Seq(col("id") < 1100L)).nonEmpty)
    assert(hot.size === 2, s"two files cover ids < 1100: $hot")

    val before = t.snapshot().count()
    val v = t.compactWhere(col("id") < 1100L)
    val now = t.files(v).toSet
    // the two cold files carried forward untouched; the hot two merged
    assert((all.toSet -- hot).subsetOf(now))
    assert(now.size === 3)
    assert(t.snapshot().count() === before)
    assert(t.operationAt(v) === "compact-where")
    // content-preserving: the change feed crosses it
    assert(t.changes(-1L, v).count() === before)
    // fewer than two matching files -> no-op
    assert(t.compactWhere(col("id") < 0L) === v)
  }

  test("SQL: OPTIMIZE t WHERE pred") {
    val t = fresh()
    import spark.implicits._
    (0 until 3).foreach { b =>
      t.append((0 until 20).map(i => (b * 100L + i, i.toDouble))
        .toDF("id", "x").coalesce(1))
    }
    val r = spark.sql(s"OPTIMIZE '${t.path}' WHERE id < 150").head
    assert(r.getInt(1) === 2, "two files cover ids < 150")
    assert(t.operationAt(r.getLong(0)) === "compact-where")
    assert(t.snapshot().count() === 60L)
  }

  test("clusterZIncremental rewrites only post-baseline files") {
    val t = fresh()
    import spark.implicits._
    def batch(lo: Int) = (lo until lo + 500)
      .map(i => (i.toLong % 40, (i.toLong * 7) % 40, i.toLong))
      .toDF("x", "y", "id")
    (0 until 4).foreach(i => t.append(batch(i * 500).coalesce(1)))
    t.clusterZ(4, 4, "x", "y")
    val clustered = t.files(t.latestVersion.get).toSet
    // new arrivals after the clustering
    (0 until 4).foreach(i => t.append(batch(2000 + i * 500).coalesce(1)))
    val v = t.clusterZIncremental(2, 4, "x", "y")
    assert(t.operationAt(v) === "zorder-inc[x,y]")
    val now = t.files(v).toSet
    assert(clustered.subsetOf(now), "baseline clustered files must be untouched")
    assert((now -- clustered).size === 2, "4 fresh files z-order into 2")
    assert(t.snapshot().count() === 4000)
    // a two-column box prunes in BOTH regions (per-file bounds)
    val kept = t.prunedFiles(t.files(v).toSeq,
      Seq(col("x") <= 5L, col("y") <= 5L))
    assert(kept.size < now.size, s"z-bounds should prune some files: $kept")
    assert(t.scan(col("x") <= 5L, col("y") <= 5L).count() ===
      t.snapshot().filter(col("x") <= 5L && col("y") <= 5L).count())
    // nothing new since -> no-op
    assert(t.clusterZIncremental(2, 4, "x", "y") === v)
  }

  test("OPTIMIZE conf knobs route to bin-packing and incremental clustering") {
    val t = fresh()
    import spark.implicits._
    (0 until 3).foreach(i => t.append(
      Seq((i.toLong, i.toLong * 3, i.toLong)).toDF("x", "y", "id").coalesce(1)))
    try {
      spark.conf.set("graft.optimize.minFileBytes", (1L << 20).toString)
      val r = spark.sql(s"OPTIMIZE '${t.path}'").head
      assert(r.getString(1).startsWith("compact-small["), r.toString)
      assert(t.snapshot().count() === 3)
      spark.conf.set("graft.optimize.zorderIncremental", "true")
      t.append(Seq((9L, 9L, 9L)).toDF("x", "y", "id").coalesce(1))
      t.clusterZ(2, 4, "x", "y") // baseline
      t.append(Seq((8L, 8L, 8L)).toDF("x", "y", "id").coalesce(1))
      val r2 = spark.sql(s"OPTIMIZE '${t.path}' ZORDER BY (x, y)").head
      assert(r2.getString(1) === "zorder-inc[x,y]", r2.toString)
      assert(t.snapshot().count() === 5)
    } finally {
      spark.conf.unset("graft.optimize.minFileBytes")
      spark.conf.unset("graft.optimize.zorderIncremental")
    }
  }

  test("setWriteOrder: appended files are born with prunable bounds") {
    val t = fresh()
    import spark.implicits._
    def batch(seed: Int) = {
      val rng = new scala.util.Random(seed)
      (0 until 800).map(_ => (rng.nextInt(1000).toLong, seed.toLong))
        .toDF("k", "b")
    }
    // without write order: one shuffled append -> every file spans the
    // whole key range, a selective scan reads everything
    t.append(batch(1).repartition(4))
    val all0 = t.files(t.latestVersion.get)
    assert(t.prunedFiles(all0, Seq(col("k") < 50L)).size === all0.size,
      "unordered ingest should not prune (else this proves nothing)")
    // with write order: the same shape prunes from birth. (AQE would
    // rightly coalesce this toy batch into ONE file — tell it to keep
    // tiny partitions so there are multiple files to prune between.)
    t.setWriteOrder("k")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try t.append(batch(2).repartition(4))
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val v = t.latestVersion.get
    val newFiles = t.files(v).filterNot(all0.toSet)
    assert(newFiles.size >= 2, s"range shuffle should keep >=2 files: $newFiles")
    val kept = t.prunedFiles(newFiles, Seq(col("k") < 50L))
    assert(kept.size < newFiles.size,
      s"ordered ingest must prune on the ingest key: kept $kept of $newFiles")
    // correctness unchanged, and the config survives later appends
    assert(t.scan(col("k") < 50L).count() ===
      t.snapshot().filter(col("k") < 50L).count())
    t.append(batch(3))
    assert(t.writeOrder === Seq("k"))
  }

  test("SET TBLPROPERTIES drives bloom and write-order configs; DESCRIBE DETAIL shows them") {
    val wh = Files.createTempDirectory("maint_wh_").toString
    spark.conf.set("spark.sql.catalog.mlake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mlake.warehouse", wh)
    val t = new IncrementalTable(spark, s"$wh/cfg")
    import spark.implicits._
    t.append(Seq((1L, "a")).toDF("id", "tag"))
    spark.sql("ALTER TABLE mlake.cfg SET TBLPROPERTIES " +
      "('graft.bloomColumns'='tag', 'graft.writeOrder'='id')")
    assert(t.bloomColumns === Seq("tag") && t.writeOrder === Seq("id"))
    val d = spark.sql(s"DESCRIBE DETAIL mlake.cfg").head
    val props = d.getString(d.length - 1)
    assert(props.contains("graft.bloomColumns=tag") &&
      props.contains("graft.writeOrder=id"), props)
    // SHOW TBLPROPERTIES round-trips what ALTER wrote
    val shown = spark.sql("SHOW TBLPROPERTIES mlake.cfg")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("graft.bloomColumns").contains("tag") &&
      shown.get("graft.writeOrder").contains("id"), shown.toString)
    spark.sql("ALTER TABLE mlake.cfg UNSET TBLPROPERTIES ('graft.writeOrder')")
    assert(t.writeOrder === Seq.empty && t.bloomColumns === Seq("tag"))
    // unknown properties are refused, not silently dropped
    assertThrows[Exception](spark.sql(
      "ALTER TABLE mlake.cfg SET TBLPROPERTIES ('graft.nope'='x')"))
  }

  test("CREATE TABLE TBLPROPERTIES applies graft configs at birth") {
    val wh = Files.createTempDirectory("maint_wh2_").toString
    spark.conf.set("spark.sql.catalog.clake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.clake.warehouse", wh)
    spark.sql("CREATE TABLE clake.born (id BIGINT, tag STRING) USING graft " +
      "TBLPROPERTIES ('graft.writeOrder'='id', 'graft.bloomColumns'='tag')")
    val t = new IncrementalTable(spark, s"$wh/born")
    assert(t.writeOrder === Seq("id") && t.bloomColumns === Seq("tag"))
    spark.sql("INSERT INTO clake.born VALUES (2, 'b'), (1, 'a')")
    assert(spark.sql("SELECT * FROM clake.born").count() === 2)
    assertThrows[Exception](spark.sql(
      "CREATE TABLE clake.born2 (id BIGINT) USING graft " +
        "TBLPROPERTIES ('graft.bogus'='x')"))
    // the rejection happened BEFORE anything was committed — no
    // half-created table left behind
    assert(!new java.io.File(s"$wh/born2").exists(),
      "a rejected property must not leave a half-created table")
    // standard engine-managed properties pass through
    spark.sql("CREATE TABLE clake.born3 (id BIGINT) USING graft COMMENT 'docs'")
    assert(spark.sql("SELECT * FROM clake.born3").count() === 0)
  }

  test("VACUUM DRY RUN lists doomed files without deleting") {
    val t = fresh()
    import spark.implicits._
    (0 until 3).foreach(i => t.append(Seq((i.toLong, "x")).toDF("id", "tag")
      .coalesce(1)))
    t.compact(targetFiles = 1) // v3 orphans the 3 originals (kept by v0-2)
    val doomed = spark.sql(s"VACUUM '${t.path}' KEEP 1 VERSIONS DRY RUN")
      .collect().map(_.getString(0)).toSeq
    assert(doomed.size === 3, s"3 pre-compact files should be doomed: $doomed")
    // nothing was deleted; the real vacuum removes exactly those
    assert(t.snapshotAt(2L).count() === 3)
    spark.sql(s"VACUUM '${t.path}' KEEP 1 VERSIONS")
    doomed.foreach(f => assert(
      !new java.io.File(t.path + "/data/" + f).exists(), s"$f not deleted"))
    assert(t.snapshot().count() === 3)
  }

  test("clusterZ on a STRING column: both dimensions prune after clustering") {
    val t = fresh()
    import spark.implicits._
    // interleaved appends of (category-string, numeric id): every file
    // spans both domains, so nothing prunes before clustering
    val cats = Seq("apple", "banana", "cherry", "mango", "papaya", "quince",
      "raisin", "tomato")
    (0 until 4).foreach { i =>
      t.append((0 until 200).map { j =>
        (cats((i + j) % cats.size), ((j * 4 + i) % 400).toLong, j.toLong)
      }.toDF("cat", "n", "id").coalesce(1))
    }
    val before = t.files(t.latestVersion.get)
    assert(t.prunedFiles(before, Seq(col("cat") === "mango")).size === 4)
    t.clusterZ(8, 3, "cat", "n")
    val after = t.files(t.latestVersion.get)
    // string dimension prunes…
    val byCat = t.prunedFiles(after, Seq(col("cat") === "mango"))
    assert(byCat.size < after.size, s"string z-dimension must prune: $byCat")
    // …the numeric one too, and conjunctions hit the intersection
    val byN = t.prunedFiles(after, Seq(col("n") < 50L))
    assert(byN.size < after.size, s"numeric z-dimension must prune: $byN")
    val both = t.prunedFiles(after, Seq(col("cat") === "mango", col("n") < 50L))
    assert(both.size <= math.min(byCat.size, byN.size))
    // correctness unchanged
    assert(t.scan(col("cat") === "mango", col("n") < 50L).count() ===
      t.snapshot().filter(col("cat") === "mango" && col("n") < 50L).count())
  }

  test("clusterZIncremental without a baseline falls back to a full cluster") {
    val t = fresh()
    import spark.implicits._
    (0 until 3).foreach(i => t.append(
      Seq((i.toLong, i.toLong * 3, i.toLong)).toDF("x", "y", "id").coalesce(1)))
    val v = t.clusterZIncremental(2, 4, "x", "y")
    assert(t.operationAt(v) === "zorder[x,y]")
    assert(t.snapshot().count() === 3)
  }
}
