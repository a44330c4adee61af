package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Shallow clone: zero-copy table creation via external file
  * references, then an independent life — local appends, localized DML
  * rewrites, self-containment after compact, vacuum that can never
  * touch the source's files.
  */
class CloneSpec extends AnyFunSuite with SparkSpec {

  private def pair(): (IncrementalTable, IncrementalTable) = {
    val base = Files.createTempDirectory("clone_").toString
    (new IncrementalTable(spark, s"$base/src"),
      new IncrementalTable(spark, s"$base/dst"))
  }
  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "tag").coalesce(1)
  }
  private def ids(t: IncrementalTable): Set[Long] =
    t.snapshot().select("id").collect().map(_.getLong(0)).toSet

  test("clone carries the column mapping: logical names, not physical") {
    val (src, dst) = pair()
    src.append(df((1L, "a"), (2L, "b")))
    src.renameColumn("tag", "label") // metadata-only: files keep "tag"
    dst.cloneFrom(src)
    // the clone must serve the LOGICAL name — without the carried
    // colmap it would silently show the physical one
    assert(dst.snapshot().columns.toSeq === Seq("id", "label"))
    assert(dst.snapshot().select("label").collect()
      .map(_.getString(0)).toSet === Set("a", "b"))
    assert(dst.readerFeaturesAt(0L) === Set("column-mapping"))
  }

  test("clone reads the source state without copying a byte; lives independently") {
    val (src, dst) = pair()
    src.append(df((1L, "a"), (2L, "b")))
    src.append(df((3L, "c")))
    dst.cloneFrom(src)
    assert(ids(dst) === Set(1L, 2L, 3L))
    // zero data files of its own
    assert(Option(new java.io.File(dst.path, "data").listFiles())
      .forall(_.forall(!_.getName.endsWith(".parquet"))))
    // schema carried
    assert(dst.tableSchema.map(_.fieldNames.toSeq) === Some(Seq("id", "tag")))

    // divergence: appends to either side are invisible to the other
    dst.append(df((10L, "x")))
    src.append(df((99L, "z")))
    assert(ids(dst) === Set(1L, 2L, 3L, 10L))
    assert(ids(src) === Set(1L, 2L, 3L, 99L))
  }

  test("clone of an older version; DML on the clone localizes; compact self-contains") {
    val (src, dst) = pair()
    src.append(df((1L, "a"), (2L, "b")))   // v0
    src.append(df((3L, "c")))              // v1
    dst.cloneFrom(src, Some(0L))
    assert(ids(dst) === Set(1L, 2L))

    // CoW delete on the clone rewrites the touched file LOCALLY
    dst.deleteWhere(col("id") === 1L)
    assert(ids(dst) === Set(2L))
    assert(ids(src) === Set(1L, 2L, 3L)) // source untouched
    // the rewritten file is local (no ext: prefix), survivors correct
    val entries = dst.files(dst.latestVersion.get)
    assert(entries.exists(!_.startsWith("ext:")))

    // compact makes the clone fully self-contained
    dst.compact(1)
    assert(dst.files(dst.latestVersion.get).forall(!_.startsWith("ext:")))
    assert(ids(dst) === Set(2L))
    // and vacuum on the self-contained clone leaves the source intact
    dst.vacuum(keepLast = 1)
    assert(ids(src) === Set(1L, 2L, 3L))
  }

  test("clone carries deletion vectors and constraints") {
    val (src, dst) = pair()
    src.append(df((1L, "a"), (2L, "b"), (3L, "c")))
    src.addConstraint("id_pos", "id > 0")
    src.deleteVector(col("id") === 2L)
    dst.cloneFrom(src)
    assert(ids(dst) === Set(1L, 3L)) // vectors applied through the clone
    assert(dst.constraints === Map("id_pos" -> "id > 0"))
    assertThrows[IllegalStateException](dst.append(df((-5L, "bad"))))
  }

  test("DESCRIBE DETAIL works on a clone; bucketed sources are rejected") {
    val wh = Files.createTempDirectory("clone_det_").toString
    spark.conf.set("spark.sql.catalog.cld", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cld.warehouse", wh)
    val src = new IncrementalTable(spark, s"$wh/src")
    src.append(df((1L, "a")))
    spark.sql("CREATE TABLE cld.dst SHALLOW CLONE cld.src")
    val d = spark.sql("DESCRIBE DETAIL cld.dst").head
    assert(d.getInt(3) >= 1 && d.getLong(4) > 0L) // ext files counted

    // bucketed SCD source: rejected with a compact-first hint
    import org.apache.spark.sql.types._
    val scdSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)) ++
      graft.scd.ScdConfig.SystemCols.map(c => StructField(c,
        if (c == "record_status" || c.endsWith("_key")) StringType else TimestampType)))
    val scd = new IncrementalScdTable(spark, s"$wh/scd", numBuckets = 4)
    scd.create(scdSchema)
    import spark.implicits._
    scd.applyScd(Seq((1L, "x")).toDF("k", "v"),
      graft.scd.ScdConfig(pkCols = Seq("k"), scdKeyCols = Seq("v"),
        selectCols = Some(Seq("k", "v"))))
    val err = intercept[Exception](
      new IncrementalTable(spark, s"$wh/scdclone").cloneFrom(scd.table))
    assert(err.getMessage.contains("bucketed"))
  }

  test("SQL: CREATE TABLE dst SHALLOW CLONE src VERSION AS OF n") {
    val wh = Files.createTempDirectory("clone_wh_").toString
    spark.conf.set("spark.sql.catalog.cl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cl.warehouse", wh)
    val src = new IncrementalTable(spark, s"$wh/src")
    src.append(df((1L, "a")))
    src.append(df((2L, "b")))
    val row = spark.sql("CREATE TABLE cl.dst SHALLOW CLONE cl.src VERSION AS OF 0").head
    assert(row.getLong(0) === 0L)
    assert(spark.sql("SELECT id FROM cl.dst").collect().map(_.getLong(0)).toSeq === Seq(1L))
    // the clone is a first-class catalog table: INSERT works
    spark.sql("INSERT INTO cl.dst VALUES (7, 'g')")
    assert(spark.sql("SELECT count(*) FROM cl.dst").head.getLong(0) === 2L)
    // cloning onto an existing table fails loudly
    assertThrows[Exception](
      spark.sql("CREATE TABLE cl.dst SHALLOW CLONE cl.src"))
  }
}
