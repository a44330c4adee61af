package graft.lake

import java.nio.file.Files
import java.time.Instant

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.scd.{ScdConfig, ScdTable}

class BucketedScdTableSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)) ++
    ScdConfig.SystemCols.map(c => StructField(c,
      if (c == "record_status" || c.endsWith("_key")) StringType else TimestampType)))

  private val cfg = ScdConfig(pkCols = Seq("k"), scdKeyCols = Seq("v"),
    selectCols = Some(Seq("k", "v")))

  private def batch(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }
  private def at(day: Int) =
    cfg.copy(clock = () => Instant.parse(f"2025-08-$day%02dT00:00:00Z"))

  test("bucketed apply produces exactly the plain table's state") {
    val dir = Files.createTempDirectory("bscd").toString
    val plain = new ScdTable(spark, s"$dir/plain")
    val bucketed = new BucketedScdTable(spark, s"$dir/bucketed", numBuckets = 8)
    plain.create(schema); bucketed.create(schema)

    val batches = Seq(
      batch((1L, "a"), (2L, "b"), (3L, "c"), (17L, "q")),
      batch((1L, "a2"), (3L, "c"), (99L, "z")),
      batch((2L, "b9"), (99L, "z2"), (1L, "a2")))
    batches.zipWithIndex.foreach { case (b, i) =>
      plain.applyScd(b, at(i + 1)); bucketed.applyScd(b, at(i + 1))
    }
    val cols = schema.fieldNames.map(org.apache.spark.sql.functions.col)
    val p = plain.snapshot().select(cols: _*).orderBy("k", "effective_from").collect()
    val q = bucketed.snapshot().select(cols: _*).orderBy("k", "effective_from").collect()
    assert(q.toSeq === p.toSeq)
    assert(p.nonEmpty)
  }

  test("untouched buckets are not rewritten") {
    val dir = Files.createTempDirectory("bscd2").toString
    val t = new BucketedScdTable(spark, s"$dir/t", numBuckets = 16)
    t.create(schema)
    // spread keys across many buckets
    t.applyScd(batch((1L to 40L).map(k => (k, s"v$k")): _*), at(1))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileSet: Map[String, Long] =
      fs.listStatus(new Path(s"$dir/t")).filter(_.getPath.getName.startsWith("__bucket="))
        .flatMap(d => fs.listStatus(d.getPath))
        .map(f => f.getPath.toString -> f.getModificationTime).toMap
    val before = fileSet
    // touch exactly one key → one bucket
    t.applyScd(batch((1L, "CHANGED")), at(2))
    val after = fileSet
    val changed = after.keySet.diff(before.keySet) ++
      before.keySet.diff(after.keySet) ++
      after.keySet.intersect(before.keySet).filter(k => after(k) != before(k))
    val buckets = changed.map(_.split("__bucket=")(1).split("/")(0)).toSet
    assert(buckets.size === 1, s"expected 1 rewritten bucket, got $buckets")
    // and the data is correct
    assert(t.snapshot().filter("k = 1 and record_status = 'A'").head()
      .getAs[String]("v") === "CHANGED")
    assert(t.snapshot().filter("k = 1").count() === 2)
    assert(t.snapshot().count() === 41)
  }

  test("partition pruning reaches the scan for touched-bucket reads") {
    val dir = Files.createTempDirectory("bscd3").toString
    val t = new BucketedScdTable(spark, s"$dir/t", numBuckets = 16)
    t.create(schema)
    t.applyScd(batch((1L to 40L).map(k => (k, s"v$k")): _*), at(1))
    val plan = t.snapshotOfBuckets(Seq(3)).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      s"no partition pruning in:\n$plan")
  }
}
