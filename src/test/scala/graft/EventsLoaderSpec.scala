package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Drift-proofing for the `events.ts` physical-type contract
  * (Tables.scala): the driver has regenerated `events.parquet` with a
  * different INT64 timestamp annotation between rounds (NANOS → MICROS),
  * and every downstream consumer reads `ts` as LONG epoch-nanos. This
  * spec writes the same rows in each physical flavor Spark can produce
  * and asserts [[Tables.load]] surfaces identical long-nanos values for
  * all of them — so the next drift fails here, named, in seconds.
  */
class EventsLoaderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // micros-representable instants (the lossy sub-µs case is impossible
  // for MICROS/MILLIS-born files; MILLIS fixtures use ms-aligned values)
  private val microsMs = Seq(0L, 1704067200000L, 1704067200123L, -86400000L)
  private val wantNanosMs = microsMs.map(_ * 1000000L)
  private val microsUs = microsMs.map(_ * 1000L) :+ 1704067200123456L
  private val wantNanosUs = microsUs.map(_ * 1000L)

  private def writeAndLoad(rows: Seq[Row], schema: StructType,
                           outputType: Option[String]): Seq[Long] = {
    val dir = Files.createTempDirectory("events-flavor").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "events.parquet").getAbsolutePath
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val orig = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    try {
      outputType.foreach(t => spark.conf.set("spark.sql.parquet.outputTimestampType", t))
      df.write.mode("overwrite").parquet(path)
    } finally {
      orig.foreach(spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    }
    val loaded = Tables.load(spark, dir.getAbsolutePath, "events")
    assert(loaded.schema("ts").dataType == LongType,
      s"ts must normalize to LongType, got ${loaded.schema("ts").dataType}")
    loaded.select("ts").orderBy("event_id").collect().map(_.getLong(0)).toSeq
  }

  private def tsRows[T](values: Seq[T]): Seq[Row] =
    values.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }

  test("LONG ts (the NANOS-as-long flavor) passes through unchanged") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType)))
    // sub-µs nanos survive only on this path — assert they are not touched
    val nanos = wantNanosUs :+ (1704067200123456L * 1000L + 789L)
    assert(writeAndLoad(tsRows(nanos), schema, None) == nanos)
  }

  test("TIMESTAMP_MICROS instant ts normalizes to exact long nanos") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    val rows = tsRows(microsUs.map(us => java.time.Instant.EPOCH.plusNanos(us * 1000L))
      .map(java.sql.Timestamp.from))
    assert(writeAndLoad(rows, schema, Some("TIMESTAMP_MICROS")) == wantNanosUs)
  }

  test("TIMESTAMP_MILLIS instant ts normalizes to exact long nanos") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    val rows = tsRows(microsMs.map(new java.sql.Timestamp(_)))
    assert(writeAndLoad(rows, schema, Some("TIMESTAMP_MILLIS")) == wantNanosMs)
  }

  test("TIMESTAMP_NTZ ts (round-6+ driver files) normalizes to exact long nanos") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
    val rows = tsRows(microsUs.map(us =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)))
    assert(writeAndLoad(rows, schema, None) == wantNanosUs)
  }

  test("NTZ normalization is session-timezone independent") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
    val rows = tsRows(Seq(java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)))
    val origTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      assert(writeAndLoad(rows, schema, None) == Seq(1704067200000000000L))
    } finally spark.conf.set("spark.sql.session.timeZone", origTz)
  }

  test("real driver testdata loads as long nanos with plausible values") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == LongType)
    assert(ev.schema("ts_utc").dataType == TimestampType)
    val Row(lo: Long, hi: Long, n: Long) =
      ev.agg(min("ts"), max("ts"), count(lit(1))).head()
    assert(n > 0)
    // epoch-nanos for any plausible event era (2000..2100)
    assert(lo > 946684800L * 1000000000L && hi < 4102444800L * 1000000000L,
      s"ts range [$lo, $hi] does not look like epoch-nanos")
  }
}
