package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.scd.{ScdConfig, ScdTable}

class StreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked windowed aggregation over a micro-batched stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts_utc", "event_type", "value")
    val agg = Streams.windowedEventCounts(events, "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0),
        (ts("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:59:00"), "click", 4.0)) // late but in watermark
      q.processAllAvailable()
      val out = spark.table("win_counts")
        .orderBy("window_start", "event_type").collect()
      assert(out.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue())).toSeq === Seq(
        (ts("2024-01-01 10:00:00"), "click", 3L, 7.0),
        (ts("2024-01-01 11:00:00"), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("foreachBatch SCD sink versions a streamed dimension across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("scd_stream").toString
    val table = new ScdTable(spark, s"$dir/dim")
    table.create(StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)) ++
      ScdConfig.SystemCols.map(c => StructField(c,
        if (c == "record_status" || c.endsWith("_key")) StringType else TimestampType))))
    val cfg = ScdConfig(pkCols = Seq("k"), scdKeyCols = Seq("v"),
      selectCols = Some(Seq("k", "v")))
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v").writeStream
      .foreachBatch(Streams.scdSink(table, cfg, Instant.parse("2025-06-01T00:00:00Z")))
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(table.snapshot().count() === 2)
      input.addData((1L, "a2")) // SCD2 change for k=1
      q.processAllAvailable()
      val snap = table.snapshot()
      assert(snap.count() === 3)
      assert(snap.filter("record_status = 'A' and effective_to is null").count() === 2)
      val k1 = snap.filter("k = 1").orderBy("effective_from")
        .select("v", "record_status").collect().map(r => (r.getString(0), r.getString(1)))
      assert(k1.toSeq === Seq(("a", "I"), ("a2", "A")))
    } finally q.stop()
  }
}
