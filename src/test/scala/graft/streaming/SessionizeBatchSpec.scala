package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SessionizeBatchSpec extends AnyFunSuite with SparkSpec {

  test("gap splits sessions; bounds and counts are exact") {
    import spark.implicits._
    val gap = 1000L // µs
    val events = Seq(
      // user 1: [0, 500, 1400] one session (gaps 500, 900), then 3000
      (1L, 0L, 1L), (1L, 500L, 2L), (1L, 1400L, 3L), (1L, 3000L, 4L),
      // user 2: single event
      (2L, 42L, 5L)).toDF("user_id", "ts_us", "event_id")
    val got = Streams.sessionizeBatch(events, "user_id", "ts_us", "event_id", gap)
      .orderBy("user_id", "session_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === Array(
      (1L, 1L, 0L, 1400L, 3L),
      (1L, 2L, 3000L, 3000L, 1L),
      (2L, 1L, 42L, 42L, 1L)))
  }

  test("batch sessions agree with streaming-closed sessions (same gap)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val evs = Seq(
      SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 10:00:30"), 2.0), // same session
      SessionEvent(1L, ts("2024-01-01 10:05:00"), 3.0), // gap > 1min → new
      SessionEvent(2L, ts("2024-01-01 10:00:10"), 5.0))
    // streaming: emit closed sessions, watermark advanced far past all
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val q = Streams.sessionize(input.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sess_eq").outputMode("append").start()
    val streamed = try {
      input.addData(evs: _*); q.processAllAvailable()
      input.addData(SessionEvent(99L, ts("2024-01-01 11:00:00"), 0.0))
      q.processAllAvailable()
      spark.table("sess_eq")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
    } finally q.stop()
    // batch twin on the same data (µs units), dropping user 99's open tail
    val batch = Streams.sessionizeBatch(
      evs.toDF().withColumn("ts_us", expr("unix_micros(ts_utc)"))
        .withColumn("event_id", monotonically_increasing_id()),
      "user_id", "ts_us", "event_id", 60000000L)
      .select(col("user_id"),
        expr("timestamp_micros(session_start_us)").as("s"),
        expr("timestamp_micros(session_end_us)").as("e"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(streamed === batch,
      s"streamed $streamed != batch $batch")
  }

  test("equal-to-gap does not split; ties within one µs ordered by id") {
    import spark.implicits._
    val events = Seq(
      (1L, 0L, 2L), (1L, 0L, 1L), (1L, 1000L, 3L)).toDF("user_id", "ts_us", "event_id")
    val got = Streams.sessionizeBatch(events, "user_id", "ts_us", "event_id", 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === Array((1L, 1L, 0L, 1000L, 3L)))
  }
}
