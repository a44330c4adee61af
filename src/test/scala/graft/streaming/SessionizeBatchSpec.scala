package graft.streaming

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

  test("equal-to-gap does not split; ties within one µs ordered by id") {
    import spark.implicits._
    val events = Seq(
      (1L, 0L, 2L), (1L, 0L, 1L), (1L, 1000L, 3L)).toDF("user_id", "ts_us", "event_id")
    val got = Streams.sessionizeBatch(events, "user_id", "ts_us", "event_id", 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === Array((1L, 1L, 0L, 1000L, 3L)))
  }
}
