package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleLocf: gap buckets materialize with n_events=0, LOCF fills") {
    // key "a": hours 00, 03 observed -> 01, 02 are gaps
    // key "b": single hour -> no gaps
    val events = Seq(
      ("a", ts("2024-01-01 00:10:00"), 1.5),
      ("a", ts("2024-01-01 00:40:00"), 2.5),
      ("a", ts("2024-01-01 03:05:00"), 10.0),
      ("b", ts("2024-01-01 07:59:00"), 7.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.resampleLocf(events, "k", "t", "v")
      .orderBy("k", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out === Seq(
      ("a", "2024-01-01 00:00:00.0", 2L, Some(4.0), Some(4.0)),
      ("a", "2024-01-01 01:00:00.0", 0L, None, Some(4.0)), // gap: LOCF
      ("a", "2024-01-01 02:00:00.0", 0L, None, Some(4.0)), // gap: LOCF
      ("a", "2024-01-01 03:00:00.0", 1L, Some(10.0), Some(10.0)),
      ("b", "2024-01-01 07:00:00.0", 1L, Some(7.0), Some(7.0))))
  }

  test("resampleInterpolate: gaps lerp between neighbors, observations pass through") {
    // key "a": observed 4.0 at 00h and 10.0 at 03h -> gaps at 01h, 02h
    // lerp to 6.0 and 8.0
    val events = Seq(
      ("a", ts("2024-01-01 00:30:00"), 4.0),
      ("a", ts("2024-01-01 03:10:00"), 10.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.resampleInterpolate(events, "k", "t", "v")
      .orderBy("bucket")
      .collect()
      .map(r => (r.getTimestamp(1).toString, r.getLong(2),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out === Seq(
      ("2024-01-01 00:00:00.0", 1L, Some(4.0)),
      ("2024-01-01 01:00:00.0", 0L, Some(6.0)),
      ("2024-01-01 02:00:00.0", 0L, Some(8.0)),
      ("2024-01-01 03:00:00.0", 1L, Some(10.0))))
  }

  test("resampleLocf: grid join and LOCF window run on the aggregated frame") {
    val events = Seq(("a", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val plan = TimeSeries.resampleLocf(events, "k", "t", "v")
      .queryExecution.optimizedPlan.toString
    // the dense grid comes from explode(sequence(...)) over the span
    // aggregate, not a cross join or a driver loop
    assert(plan.contains("sequence"), plan)
    assert(!plan.contains("CrossJoin") && !plan.contains("cartesian"), plan)
  }
}
