package graft.streaming

import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.scd.{ScdConfig, ScdTable}

/** Structured Streaming surface.
  *
  * The reference has no streaming at all (SURVEY.md §2.9) — this is the
  * idiomatic Spark extension: the SCD algorithm is a pure function of
  * (snapshot, micro-batch), so `foreachBatch(applyScd)` turns any
  * stream into an incrementally-maintained SCD2 dimension; windowed
  * aggregations ride on watermarks.
  */
object Streams {

  /** `writeStream.foreachBatch` sink maintaining an SCD table.
    *
    * The per-batch clock is `baseClock + batchId` seconds: strictly
    * monotonic across batches (the algorithm's precondition, see
    * ScdTable.applyScd) and deterministic under micro-batch replay —
    * a batch re-run after a failure re-stamps the SAME timestamps, so
    * the sink stays idempotent exactly like the reference's
    * duplicate-row no-op path.
    */
  def scdSink(table: ScdTable, cfg: ScdConfig, baseClock: Instant)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    table.applyScd(batch,
      cfg.copy(clock = () => baseClock.plusSeconds(batchId)))
  }

  /** Event-time windowed counts with late-data handling: the canonical
    * watermarked aggregation (tumbling window per event_type). Works
    * identically on a batch DataFrame (watermark is a no-op there) —
    * used by the oracle-checked batch query and the streaming spec.
    */
  def windowedEventCounts(
      events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts_utc"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
}
