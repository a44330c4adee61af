package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series RESAMPLING over an event stream: fixed time buckets per
  * key with GAP FILLING (empty buckets materialized) and LOCF
  * (last-observation-carried-forward) interpolation — the standard
  * prep step before feeding irregular event data to anything that
  * expects a dense regular series (forecasting, rate alerting,
  * windowed feature extraction).
  *
  * Execution shape for 100 TB of events:
  *  1. ONE partial-aggregated `groupBy(key, bucket)` pass reduces the
  *     raw events to (key, bucket) cardinality — everything after
  *     operates on the aggregate, orders of magnitude below the input;
  *  2. the per-key bucket span is a tiny second aggregate of THAT, and
  *     the dense grid explodes from the span rows (`sequence` +
  *     `explode`, codegen'd generators — span-hours rows per key, no
  *     driver loop, no cross join);
  *  3. the gap-filling join and the LOCF window both shuffle the
  *     AGGREGATED frame by key — per-key sorts are independent, so
  *     1000 executors fill 1000 keys' series in parallel.
  *
  * The value column aggregates through DECIMAL(18,2) before the final
  * double cast (the `windowed_event_counts` rule): decimal addition is
  * exact and order-independent, so the result is reproducible across
  * partitionings AND replayable bit-for-bit by the DuckDB oracle.
  */
object TimeSeries {

  /** Dense per-key hourly series over `[min bucket, max bucket]` of
    * each key: `(keyCol, bucket, n_events, sum_value, filled_value)`
    * where gap buckets carry `n_events = 0`, `sum_value = NULL`, and
    * `filled_value` is the last non-null `sum_value` at or before the
    * bucket (NULL until the key's first observation — leading gaps
    * cannot occur here because every key's span starts at an observed
    * bucket).
    */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val agg = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
    val grid = agg.groupBy(col(keyCol))
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
          .as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("sum_value"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("filled_value"))
  }
}
