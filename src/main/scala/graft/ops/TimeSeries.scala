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

  /** The dense per-key hourly frame both resamplers share:
    * `(keyCol, bucket, n_events, sum_value)` over `[min, max]` of each
    * key, gap buckets with `n_events = 0` and `sum_value = NULL`.
    */
  private def denseGrid(events: DataFrame, keyCol: String, tsCol: String,
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
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("sum_value"))
  }

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
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    denseGrid(events, keyCol, tsCol, valueCol)
      .withColumn("filled_value",
        last(col("sum_value"), ignoreNulls = true).over(w))
  }

  /** [[resampleLocf]] with LINEAR INTERPOLATION instead of carry-
    * forward: a gap bucket's `interp_value` is the straight line
    * between the previous and next observed values, positioned by
    * whole-hour offsets (exact integer `timestampdiff`s; only the
    * final lerp is floating point, and its expression tree is written
    * identically in the SQL oracle so IEEE round-to-nearest produces
    * the same bits on both engines). Observed buckets pass their own
    * value through. Two frames over ONE per-key window ordering — the
    * same single shuffle as the LOCF form.
    */
  def resampleInterpolate(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val base = Window.partitionBy(keyCol).orderBy("bucket")
    val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("sum_value").isNotNull, col("bucket"))
    denseGrid(events, keyCol, tsCol, valueCol)
      .withColumn("__pv", last(col("sum_value"), ignoreNulls = true).over(wPrev))
      .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("sum_value"), ignoreNulls = true).over(wNext))
      .withColumn("__nb", first(obsBucket, ignoreNulls = true).over(wNext))
      .withColumn("interp_value",
        when(col("sum_value").isNotNull, col("sum_value"))
          .when(col("__pv").isNull || col("__nv").isNull,
            coalesce(col("__pv"), col("__nv")))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (expr("timestampdiff(HOUR, __pb, bucket)").cast("double") /
              expr("timestampdiff(HOUR, __pb, __nb)").cast("double"))))
      .drop("__pv", "__pb", "__nv", "__nb")
  }
}
