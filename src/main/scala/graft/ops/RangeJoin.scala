package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded time-range join: `point ∈ [lo, hi)` without a cross product.
  *
  * A pure range predicate gives Catalyst no equi-key, so the built-in
  * plan is BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a
  * broadcast of a whole side; at 100 TB that plan is not runnable. The
  * standard fix (used by every warehouse's "interval join"): quantize
  * time into fixed-width bands, explode each interval to the bands it
  * covers (bounded by `interval_len / band + 1` rows), tag each point
  * with its single band, equi-join on the band, then re-check the exact
  * predicate as a residual filter.
  *
  * Shape: one hash-partitioned equi-join on `__band`; fanout is bounded
  * and chosen by `bandNanos` (≈ the typical interval length — e.g.
  * 5-minute intervals with 1-minute bands duplicate each interval ≤ 6×).
  * Each point lands in exactly ONE band, so no dedup of output is
  * needed. Band skew (hot time windows) is ordinary equi-join skew —
  * AQE's skew-join split applies; no bespoke handling required.
  *
  * Timestamps are int64 (epoch nanos here, but any monotone long
  * works); `[lo, hi)` half-open.
  */
object RangeJoin {

  /** All (point, interval) rows with `lo <= pointTs < hi`. Column sets
    * of the two inputs must be disjoint (alias upstream); `__band` is
    * internal and dropped.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointTs: String, lo: String, hi: String, bandNanos: Long): DataFrame = {
    require(bandNanos > 0, "bandNanos must be positive")
    val p = points.withColumn("__band", expr(s"$pointTs div $bandNanos"))
    val iv = intervals
      .filter(col(lo) < col(hi))
      .withColumn("__band",
        explode(sequence(expr(s"$lo div $bandNanos"),
          expr(s"($hi - 1) div $bandNanos"))))
    p.join(iv, p("__band") === iv("__band") &&
        col(pointTs) >= col(lo) && col(pointTs) < col(hi))
      .drop("__band")
  }
}
