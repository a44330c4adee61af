package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the single right row with the
  * greatest timestamp ≤ the left row's timestamp within the same key
  * (point-in-time lookup: feature values as they were when the event
  * happened; the query-side companion of the SCD2 dimension's validity
  * intervals).
  *
  * Spark has no native ASOF JOIN (DuckDB does — the oracle uses it);
  * the scalable formulation is the union + ordered-window trick, NOT a
  * join: tag right rows 0 and left rows 1, union, then per key take
  * `last(right payload, ignoreNulls)` over an unbounded-preceding
  * frame ordered by (ts, tag). Each partition is scanned once — the
  * per-left-row "all earlier right rows" product never materializes,
  * and the single shuffle is the key hash partition both inputs need
  * anyway. Right-before-left ordering at equal timestamps gives `>=`
  * (inclusive) semantics, matching DuckDB's default.
  *
  * At 100 TB: one shuffle of left ∪ right by key, linear window scan
  * per partition; skewed keys fall back to `ops.Salting` or AQE skew
  * handling like any other window.
  */
object AsOfJoin {

  /** Left rows enriched with `rightPayload` columns from the as-of
    * match (null when no right row precedes). `leftTs`/`rightTs` must
    * be the same comparable type (use integer µs for exactness).
    *
    * @param rightPayload right columns to carry; emitted with the given
    *                     output names
    */
  def asOf(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Map[String, String]): DataFrame = {
    val payload = struct(rightPayload.keys.toSeq.map(col): _*)
    val taggedRight = right.select(
      keyCols.map(col) ++ Seq(col(rightTs).as("__ts"),
        payload.as("__r"), lit(0).as("__tag")): _*)
    val leftCols = left.columns.toSeq
    val taggedLeft = left.select(
      keyCols.map(col) ++ Seq(col(leftTs).as("__ts"),
        lit(null).cast(taggedRight.schema("__r").dataType).as("__r"),
        lit(1).as("__tag"),
        struct(leftCols.map(col): _*).as("__l")): _*)
    val unioned = taggedRight.withColumn("__l",
      lit(null).cast(taggedLeft.schema("__l").dataType))
      .unionByName(taggedLeft)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    matched.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map { case (src, out) => col(s"__asof.$src").as(out) }: _*)
  }
}
