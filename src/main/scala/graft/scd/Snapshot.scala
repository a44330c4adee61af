package graft.scd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-version-per-key snapshot dedup (scd_handler.py:70-75).
  *
  * The reference coalesces `effective_to` to `current_timestamp()` so open
  * rows sort as "now", then keeps `row_number() == 1` per business key
  * ordered by `dw_inserted_at DESC, effective_to DESC`. This defends the
  * downstream joins against historical duplicates: the join build side
  * shrinks to exactly one row per key — an algorithmic pre-aggregation that
  * also keeps the shuffle for the window reusable by the subsequent
  * pk-join (same partitioning keys).
  */
object Snapshot {
  def latestPerKey(target: DataFrame, pkCols: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(pkCols.map(col): _*)
      .orderBy(col("dw_inserted_at").desc, col("effective_to").desc)
    target
      .withColumn("effective_to", coalesce(col("effective_to"), current_timestamp()))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
