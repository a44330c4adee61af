package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the training-prep step that
  * turns a document shard into fixed-token-budget bins: documents are
  * laid out in id order within a shard (`groupCol`), each doc gets its
  * global token offset, and a doc belongs to the bin containing its
  * first token.
  *
  * Scale shape: one window per shard (`partitionBy(groupCol)` — shards
  * pack independently and in parallel; there is deliberately no global
  * order, which would serialize the cumsum through a single range
  * partition at 100 TB). The running sum is rows-unbounded-preceding —
  * Spark evaluates it streaming per partition, no buffering.
  */
object Packing {

  /** Adds `token_cnt`, `tok_start` (offset of the doc's first token in
    * its shard's concatenation) and `bin_id` (= tok_start div budget).
    */
  def packBins(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(groupCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("token_cnt"))
      .withColumn("tok_start", coalesce(sum(col("token_cnt")).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"tok_start div $budgetTokens"))
  }
}
