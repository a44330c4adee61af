package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Exact deduplication by content hash.
  *
  * Scale shape: one hash-partitioned aggregation on the 64-hex-char
  * fingerprint — map-side partial `min`/`count` means the shuffle
  * carries one record per distinct hash per input partition, never the
  * documents themselves. At 100 TB this is the cheapest possible exact
  * dedup: no text leaves the scan stage.
  */
object ExactDedup {

  /** One row per distinct (normalized) content: the surviving (minimum)
    * id and the duplicate-group size.
    */
  def groups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** The deduplicated document set (first-id-wins survivors). */
  def dedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = groups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
