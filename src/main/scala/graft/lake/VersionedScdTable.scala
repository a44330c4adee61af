package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.scd.ScdTable

/** [[graft.scd.ScdTable]] on a [[VersionedTable]] backend: every SCD
  * apply commits a new table version, giving the reference's
  * Delta-style affordances — `history()` (scd_handler.py:54-55
  * displayed exactly this after each merge), time travel to any prior
  * dimension state (the CTAS day-snapshots of the reference notebook,
  * test_scd_handler.py:138-139, become `snapshotAt`), compaction and
  * vacuum — with no Delta connector.
  */
final class VersionedScdTable(
    spark: SparkSession,
    path: String,
    identityCol: Option[String] = None,
    identityStart: Long = 1L)
    extends ScdTable(spark, path, identityCol, identityStart) {

  val versions = new VersionedTable(spark, path)

  override def exists: Boolean = versions.exists

  override def create(schema: StructType): Unit =
    versions.write(emptyFrame(schema), operation = "create")

  override def snapshot(): DataFrame = versions.snapshot()

  override def overwrite(next: DataFrame): Unit =
    versions.write(next, operation = "merge")

  /** Time travel: the dimension exactly as of table version `v`. */
  def snapshotAt(v: Long): DataFrame = versions.snapshotAt(v)

  def history(): DataFrame = versions.history()

  def compact(targetFiles: Int = 1): Long = versions.compact(targetFiles)

  def vacuum(keepLast: Int = 1): Unit = versions.vacuum(keepLast)
}
