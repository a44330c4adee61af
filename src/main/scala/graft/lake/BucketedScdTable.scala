package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.scd.{MergeEmulator, ScdApply, ScdConfig, ScdTable}

/** The scale evolution of [[graft.scd.ScdTable]] (its Scaladoc names
  * this design): the table is hive-partitioned by
  * `__bucket = pmod(hash(pk...), numBuckets)`, and an incremental apply
  * rewrites ONLY the buckets containing updated business keys — the
  * plain table's O(table) rewrite becomes O(touched buckets), which is
  * what makes per-batch SCD maintenance viable at 100 TB (Delta's
  * matched-file rewrite, approximated at bucket granularity).
  *
  * Correctness: the bucket is a pure function of the business key, so
  * every target row an incoming batch can match lives in a touched
  * bucket; rows of touched buckets that match nothing flow through the
  * merge unchanged; untouched buckets are never read or written.
  *
  * The table schema is persisted at `_schema.json` (the metastore
  * stand-in) so an empty table still has a typed snapshot. The write
  * uses dynamic partition overwrite after materializing the next state
  * (reading and overwriting the same files in one lazy plan corrupts
  * them); at real scale the materialization target is a `_tmp` dir
  * swapped per bucket.
  */
final class BucketedScdTable(
    spark: SparkSession,
    path: String,
    val numBuckets: Int,
    identityCol: Option[String] = None,
    identityStart: Long = 1L)
    extends ScdTable(spark, path, identityCol, identityStart) {

  private val schemaFile = new Path(path, "_schema.json")
  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketOf(pkCols: Seq[String]): Column =
    pmod(hash(pkCols.map(col): _*), lit(numBuckets))

  override def exists: Boolean = fs.exists(schemaFile)

  override def create(schema: StructType): Unit = {
    fs.mkdirs(new Path(path))
    val out = fs.create(schemaFile, true)
    out.write(schema.json.getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  private def storedSchema: StructType = {
    val in = fs.open(schemaFile)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    DataType.fromJson(txt).asInstanceOf[StructType]
  }

  private def hasData: Boolean =
    fs.exists(new Path(path)) && fs.listStatus(new Path(path))
      .exists(_.getPath.getName.startsWith("__bucket="))

  /** Full snapshot (partition column stripped). */
  override def snapshot(): DataFrame =
    if (hasData) spark.read.parquet(path).drop("__bucket")
    else emptyFrame(storedSchema)

  /** Snapshot restricted to `buckets` — partition pruning keeps the
    * scan to those directories (PartitionFilters in the plan).
    */
  def snapshotOfBuckets(buckets: Seq[Int]): DataFrame =
    if (hasData)
      spark.read.parquet(path)
        .filter(col("__bucket").isin(buckets: _*)).drop("__bucket")
    else emptyFrame(storedSchema)

  override def applyScd(
      source: DataFrame, cfg: ScdConfig, trackMetrics: Boolean = false): Unit = {
    if (source.isEmpty) return
    val touched = source.select(bucketOf(cfg.pkCols).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val snap = snapshotOfBuckets(touched)
    val delta = ScdApply.split(snap, source, cfg)
    val close = MergeEmulator.merge(snap, delta.inactiveUpdates, cfg.pkCols)
    val upsert = MergeEmulator.merge(
      close.next, delta.activeUnion, cfg.pkCols, isActiveData = true)
    val next = withIdentity(upsert.next)
      .withColumn("__bucket", bucketOf(cfg.pkCols))
      // materialize BEFORE touching the directories we just read
      .localCheckpoint()
    next.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(path)
  }
}
