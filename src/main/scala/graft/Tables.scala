package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (TESTDATA.md): one parquet per table
  * under `/root/testdata/sf*`.
  *
  * `events.ts` is written as INT64 TIMESTAMP(NANOS), which Spark 4 cannot
  * map to its microsecond TimestampType and rejects outright unless
  * `spark.sql.legacy.parquet.nanosAsLong=true` (then it surfaces as LONG
  * nanos). [[load]] sets that conf defensively (it is runtime-settable),
  * and [[events]] derives `ts_utc` = microsecond-truncated TimestampType
  * for callers that want a real timestamp. Oracle SQL on the DuckDB side
  * sees the raw ns value via `epoch_ns(ts)`, so queries that must
  * hash-match compare the LONG, not a timestamp.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` kept as LONG nanos plus a derived `ts_utc`
    * timestamp column (microsecond precision). Integer `div`, not `/`:
    * epoch-nanos (~1.7e18) overflows double's 53-bit mantissa, so a
    * float division here would silently corrupt timestamps.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
}
