package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata (TESTDATA.md): one parquet per table
  * under `/root/testdata/sf*`.
  *
  * ==The `events.ts` contract==
  * Every consumer in this repo (sessionization, as-of join, range join,
  * windowed counts, approx stats, streaming) reads `events.ts` as LONG
  * epoch-nanoseconds. The driver has regenerated the parquet with
  * different physical types across rounds — INT64 TIMESTAMP(NANOS)
  * through round 5, INT64 TIMESTAMP(MICROS) from round 6 — so [[load]]
  * normalizes `ts` to long nanos whatever the footer says:
  *
  *   - LONG (NANOS-annotated columns surface as LONG under
  *     `spark.sql.legacy.parquet.nanosAsLong=true`, set defensively
  *     below): passed through unchanged.
  *   - TIMESTAMP (instant micros, `isAdjustedToUTC=true`):
  *     `unix_micros(ts) * 1000` — instant-based, session-timezone-free.
  *   - TIMESTAMP_NTZ (wall-clock micros, `isAdjustedToUTC=false`, what
  *     Spark 4 infers for the round-6+ files): micros measured from the
  *     NTZ epoch via `timestampdiff`, NOT a cast through TimestampType —
  *     a cast would shift by the session timezone, and the driver's
  *     session config is not ours to pin. DuckDB's `epoch_us(ts)` on the
  *     same file yields the identical value, so oracle hash-matching is
  *     preserved exactly (micros-derived nanos are exact).
  *
  * Truncation note: oracle comparisons happen at microsecond precision
  * (`ts div 1000`) because DuckDB floors ns→µs on NANOS files; for
  * micros-born files the division is lossless.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** `ts` → long epoch-nanos, whatever physical type the parquet used.
    * Throws (analysis-time, named) on an unrecognized type rather than
    * letting every downstream query fail with DATATYPE_MISMATCH.
    */
  private def tsAsLongNanos(df: DataFrame): Column =
    df.schema("ts").dataType match {
      case LongType         => col("ts")
      case TimestampType    => unix_micros(col("ts")) * lit(1000L)
      case TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * lit(1000L)
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other; expected LONG nanos, TIMESTAMP, or TIMESTAMP_NTZ")
    }

  /** Resolved-table memo — the metastore pattern: constructing a
    * parquet DataFrame re-runs file listing + footer schema inference
    * EVERY call (measured 77 ms warm for the sf0.1 lineitem), and the
    * query registry re-loads its tables on every invocation, so the
    * resolution cost was a per-query floor multiplied across the whole
    * surface. The resolved frame is an immutable lazy plan — reusing
    * it changes nothing about execution — and the key folds the
    * parquet file's (length, lastModified), so a regenerated dataset
    * at the same path re-resolves instead of serving a stale plan
    * (the lake-cache / bpeMemo identity contract). Entries are plan
    * objects only (nothing persisted); dead sessions are swept on
    * access.
    */
  private val resolved = scala.collection.concurrent.TrieMap
    .empty[(String, String, String, String), (SparkSession, DataFrame)]

  private def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark)
      .getOrElse("idhash-" + System.identityHashCode(spark))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // NANOS-annotated files (pre-round-6 testdata) need
    // `spark.sql.legacy.parquet.nanosAsLong=true` or Spark 4 rejects the
    // column outright. The conf is the SESSION BUILDER's job (Verify,
    // Bench, SparkSpec and the events-reading examples all set it) — a
    // loader that silently flips a session-wide legacy flag is spooky
    // action at a distance. Assert loudly instead, so a new entry point
    // fails here with the fix named rather than downstream with
    // Spark's generic unsupported-type error.
    if (name == "events")
      require(
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
        "events.parquet may carry INT64 TIMESTAMP(NANOS); set " +
          "spark.sql.legacy.parquet.nanosAsLong=true in the SparkSession " +
          "builder (see graft.Verify/Bench) before loading events")
    resolved.foreach { case (k, (s, _)) =>
      if (s.sparkContext.isStopped) resolved.remove(k)
    }
    val src = new java.io.File(s"$sfDir/$name.parquet")
    val key = (sessionKey(spark), sfDir, name,
      s"${src.length}:${src.lastModified}")
    resolved.getOrElseUpdate(key, {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      (spark,
        if (name == "events" && df.schema.fieldNames.contains("ts"))
          df.withColumn("ts", tsAsLongNanos(df))
        else df)
    })._2
  }

  /** `events` with `ts` normalized to LONG nanos plus a derived `ts_utc`
    * timestamp column (microsecond precision). Integer `div`, not `/`:
    * epoch-nanos (~1.7e18) overflows double's 53-bit mantissa, so a
    * float division here would silently corrupt timestamps.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
}
