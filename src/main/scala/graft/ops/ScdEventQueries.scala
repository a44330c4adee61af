package graft.ops

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.scd.{ScdApply, ScdConfig}

/** The flagship driver-contract query: the reference's composite
  * `apply_scd` operator (SURVEY.md §2.11) run as a pure two-batch
  * pipeline over the `events` testdata, fully reproducible by a DuckDB
  * CTE oracle because the clock is pinned per batch.
  *
  * Dimension derivation (FIXTURES.md §2): key = (user_id, event_type),
  * SCD2-tracked column = `value_cents` (value pinned to integer cents —
  * raw doubles don't stringify identically across engines inside the
  * hash), SCD1 column = `props`, event time = `ts`.
  */
object ScdEventQueries {

  private val Clock1 = "2025-06-01T00:00:00Z"
  private val Clock2 = "2025-06-02T00:00:00Z"

  private val targetSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value_cents", LongType),
    StructField("props", StringType),
    StructField("record_status", StringType),
    StructField("effective_from", TimestampType),
    StructField("effective_to", TimestampType),
    StructField("dw_inserted_at", TimestampType),
    StructField("dw_updated_at", TimestampType),
    StructField("scd_key", StringType),
    StructField("upd_key", StringType)))

  private def cfg(runAt: String) = ScdConfig(
    pkCols = Seq("user_id", "event_type"),
    scdKeyCols = Seq("value_cents"),
    selectCols = Some(Seq("user_id", "event_type", "value_cents", "props")),
    effectiveFromCol = Some("ts_utc"),
    clock = () => Instant.parse(runAt))

  /** Latest event per key per day, for the given days — ONE events scan
    * and one window shuffle produce every batch (ties broken by
    * event_id, so each batch is deterministic and single-row-per-key —
    * multi-row sources are UB in the reference, SURVEY.md §2.11).
    */
  def dimSources(spark: SparkSession, dir: String, days: Seq[String]): DataFrame = {
    // µs-truncated ordering — the DuckDB oracle can't see sub-µs (see
    // RelationalQueries.windowLatestPerKey)
    val w = Window.partitionBy("user_id", "event_type", "day")
      .orderBy(expr("ts div 1000").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("value_cents", expr("cast(round(value * 100) as bigint)"))
      .withColumn("day", to_date(col("ts_utc")))
      .filter(col("day").isin(days.map(lit(_).cast("date")): _*))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "value_cents", "props", "ts_utc", "day")
  }

  /** One source batch (compat wrapper over [[dimSources]]). */
  def dimSource(spark: SparkSession, dir: String, day: String): DataFrame =
    dimSources(spark, dir, Seq(day)).drop("day")

  /** Materialized intermediates, memoized per (session, dir): the
    * day-1/day-2 batches (ONE events scan + window for both) and the
    * day-1 state. The SCD plan references each from the snapshot
    * window, both split joins and both merges — left lazy, Spark would
    * re-execute the upstream DAG at every reference; and both SCD
    * queries (apply + point-in-time) share the same intermediates, the
    * way ScdTable persists state and batches arrive materialized in
    * real use. The day-2 merge plans themselves are NOT memoized —
    * each query invocation re-executes them.
    */
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame, DataFrame)]

  private def day1StateAndBatches(
      spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    memo.getOrElseUpdate((spark, dir), {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], targetSchema)
      // ONE events scan + window covers all three days both SCD queries
      // need (day-3 is the point-in-time probe batch)
      val batches = dimSources(spark, dir,
        Seq("2024-01-01", "2024-01-02", "2024-01-03")).localCheckpoint()
      def day(d: String) =
        batches.filter(col("day") === lit(d).cast("date")).drop("day")
      val b2 = day("2024-01-02").localCheckpoint()
      val b3 = day("2024-01-03").localCheckpoint()
      val s1 = ScdApply.nextState(empty, day("2024-01-01"), cfg(Clock1)).localCheckpoint()
      (s1, b2, b3)
    })

  /** Day-1 initial load then day-2 incremental — exercises the full
    * §2.11 pipeline: snapshot dedup, stamping, both joins, both hash
    * keys, unionByName and both emulated merges, twice.
    */
  def scdApplyDay2(spark: SparkSession, dir: String): DataFrame = {
    val (s1, b2, _) = day1StateAndBatches(spark, dir)
    val s2 = ScdApply.nextState(s1, b2, cfg(Clock2))
    s2.orderBy("user_id", "event_type", "effective_from", "record_status")
  }

  /** The same two-batch apply, written as portable ANSI SQL (CTEs +
    * window functions) for the DuckDB oracle. Structure mirrors
    * SURVEY.md §7.3's unified next-state algebra: closed ∪ new-version ∪
    * scd1-updated ∪ unchanged ∪ brand-new.
    */
  val oracle: Map[String, String] = {
    val c1 = "TIMESTAMP '2025-06-01 00:00:00'"
    val c2 = "TIMESTAMP '2025-06-02 00:00:00'"
    val scdPitSql = {
      val scdSql = "%SCD%" // placeholder substituted below
      s"""WITH dim AS (SELECT * FROM ($scdSql)),
         |ev AS (
         |  SELECT user_id, event_type,
         |         CAST(round(value * 100) AS BIGINT) AS value_cents,
         |         make_timestamp(epoch_ns(ts) // 1000) AS ts_utc,
         |         CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
         |         ts, event_id
         |  FROM events),
         |src3 AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type, day
         |                                 ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM ev) WHERE rn = 1 AND day = DATE '2024-01-03'),
         |e3 AS (SELECT user_id, event_type, epoch_us(ts_utc) AS t_us FROM src3),
         |d AS (SELECT user_id, event_type, value_cents, record_status,
         |             epoch_us(effective_from) AS ef_us,
         |             epoch_us(effective_to) AS et_us FROM dim)
         |SELECT e3.user_id, e3.event_type, e3.t_us,
         |       coalesce(d.value_cents, -1) AS value_at_t,
         |       coalesce(d.record_status, 'none') AS status_at_t
         |FROM e3 LEFT JOIN d
         |  ON e3.user_id = d.user_id AND e3.event_type = d.event_type
         |WHERE d.ef_us IS NULL
         |   OR (e3.t_us >= d.ef_us AND (d.et_us IS NULL OR e3.t_us < d.et_us))
         |ORDER BY e3.user_id, e3.event_type, e3.t_us""".stripMargin
    }
    val scdSql =
      s"""WITH ev AS (
         |  SELECT user_id, event_type,
         |         CAST(round(value * 100) AS BIGINT) AS value_cents, props,
         |         make_timestamp(epoch_ns(ts) // 1000) AS ts_utc,
         |         CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
         |         ts, event_id
         |  FROM events),
         |src AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type, day
         |                                 ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM ev) WHERE rn = 1),
         |s1 AS (
         |  SELECT user_id, event_type, value_cents, props,
         |         'A' AS record_status, ts_utc AS effective_from,
         |         CAST(NULL AS TIMESTAMP) AS effective_to,
         |         $c1 AS dw_inserted_at, $c1 AS dw_updated_at,
         |         sha256(concat_ws('', CAST(value_cents AS VARCHAR), CAST(user_id AS VARCHAR), event_type)) AS scd_key,
         |         sha256(concat_ws('', CAST(user_id AS VARCHAR), event_type, props)) AS upd_key
         |  FROM src WHERE day = DATE '2024-01-01'),
         |b2 AS (
         |  SELECT user_id, event_type, value_cents, props,
         |         'A' AS record_status, ts_utc AS effective_from,
         |         CAST(NULL AS TIMESTAMP) AS effective_to,
         |         $c2 AS dw_inserted_at, $c2 AS dw_updated_at,
         |         sha256(concat_ws('', CAST(value_cents AS VARCHAR), CAST(user_id AS VARCHAR), event_type)) AS scd_key,
         |         sha256(concat_ws('', CAST(user_id AS VARCHAR), event_type, props)) AS upd_key
         |  FROM src WHERE day = DATE '2024-01-02'),
         |closed AS (
         |  SELECT s.user_id, s.event_type, s.value_cents, s.props,
         |         'I' AS record_status, s.effective_from,
         |         b.effective_from AS effective_to,
         |         s.dw_inserted_at, $c2 AS dw_updated_at, s.scd_key, s.upd_key
         |  FROM s1 s JOIN b2 b ON s.user_id = b.user_id AND s.event_type = b.event_type
         |  WHERE s.scd_key <> b.scd_key),
         |newver AS (
         |  SELECT b.* FROM b2 b JOIN s1 s
         |    ON s.user_id = b.user_id AND s.event_type = b.event_type
         |  WHERE s.scd_key <> b.scd_key),
         |scd1 AS (
         |  SELECT s.user_id, s.event_type, b.value_cents, b.props,
         |         b.record_status, s.effective_from, b.effective_to,
         |         s.dw_inserted_at, b.dw_updated_at, b.scd_key, b.upd_key
         |  FROM s1 s JOIN b2 b ON s.user_id = b.user_id AND s.event_type = b.event_type
         |  WHERE s.scd_key = b.scd_key AND s.upd_key <> b.upd_key),
         |unchanged AS (
         |  SELECT s.* FROM s1 s LEFT JOIN b2 b
         |    ON s.user_id = b.user_id AND s.event_type = b.event_type
         |  WHERE b.user_id IS NULL OR (s.scd_key = b.scd_key AND s.upd_key = b.upd_key)),
         |brandnew AS (
         |  SELECT b.* FROM b2 b
         |  WHERE NOT EXISTS (SELECT 1 FROM s1 s
         |    WHERE s.user_id = b.user_id AND s.event_type = b.event_type))
         |SELECT * FROM (
         |  SELECT * FROM closed UNION ALL SELECT * FROM newver
         |  UNION ALL SELECT * FROM scd1 UNION ALL SELECT * FROM unchanged
         |  UNION ALL SELECT * FROM brandnew)
         |ORDER BY user_id, event_type, effective_from, record_status""".stripMargin
    Map(
      "scd_apply_day2" -> scdSql,
      // the persisted-backend arc lands on the SAME final state: one
      // oracle body checks both the algebra and the storage path
      "scd_apply_incremental" -> scdSql,
      // ...and so does the STREAMING entry point: same batches, same
      // per-batch clocks, through writeStream/foreachBatch
      "scd_apply_stream" -> scdSql,
      "scd_pointintime" -> scdPitSql.replace("%SCD%", scdSql))
  }

  /** The SAME two-batch apply, END-TO-END through the persisted scale
    * backend: day-1 and day-2 are committed into an
    * [[graft.lake.IncrementalScdTable]] (8 buckets, identity column
    * on), and the final snapshot is read back FROM THE TABLE — through
    * the bucket hashing, the touched-bucket file swap, the manifest
    * commit, and the identity-watermark allocation — then hash-matched
    * against the SAME DuckDB oracle body as `scd_apply_day2` (the two
    * paths produce the same final state by construction; the planner
    * query checks the algebra, this one checks the STORAGE ARC the
    * 100 TB deployment actually runs). The surrogate-key column is
    * exercised (allocated, persisted, watermarked) but projected away
    * before the compare — the oracle cannot replay allocation order.
    */
  def scdApplyIncremental(spark: SparkSession, dir: String): DataFrame = {
    val t = incrementalDim(spark, dir)
    t.snapshot()
      .select(targetSchema.fieldNames.map(col): _*)
      .orderBy("user_id", "event_type", "effective_from", "record_status")
  }

  /** Build-once cache of the two-batch incremental dimension, keyed on
    * the events file (same contract as LakeDmlQueries.cached): complete
    * iff exactly the two scd_apply commits exist — a half-built table
    * from a crashed run is rebuilt, never trusted.
    */
  private def incrementalDim(spark: SparkSession, dir: String): graft.lake.IncrementalScdTable = {
    val src = new java.io.File(s"$dir/events.parquet")
    // tag v4: the applyScd build arc changed again (bucket-keyed identity
    // allocation + file-backed _tmp staging) — bumping forces the
    // driver's gate to rebuild THROUGH the new arc rather than serve a
    // cache the old code built
    val key = java.lang.Integer.toHexString(
      (dir, src.length, src.lastModified, "scdinc4").hashCode)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lake_scdinc4_$key"
    def open() = new graft.lake.IncrementalScdTable(spark, path,
      numBuckets = 8, identityCol = Some("dim_sk"), identityStart = 10L)
    val existing = open()
    val complete = existing.exists &&
      existing.table.latestVersion.contains(1L) &&
      existing.table.operationAt(1L).startsWith("scd_apply[")
    if (complete) return existing
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val t = open()
    t.create(StructType(StructField("dim_sk", LongType) +: targetSchema.fields))
    val batches = dimSources(spark, dir, Seq("2024-01-01", "2024-01-02"))
      .localCheckpoint()
    def day(d: String) = batches
      .filter(col("day") === lit(d).cast("date")).drop("day")
      .withColumn("dim_sk", lit(null).cast("long"))
      .select("dim_sk", "user_id", "event_type", "value_cents", "props", "ts_utc")
    t.applyScd(day("2024-01-01"), cfg(Clock1))
    t.applyScd(day("2024-01-02"), cfg(Clock2))
    t
  }

  /** The SAME two-batch apply through the STREAMING entry point
    * ([[graft.streaming.Streams.incrementalScdSink]]) — the sink a
    * continuously-maintained 100 TB dimension actually runs: day-1 and
    * day-2 arrive as two micro-batches of one Structured Streaming
    * query whose `foreachBatch` sink maintains the persisted
    * [[graft.lake.IncrementalScdTable]] (8 buckets, identity on), the
    * per-batch clock mapping batch id → the same day-apart stamps the
    * batch arcs pin, so the final snapshot hash-matches the SAME
    * DuckDB oracle body as `scd_apply_day2`/`scd_apply_incremental`.
    * The build arc additionally REPLAYS the day-2 batch through the
    * sink under its original batch id — a failure-recovery rerun: the
    * re-stamped clocks are identical, the split finds nothing changed,
    * and the snapshot must be value-identical (asserted inside the
    * arc, dim_sk included — a replay must not re-allocate surrogate
    * keys). MemoryStream is the test-scale harness; a deployment
    * points `readStream` at its real source and keeps the same sink.
    */
  def scdApplyStream(spark: SparkSession, dir: String): DataFrame = {
    val t = streamedDim(spark, dir)
    t.snapshot()
      .select(targetSchema.fieldNames.map(col): _*)
      .orderBy("user_id", "event_type", "effective_from", "record_status")
  }

  /** Build-once cache of the STREAMED two-batch dimension (cache
    * contract as [[incrementalDim]]): complete iff exactly the two
    * streamed batches AND the replay probe committed (v0/v1 the day
    * batches, v2 the value-identical replayed day-2).
    */
  private def streamedDim(spark: SparkSession, dir: String): graft.lake.IncrementalScdTable = {
    val src = new java.io.File(s"$dir/events.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, src.length, src.lastModified, "scdstrm3").hashCode)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lake_scdstrm3_$key"
    def open() = new graft.lake.IncrementalScdTable(spark, path,
      numBuckets = 8, identityCol = Some("dim_sk"), identityStart = 10L)
    val existing = open()
    val complete = existing.exists &&
      existing.table.latestVersion.contains(2L) &&
      (0L to 2L).forall(v =>
        existing.table.operationAt(v).startsWith("scd_apply["))
    if (complete) return existing
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val t = open()
    t.create(StructType(StructField("dim_sk", LongType) +: targetSchema.fields))
    val batches = dimSources(spark, dir, Seq("2024-01-01", "2024-01-02"))
      .localCheckpoint()
    def day(d: String) = batches
      .filter(col("day") === lit(d).cast("date")).drop("day")
      .withColumn("dim_sk", lit(null).cast("long"))
      .select("dim_sk", "user_id", "event_type", "value_cents", "props", "ts_utc")
    val day1 = day("2024-01-01")
    val day2 = day("2024-01-02")
    // batch id → stamp: Clock1 for the day-1 batch, Clock2 (one day
    // later) for day-2 — strictly monotonic AND replay-deterministic
    val sink = graft.streaming.Streams.incrementalScdSink(t, cfg(Clock1),
      id => Instant.parse(Clock1).plus(java.time.Duration.ofDays(id)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(day1.schema)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Row]
    val q = input.toDF().writeStream.foreachBatch(sink).start()
    try {
      input.addData(day1.collect().toSeq); q.processAllAvailable()
      input.addData(day2.collect().toSeq); q.processAllAvailable()
    } finally q.stop()
    // failure-recovery replay of the LAST micro-batch under its
    // original id: identical re-stamped clocks → the split classifies
    // every row unchanged → the restaged slice is value-identical,
    // surrogate keys included (no re-allocation)
    val before = t.snapshot().localCheckpoint()
    sink(day2, 1L)
    val after = t.snapshot()
    require(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty,
      "replayed day-2 micro-batch must leave the SCD snapshot " +
        "value-identical (the streaming sink's idempotence contract)")
    t
  }

  /** Point-in-time lookup AGAINST the SCD2 dimension: every day-3 event
    * joined to the dimension version valid at its event time
    * (`effective_from <= t < effective_to`, open interval = current).
    * This is what the validity intervals exist FOR — the proof the
    * maintained dimension answers as-of queries. Plain equi-join on the
    * business key + interval residual (versions per key are few, so the
    * residual filter is cheap); the dimension side broadcasts at
    * incremental scale.
    */
  def scdPointInTime(spark: SparkSession, dir: String): DataFrame = {
    val (s1, b2, b3) = day1StateAndBatches(spark, dir)
    val dim = ScdApply.nextState(s1, b2, cfg(Clock2))
      .select(col("user_id"), col("event_type"), col("value_cents"),
        col("record_status"),
        expr("unix_micros(effective_from)").as("ef_us"),
        expr("unix_micros(effective_to)").as("et_us"))
    val ev3 = b3
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts_utc as timestamp))").as("t_us"))
    ev3.join(dim,
      Seq("user_id", "event_type"), "left")
      .filter(col("ef_us").isNull ||
        (col("t_us") >= col("ef_us") &&
          (col("et_us").isNull || col("t_us") < col("et_us"))))
      .select(col("user_id"), col("event_type"), col("t_us"),
        coalesce(col("value_cents"), lit(-1L)).as("value_at_t"),
        coalesce(col("record_status"), lit("none")).as("status_at_t"))
      .orderBy("user_id", "event_type", "t_us")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd_apply_day2" -> scdApplyDay2 _,
    "scd_apply_incremental" -> scdApplyIncremental _,
    "scd_apply_stream" -> scdApplyStream _,
    "scd_pointintime" -> scdPointInTime _)
}
