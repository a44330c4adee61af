package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** A versioned, Parquet-backed table: the Spark-native re-derivation of
  * the Delta-platform surface the reference sits on (read / write /
  * time-travel / compaction — BASELINE.md north star) without the Delta
  * connector.
  *
  * Layout:
  * {{{
  *   <path>/_log/00000000000000000042.json   one manifest per version
  *   <path>/v=42/part-*.parquet              immutable version data
  * }}}
  *
  * Commit protocol: data is written to the new version directory FIRST,
  * then the manifest file is created via write-tmp + rename. Readers
  * resolve the latest version by listing `_log` — a version directory
  * without its manifest is invisible, so a crashed writer never
  * corrupts readers (the same pointer-commit idea as a Delta log entry,
  * minus multi-writer arbitration, which would need a lock service on
  * object stores — documented gap).
  *
  * Every version is a full snapshot (consistent with the SCD engine's
  * read-snapshot → transform → write model). At 100 TB the evolution is
  * manifest entries listing ADDED/REMOVED files per commit so unchanged
  * files are shared between versions — the log format already carries
  * per-version file lists to make that a compatible change.
  */
final class VersionedTable(spark: SparkSession, val path: String) {

  private val logDir = new Path(path, "_log")
  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(v: Long) = new Path(logDir, f"$v%020d.json")
  private def versionDir(v: Long) = new Path(path, s"v=$v")

  // committed manifests ONLY — a crashed writer can leave a
  // `_tmp_*.json` behind, which must stay invisible to every reader
  private val ManifestName = """^(\d{20})\.json$""".r

  private def manifestIds: Seq[Long] =
    (if (fs.exists(logDir)) fs.listStatus(logDir).toSeq else Seq.empty)
      .map(_.getPath.getName)
      .collect { case ManifestName(digits) => digits.toLong }

  def exists: Boolean = fs.exists(logDir) && latestVersion.isDefined

  def latestVersion: Option[Long] = {
    val ids = manifestIds
    if (ids.isEmpty) None else Some(ids.max)
  }

  def versionExists(v: Long): Boolean = fs.exists(manifestPath(v))

  /** Latest version whose commit time is ≤ `millis` (Delta's
    * `timestampAsOf` resolution rule).
    */
  def versionAsOfTimestamp(millis: Long): Option[Long] = {
    val commits = manifestIds.sorted.map(v => v -> readManifestField(v, "committedAt").toLong)
    commits.takeWhile(_._2 <= millis).lastOption.map(_._1)
  }

  private def readManifestField(v: Long, k: String): String = {
    val in = fs.open(manifestPath(v))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    txt.split(s""""$k":""")(1).takeWhile(c => c != ',' && c != '}').trim
      .stripPrefix("\"").stripSuffix("\"")
  }

  /** Commit `df` as the next full-snapshot version; returns its id. */
  def write(df: DataFrame, operation: String = "write"): Long = {
    val v = latestVersion.map(_ + 1).getOrElse(0L)
    val dir = versionDir(v)
    df.write.mode("overwrite").parquet(dir.toString)
    val files = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
    commit(v, operation, files.size)
    v
  }

  private def commit(v: Long, operation: String, numFiles: Int): Unit = {
    val json =
      s"""{"version":$v,"operation":"$operation","numFiles":$numFiles,""" +
        s""""committedAt":${System.currentTimeMillis()}}"""
    fs.mkdirs(logDir)
    // writer-unique tmp name: two committers racing on one version must
    // never share a tmp file (the loser could otherwise rename the
    // winner's half-written content into place)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(logDir, f"_tmp_${nonce}_$v%020d.json")
    val out = fs.create(tmp, true)
    out.write(json.getBytes(StandardCharsets.UTF_8))
    out.close()
    if (!fs.rename(tmp, manifestPath(v))) {
      fs.delete(tmp, false)
      throw new CommitConflictException(
        s"concurrent commit detected for version $v of $path — " +
          "VersionedTable is single-writer (full-snapshot version dirs " +
          "can collide mid-write); use IncrementalTable for concurrent writers")
    }
  }

  /** Latest snapshot. */
  def snapshot(): DataFrame = snapshotAt(
    latestVersion.getOrElse(throw new IllegalStateException(s"empty table $path")))

  /** Time travel: the table exactly as of version `v`. */
  def snapshotAt(v: Long): DataFrame = {
    require(fs.exists(manifestPath(v)), s"version $v does not exist at $path")
    spark.read.parquet(versionDir(v).toString)
  }

  /** Commit history, newest first — the `DeltaTable.history()` analog
    * (scd_handler.py:54-55 displays exactly this surface).
    */
  def history(): DataFrame = {
    val rows = manifestIds.sorted.reverse
      .map(v => f"$v%020d.json")
      .map { name =>
        val txt = {
          val in = fs.open(new Path(logDir, name))
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        }
        def field(k: String): String =
          txt.split(s""""$k":""")(1).takeWhile(c => c != ',' && c != '}').trim
            .stripPrefix("\"").stripSuffix("\"")
        Row(field("version").toLong, field("operation"),
          field("numFiles").toInt, new java.sql.Timestamp(field("committedAt").toLong))
      }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("version", LongType), StructField("operation", StringType),
      StructField("numFiles", IntegerType), StructField("committed_at", TimestampType))))
  }

  /** Change feed between two committed versions (Delta CDF analog, for
    * full-snapshot versions): rows present only in `to` are `insert`,
    * rows present only in `from` are `delete`; an updated row appears
    * as its delete + insert pair. Computed as two hash anti-joins over
    * the full row — one shuffle each at scale, no row-id bookkeeping
    * required by the full-snapshot commit model.
    */
  def changes(fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"changes: from=$fromV must be <= to=$toV")
    val before = snapshotAt(fromV)
    val after = snapshotAt(toV)
    val cols = before.columns.toSeq
    require(cols == after.columns.toSeq,
      s"changes: schema differs between v$fromV and v$toV — read each side separately")
    import org.apache.spark.sql.functions.lit
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }

  /** Commit `df` with schema evolution (Delta `mergeSchema` analog):
    * the committed snapshot carries the union of the current and new
    * columns by name; columns missing on either side fill with NULL.
    */
  def writeMergeSchema(df: DataFrame, operation: String = "write"): Long =
    latestVersion match {
      case None => write(df, operation)
      case Some(v) =>
        // union-by-name with the (empty) current schema widens df to
        // the union schema; columns df lacks fill with NULL
        write(df.unionByName(snapshotAt(v).limit(0), allowMissingColumns = true),
          operation)
    }

  /** Compaction: rewrite the current snapshot into `targetFiles` files
    * as a new version (the OPTIMIZE / optimizeWrite analog,
    * test_scd_handler.py:55-57). Data is unchanged; history records the
    * operation.
    */
  def compact(targetFiles: Int = 1): Long =
    write(snapshot().repartition(targetFiles), operation = "compact")

  /** Delete data of versions older than the last `keepLast` (readers of
    * vacuumed versions fail — same contract as Delta VACUUM).
    */
  def vacuum(keepLast: Int = 1): Unit = {
    val keep = math.max(1, keepLast)
    latestVersion.foreach { latest =>
      val cutoff = latest - keep + 1
      manifestIds.filter(_ < cutoff)
        .foreach { v =>
          fs.delete(versionDir(v), true)
          fs.delete(manifestPath(v), false)
        }
    }
  }
}
