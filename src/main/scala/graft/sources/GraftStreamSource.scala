package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StructType

import graft.lake.IncrementalTable

/** Streaming read of an [[IncrementalTable]]: the commit log IS the
  * stream. Offsets are committed VERSION numbers; a micro-batch reads
  * exactly the data files added between two committed versions (two
  * manifest reads, O(batch) regardless of table size) — the same
  * "tail the transaction log" semantics as Delta's streaming source.
  *
  * {{{
  *   spark.readStream.format("graft").load(path)              // v0 onward
  *     .option("startingVersion", "7")                        // from v7
  *     .option("ignoreChanges", "true")                       // see below
  * }}}
  *
  * A version that REMOVES files (overwrite / compact / SCD rewrite) is
  * not an append: by default the stream fails loudly there; with
  * `ignoreChanges=true` its newly-added files are emitted instead
  * (re-delivering rewritten rows — Delta's ignoreChanges contract,
  * downstream must tolerate duplicates). Exactly-once delivery
  * otherwise comes from offset checkpointing: a replayed batch re-reads
  * the same immutable version range.
  */
final class GraftStreamSource(
    spark: SparkSession, path: String, override val schema: StructType,
    startingVersion: Long, ignoreChanges: Boolean) extends Source {

  private val table = new IncrementalTable(spark, path)
  private val dataDir = new Path(path, "data")

  private def toVersion(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] =
    table.latestVersion.filter(_ >= startingVersion - 1).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = toVersion(end)
    val fromPrev: Option[Long] = start.map(toVersion) match {
      case Some(s) => Some(s) // resume: everything ≤ s already delivered
      case None if startingVersion > 0 => Some(startingVersion - 1)
      case None => None // cold start from the table's beginning
    }
    val prevFiles: Set[String] = fromPrev match {
      case None => Set.empty
      case Some(p) =>
        require(table.versionExists(p),
          s"graft stream: version $p was vacuumed from $path — cannot " +
            "compute the delta; restart the stream from a fresh checkpoint")
        table.files(p).toSet
    }
    val nowFiles = table.files(to)
    val removed = prevFiles -- nowFiles
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"graft stream: versions ${fromPrev.getOrElse(-1L) + 1}..$to of $path " +
          s"rewrite ${removed.size} file(s) (compact/overwrite/merge). " +
          "Streaming reads require append-only commits; set " +
          "ignoreChanges=true to stream the rewritten files as re-deliveries.")
    val added = nowFiles.filterNot(prevFiles).sorted
    val batch =
      if (added.isEmpty)
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      else
        spark.read.schema(schema)
          .parquet(added.map(f => new Path(dataDir, f).toString): _*)
    ColumnBridge.asStreamingFrame(spark, batch)
  }

  override def stop(): Unit = ()
}
