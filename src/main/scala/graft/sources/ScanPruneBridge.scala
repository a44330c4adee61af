package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.FileScan
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

/** Runtime file-set surgery on a built parquet DSv2 scan — the
  * `private[sql]` half of graft's dynamic file pruning
  * ([[graft.sources.GraftStreamScan.filter]]). The scan's pushed
  * filters, read schema and options are untouched; ONLY the file index
  * is replaced, so the pre-pruning reader factory stays valid for the
  * pruned partitions (the same contract Spark's own
  * `BatchScanExec.filteredPartitions` relies on: `createReaderFactory`
  * on a parquet scan does not depend on the file index).
  */
object ScanPruneBridge {

  /** Scheme/authority-insensitive identity for a scan file — the same
    * store is reachable under more than one rendering of its URI
    * (`file:/x` vs `/x`, explicit vs default port), and the manifest
    * and the file index need not agree on which.
    */
  def normPath(p: Path): String = p.toUri.getPath

  /** The (qualified) files the built scan currently serves, when it is
    * a file scan at all. */
  def scanFiles(scan: Scan): Option[Seq[Path]] = scan match {
    case fs: FileScan => Some(fs.fileIndex.allFiles().map(_.getPath))
    case _ => None
  }

  /** `scan` rebuilt over only the files whose [[normPath]] survives
    * `keep` — None when nothing was pruned (caller keeps the original)
    * or the scan is not a parquet file scan (fail open).
    */
  def pruneFiles(spark: SparkSession, scan: Scan,
      keep: String => Boolean): Option[(Scan, Int, Int)] = scan match {
    case ps: ParquetScan =>
      val before = ps.fileIndex.allFiles()
      val kept = before.filter(f => keep(normPath(f.getPath)))
      if (kept.size == before.size) None
      else {
        // empty partition spec: graft data directories are flat (no
        // hive partition dirs), and skipping inference keeps the
        // rebuild a pure metadata operation over the surviving paths
        val idx = new InMemoryFileIndex(spark, kept.map(_.getPath),
          Map.empty[String, String], userSpecifiedSchema = None,
          userSpecifiedPartitionSpec = Some(PartitionSpec.emptySpec))
        Some((ps.copy(fileIndex = idx), before.size, kept.size))
      }
    case _ => None
  }
}
