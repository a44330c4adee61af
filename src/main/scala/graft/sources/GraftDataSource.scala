package graft.sources

import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetDataSourceV2
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.VersionedTable

/** DataSource V2 read surface for [[graft.lake.VersionedTable]]:
  *
  * {{{
  *   spark.read.format("graft").load(path)                       // latest
  *   spark.read.format("graft").option("versionAsOf", 3).load(path)
  *   spark.read.format("graft").option("timestampAsOf", "2026-01-01 00:00:00").load(path)
  * }}}
  *
  * The connector resolves the requested version through the table's
  * commit manifests (so uncommitted/crashed writer directories stay
  * invisible) and then DELEGATES to Spark's own parquet DSv2 on the
  * immutable version directory — inheriting predicate pushdown, column
  * pruning, vectorized reads, partition discovery and AQE behavior
  * instead of re-implementing a file format. Same layering Delta uses:
  * the table format owns version→file resolution, the engine's parquet
  * reader owns bytes.
  *
  * Time travel mirrors Delta's reader options (`versionAsOf` /
  * `timestampAsOf`, the surface the reference's platform exposes).
  */
class GraftDataSource extends ParquetDataSourceV2 {

  override def shortName(): String = "graft"

  override def getPaths(map: CaseInsensitiveStringMap): Seq[String] = {
    val roots = super.getPaths(map)
    require(roots.nonEmpty, "graft: no path specified")
    val versionOpt = Option(map.get("versionAsOf")).map(_.trim.toLong)
    val tsOpt = Option(map.get("timestampAsOf")).map(parseMillis)
    require(versionOpt.isEmpty || tsOpt.isEmpty,
      "graft: versionAsOf and timestampAsOf are mutually exclusive")
    roots.map { root =>
      val vt = new VersionedTable(sparkSession, root)
      val v = (versionOpt, tsOpt) match {
        case (Some(ver), _) =>
          require(vt.versionExists(ver), s"graft: version $ver does not exist at $root")
          ver
        case (_, Some(ms)) => vt.versionAsOfTimestamp(ms).getOrElse(
          throw new IllegalArgumentException(
            s"graft: no version committed at or before ${map.get("timestampAsOf")} at $root"))
        case _ => vt.latestVersion.getOrElse(
          throw new IllegalArgumentException(s"graft: empty table at $root"))
      }
      s"${root.stripSuffix("/")}/v=$v"
    }
  }

  private def parseMillis(s: String): Long = {
    val t = s.trim
    if (t.forall(_.isDigit)) t.toLong
    else java.sql.Timestamp.valueOf(t).getTime
  }
}
