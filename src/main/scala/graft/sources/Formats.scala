package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Typed file-format readers/writers beyond parquet. The reference has
  * no CSV/JSON/JDBC/Kafka connectors (SURVEY.md §2.1 note) — this is
  * deliberate extension surface for pipeline interchange, with the
  * scale rules baked in:
  *
  *  - **schemas are explicit**, never inferred: `inferSchema` scans the
  *    whole input once before the real read (2× the 100 TB scan) and
  *    can silently flip types between runs;
  *  - CSV/JSON readers run in PERMISSIVE mode with a corrupt-record
  *    column, so bad rows route to a quarantine sink instead of failing
  *    the job mid-scan;
  *  - writers take an optional partition spec — hive-style partition
  *    directories are what later partition-pruned reads key on.
  */
object Formats {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, "string")

  /** CSV with header, explicit schema, permissive corrupt-row capture. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt(schema))
      .csv(path)

  /** JSON-lines with explicit schema, permissive corrupt-row capture. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt(schema))
      .json(path)

  /** Rows that parsed cleanly (corrupt column dropped). */
  def clean(df: DataFrame): DataFrame =
    df.filter(df.col(CorruptCol).isNull).drop(CorruptCol)

  /** Rows that failed to parse — route to a quarantine sink.
    *
    * NOTE: Spark refuses plans that reference ONLY the corrupt-record
    * column of a raw CSV/JSON scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache or
    * materialize the parsed frame before splitting it into
    * clean/quarantine flows (one parse feeds both sinks anyway).
    */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(df.col(CorruptCol).isNotNull)

  def writeCsv(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("header", "true")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).csv(path)
  }

  def writeJsonl(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }
}
