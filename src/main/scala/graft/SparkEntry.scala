package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and each extension op)
  * registers a named query here plus, where SQL-expressible, a DuckDB
  * oracle equivalent with IDENTICAL column names (the driver compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the reference's composite apply_scd pipeline (SURVEY.md
    * §2.11) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.ScdEventQueries.scdApplyDay2(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RelationalQueries.queries ++
      ops.ScdEventQueries.queries ++
      ops.PipelineQueries.queries ++
      ops.LakeDmlQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.RelationalQueries.oracle ++
      ops.ScdEventQueries.oracle ++
      ops.PipelineQueries.oracle ++
      ops.LakeDmlQueries.oracle
}
