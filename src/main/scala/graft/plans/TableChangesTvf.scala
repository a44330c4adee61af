package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the change data feed — Delta's `table_changes`
  * table-valued function:
  *
  * {{{
  *   SELECT * FROM table_changes('<table>', <startVersion>)
  *   SELECT * FROM table_changes('<table>', <startVersion>, <endVersion>)
  * }}}
  *
  * `<table>` is a quoted path or a graft-catalog name (`lake.t`);
  * versions are INCLUSIVE on both ends (Delta's contract — start names
  * the first commit whose changes are delivered), mapped onto
  * [[graft.lake.IncrementalTable.changes]]'s `(from, to]` range as
  * `changes(start-1, end)`. The result carries the table's columns
  * plus `_change_type` (`insert` / `delete` / `update_preimage` /
  * `update_postimage`) and `_commit_version`, with all of `changes`'s
  * semantics: appends feed from manifest deltas (no extra bytes),
  * mutations from CDC sidecars, `datachange=false` maintenance is
  * invisible, CDC-less rewrites fail loudly.
  *
  * Registered in the session's TableFunctionRegistry
  * (`injectTableFunction` via [[graft.GraftExtensions]]) — the
  * analyzer calls [[TableChangesTvf.build]] with the parsed argument
  * expressions and splices the change feed's plan in place of the
  * function call. Literal arguments only: the version range shapes the
  * scan, so it cannot depend on row values.
  */
object TableChangesTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("table_changes")

  val info: ExpressionInfo = new ExpressionInfo(
    TableChangesTvf.getClass.getCanonicalName, null, "table_changes",
    "table_changes(table, startVersion[, endVersion]) - the table's " +
      "change data feed over the inclusive version range", "")

  private def asLong(e: Expression, what: String): Long = e match {
    case Literal(v, IntegerType) => v.asInstanceOf[Int].toLong
    case Literal(v, LongType) => v.asInstanceOf[Long]
    case Literal(v, ShortType) => v.asInstanceOf[Short].toLong
    case Literal(v, ByteType) => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be an integer version literal, got $other")
  }

  def build(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      "table_changes(<table>, <startVersion> [, <endVersion>]) " +
        s"takes 2 or 3 arguments, got ${args.length}")
    val spark = SparkSession.active
    val target = args.head match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"table_changes: the table must be a string literal, got $other")
    }
    // a path-looking target is used verbatim; anything else resolves
    // through a registered graft catalog
    val path =
      if (target.contains("/")) target
      else org.apache.spark.sql.graftmerge.GraftMaintenanceSql
        .resolvePath(spark, target)
    val t = new graft.lake.IncrementalTable(spark, path)
    require(t.exists, s"table_changes: no graft table at $path")
    val start = asLong(args(1), "startVersion")
    val end = args.lift(2).map(asLong(_, "endVersion"))
      .getOrElse(t.latestVersion.get)
    t.changes(start - 1, end).queryExecution.analyzed
  }
}
