package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftexpr.{KmvEstimateExpr, KmvIntersectExpr, KmvSketchAgg, KmvUnionExpr, LongArrayDotExpr, QuantizeMilliExpr}

/** SQL surface for graft's native expressions — the Spark extension
  * point (`SparkSessionExtensions.injectFunction`) that makes the
  * codegen'd kernels callable from pure SQL:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  *   // or, on an already-running session:
  *   GraftExtensions.register(spark)
  *   spark.sql("SELECT graft_dot(qv, cv) FROM pairs")
  * }}}
  *
  * Registered functions:
  *  - `graft_dot(array<long>, array<long>) : bigint` — exact int64 dot
  *    product ([[org.apache.spark.sql.graftexpr.LongArrayDotExpr]])
  *  - `graft_quantize_milli(array<double>) : array<long>` — fixed-point
  *    milli quantization ([[org.apache.spark.sql.graftexpr.QuantizeMilliExpr]])
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // SQL MERGE INTO on plain parquet catalog tables: wrap the parser so
    // MergeIntoTable plans route through graft.lake.MergeInto (see
    // org.apache.spark.sql.graftmerge.GraftMergeParser).
    ext.injectParser((_, delegate) =>
      new org.apache.spark.sql.graftmerge.GraftMergeParser(delegate))
    // Transparent materialized-view routing: aggregates over a graft
    // source rewrite to a scan of a registered FRESH IncrementalView
    // (opt-in per view via GraftViewRouting.register; no-op otherwise).
    ext.injectOptimizerRule(session =>
      graft.plans.RouteAggregatesToViews(session))
    // SQL change-data-feed surface: SELECT * FROM
    // table_changes('<table>', start [, end]) — Delta's TVF
    ext.injectTableFunction((graft.plans.TableChangesTvf.identifier,
      graft.plans.TableChangesTvf.info,
      graft.plans.TableChangesTvf.build _))
  }
}

object GraftExtensions {

  /** (identifier, info, builder) triples — the exact shape
    * `injectFunction` consumes, also usable against a live session's
    * registry via [[register]].
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[LongArrayDotExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes exactly 2 arguments")
        LongArrayDotExpr(children.head, children(1))
      }),
    (
      new FunctionIdentifier("graft_quantize_milli"),
      new ExpressionInfo(classOf[QuantizeMilliExpr].getName, "graft_quantize_milli"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_quantize_milli takes exactly 1 argument")
        QuantizeMilliExpr(children.head)
      }),
    (
      new FunctionIdentifier("graft_kmv_agg"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_kmv_agg(hash60, k)")
        val k = children(1) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException("graft_kmv_agg: k must be a literal")
        }
        KmvSketchAgg(children.head, k)
      }),
    (
      new FunctionIdentifier("graft_kmv_estimate"),
      new ExpressionInfo(classOf[KmvEstimateExpr].getName, "graft_kmv_estimate"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_kmv_estimate takes exactly 1 argument")
        KmvEstimateExpr(children.head)
      }),
    (
      new FunctionIdentifier("graft_kmv_intersect"),
      new ExpressionInfo(classOf[KmvIntersectExpr].getName, "graft_kmv_intersect"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_kmv_intersect takes exactly 2 arguments")
        KmvIntersectExpr(children.head, children(1))
      }),
    (
      new FunctionIdentifier("graft_kmv_union"),
      new ExpressionInfo(classOf[KmvUnionExpr].getName, "graft_kmv_union"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_kmv_union takes exactly 2 arguments")
        KmvUnionExpr(children.head, children(1))
      }))

  /** Register into an already-running session (covers sessions not
    * built with `withExtensions`, e.g. notebook environments).
    */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftexpr.GraftFunctionRegistrar.register(spark)
}
