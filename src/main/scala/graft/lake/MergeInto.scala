package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic MERGE INTO over DataFrames — the fluent surface the
  * reference's `delta_merge` drives on Delta
  * (`DeltaTable.alias("target").merge(df.alias("updates"), cond)
  *  .whenMatchedUpdate(condition, set).whenNotMatchedInsert(values)
  *  .execute()`, scd_handler.py:48-53), re-derived on plain Spark.
  *
  * Matched clauses (update / delete) follow Delta's first-match-wins
  * ordering: for each matched target row the FIRST clause whose
  * condition holds is applied; later clauses are ignored for that row.
  *
  * Differences from Delta, by design:
  *  - `resolve()` RETURNS the full next table state instead of
  *    committing — the caller owns persistence ([[VersionedTable]],
  *    `ScdTable`, or a plain write);
  *  - a target row matched by >1 update rows is undefined behavior
  *    (Delta throws at runtime; detecting it here would cost a count —
  *    [[graft.scd.MergeEmulator]] documents the same contract).
  *
  * Condition and set/insert expressions are SQL strings over the two
  * aliases (default `target` / `updates`), exactly like the reference's
  * string-built dictionaries. Update/insert values are cast to the
  * target column's type (Delta's implicit cast).
  *
  * Physical shape: one left-outer join (target preserved) + one
  * left-anti join (inserts), both on the same condition — equi-parts
  * hash-partition, AQE broadcasts a small updates side.
  */
final class MergeInto private (
    target: DataFrame,
    updates: DataFrame,
    targetAlias: String,
    updatesAlias: String,
    condition: String,
    matchedClauses: Seq[MergeInto.MatchedClause],
    notMatchedInsert: Option[Map[String, String]]) {

  import MergeInto._

  def whenMatchedUpdate(
      set: Map[String, String], condition: Option[String] = None): MergeInto =
    new MergeInto(target, updates, targetAlias, updatesAlias, this.condition,
      matchedClauses :+ MatchedClause(condition, Some(set)), notMatchedInsert)

  def whenMatchedDelete(condition: Option[String] = None): MergeInto =
    new MergeInto(target, updates, targetAlias, updatesAlias, this.condition,
      matchedClauses :+ MatchedClause(condition, None), notMatchedInsert)

  def whenNotMatchedInsert(values: Map[String, String]): MergeInto =
    new MergeInto(target, updates, targetAlias, updatesAlias, condition,
      matchedClauses, Some(values))

  /** Compute the full next table state (target schema). */
  def resolve(): DataFrame = {
    val targetSchema = target.schema
    val t = target.alias(targetAlias)
    val marker = s"__${updatesAlias}_matched"
    val u = updates.withColumn(marker, lit(true)).alias(updatesAlias)

    val joined = t.join(u, expr(condition), "left_outer")
    val matched = col(s"$updatesAlias.$marker") <=> lit(true)

    // first-match-wins: applicable(i) = matched ∧ ¬cond(0..i-1) ∧ cond(i)
    val applicable: Seq[Column] = matchedClauses.zipWithIndex.map { case (cl, i) =>
      val prior = matchedClauses.take(i)
        .map(p => p.condition.map(expr).getOrElse(lit(true)))
        .foldLeft(lit(true))((acc, c) => acc && !c)
      matched && prior && cl.condition.map(expr).getOrElse(lit(true))
    }

    val deletePred = matchedClauses.zip(applicable)
      .collect { case (MatchedClause(_, None), app) => app }
      .reduceOption(_ || _).getOrElse(lit(false))

    val survivors = joined.filter(!deletePred)
    val updated = survivors.select(targetSchema.fields.toSeq.map { f =>
      val base: Column = col(s"$targetAlias.${f.name}")
      val withClauses = matchedClauses.zip(applicable).foldRight(base) {
        case ((MatchedClause(_, Some(set)), app), els) =>
          set.get(f.name) match {
            case Some(valueExpr) => when(app, expr(valueExpr).cast(f.dataType)).otherwise(els)
            case None => els
          }
        case ((MatchedClause(_, None), _), els) => els // delete: filtered above
      }
      withClauses.as(f.name)
    }: _*)

    val inserts = notMatchedInsert match {
      case None => updated.limit(0)
      case Some(values) =>
        updates.alias(updatesAlias).join(t, expr(condition), "left_anti")
          .select(targetSchema.fields.toSeq.map { f =>
            values.get(f.name)
              .map(v => expr(v).cast(f.dataType).as(f.name))
              .getOrElse(lit(null).cast(f.dataType).as(f.name))
          }: _*)
    }
    updated.unionByName(inserts)
  }
}

object MergeInto {
  /** A WHEN MATCHED clause: `set = Some(...)` → update, `None` → delete. */
  final case class MatchedClause(
      condition: Option[String], set: Option[Map[String, String]])

  /** `MergeInto(target, updates, "target.pk = updates.pk AND ...")` */
  def apply(
      target: DataFrame, updates: DataFrame, condition: String,
      targetAlias: String = "target", updatesAlias: String = "updates"): MergeInto =
    new MergeInto(target, updates, targetAlias, updatesAlias, condition,
      Seq.empty, None)
}
