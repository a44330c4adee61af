package graft.scd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.MergeInto

/** Result of a merge: the full next table state, plus lazily-computable
  * operation metrics (the stand-in for Delta's `history(1) →
  * operationMetrics`, scd_handler.py:54-55 — the reference only displays
  * them; no caller consumes the values).
  */
final case class MergeResult(next: DataFrame, metrics: () => MergeMetrics)

final case class MergeMetrics(rowsUpdated: Long, rowsInserted: Long)

/** The reference's `delta_merge` (scd_handler.py:7-55) on plain Spark:
  * builds exactly the merge the reference builds — condition string
  * (scd_handler.py:34), conditional update predicate
  * `target.upd_key != updates.upd_key` when active (py:36), update-set
  * = all updates columns EXCEPT `dw_inserted_at`/`effective_from`
  * (py:38-41), insert-values = all updates columns (py:43-46) — and
  * hands it to the generic [[graft.lake.MergeInto]] builder. Matched
  * rows whose update condition is false are kept byte-identical; target
  * columns absent from the updates df are never touched; update/insert
  * values are cast to the target column types (Delta's implicit cast).
  *
  * A target row matched by multiple update rows is undefined behavior
  * (Delta MERGE throws; the reference never dedups its source,
  * SURVEY.md §2.11).
  */
object MergeEmulator {

  private def mergeCondition(pkCols: Seq[String], isActiveData: Boolean): String =
    pkCols.map(c => s"target.$c = updates.$c").mkString(" AND ") +
      " AND target.effective_to is null AND target.record_status = 'A'" +
      (if (isActiveData) " AND target.scd_key = updates.scd_key" else "")

  def merge(
      target: DataFrame,
      updates: DataFrame,
      pkCols: Seq[String],
      isActiveData: Boolean = false): MergeResult = {

    val condition = mergeCondition(pkCols, isActiveData)
    val updateCondition =
      if (isActiveData) Some("target.upd_key != updates.upd_key") else None
    val set = (updates.columns.toSet -- Set("dw_inserted_at", "effective_from"))
      .map(c => c -> s"updates.$c").toMap
    val values = updates.columns.map(c => c -> s"updates.$c").toMap

    val next = MergeInto(target, updates, condition)
      .whenMatchedUpdate(set, updateCondition)
      .whenNotMatchedInsert(values)
      .resolve()

    def metrics(): MergeMetrics = {
      val t = target.alias("target")
      val u = updates.alias("updates")
      val matchedUpdatable = t.join(u, expr(condition), "inner")
      val updated =
        if (isActiveData)
          matchedUpdatable.filter(expr("target.upd_key != updates.upd_key")).count()
        else matchedUpdatable.count()
      val inserted = u.join(t, expr(condition), "left_anti").count()
      MergeMetrics(updated, inserted)
    }

    MergeResult(next, () => metrics())
  }
}
