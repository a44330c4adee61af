package graft.scd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Result of a merge: the full next table state, plus lazily-computable
  * operation metrics (the stand-in for Delta's `history(1) →
  * operationMetrics`, scd_handler.py:54-55 — the reference only displays
  * them; no caller consumes the values).
  */
final case class MergeResult(next: DataFrame, metrics: () => MergeMetrics)

final case class MergeMetrics(rowsUpdated: Long, rowsInserted: Long)

/** Spark-native emulation of the Delta `MERGE INTO` the reference issues
  * (scd_handler.py:34-53), for classpaths without the Delta connector.
  *
  * Semantics reproduced exactly:
  *  - merge condition: `target.pk = updates.pk [for each pk] AND
  *    target.effective_to IS NULL AND target.record_status = 'A'
  *    [AND target.scd_key = updates.scd_key  when isActiveData]`
  *    (scd_handler.py:34)
  *  - whenMatchedUpdate, optional extra condition
  *    `target.upd_key != updates.upd_key` when isActiveData
  *    (scd_handler.py:36): update every UPDATES column EXCEPT
  *    `dw_inserted_at` and `effective_from` (scd_handler.py:38-41) — target
  *    columns absent from the updates df are untouched; matched rows whose
  *    update condition is false are kept byte-identical.
  *  - whenNotMatchedInsert: all updates columns (scd_handler.py:43-46);
  *    target columns absent from updates become NULL (Delta's behavior for
  *    unspecified insert columns).
  *  - update/insert values are cast to the target column types (Delta casts
  *    source LONG into an INT target column, etc.).
  *
  * Physical shape: one left-outer join (target preserved) plus one
  * left-anti join (inserts), union'd. Both joins share the same equi-keys
  * (`pkCols`), so at scale they hash-partition identically and AQE can
  * broadcast the updates side when small — the common case for incremental
  * batches against a large dimension. Unlike Delta, this produces the FULL
  * next state (the caller owns the write); Delta's touched-file-only
  * rewrite is an I/O optimization layered at the table level, see
  * [[ScdTable]].
  *
  * A target row matched by multiple update rows is undefined behavior
  * (Delta MERGE throws; the reference never dedups its source,
  * SURVEY.md §2.11).
  */
object MergeEmulator {

  def merge(
      target: DataFrame,
      updates: DataFrame,
      pkCols: Seq[String],
      isActiveData: Boolean = false): MergeResult = {

    val targetSchema = target.schema
    val updateCols = updates.columns.toSeq
    val t = target.alias("t")
    val u = updates.withColumn("__matched", lit(true)).alias("u")

    val mergeCond: Column = {
      val pkEq = pkCols.map(c => col(s"t.$c") === col(s"u.$c")).reduce(_ && _)
      val base = pkEq && col("t.effective_to").isNull && col("t.record_status") === "A"
      if (isActiveData) base && col("t.scd_key") === col("u.scd_key") else base
    }

    // NULL (unmatched) collapses to false via <=> true.
    val matched: Column = col("u.__matched") <=> lit(true)
    val updateCond: Column =
      if (isActiveData) matched && col("t.upd_key") =!= col("u.upd_key")
      else matched

    val noUpdate = Set("dw_inserted_at", "effective_from")
    val joined = t.join(u, mergeCond, "left_outer")
    val updatedTarget = joined.select(targetSchema.fields.toSeq.map { f =>
      if (updateCols.contains(f.name) && !noUpdate.contains(f.name))
        when(updateCond, col(s"u.${f.name}").cast(f.dataType))
          .otherwise(col(s"t.${f.name}")).as(f.name)
      else col(s"t.${f.name}").as(f.name)
    }: _*)

    val inserts = updates.alias("u").join(t, mergeCond, "left_anti")
      .select(targetSchema.fields.toSeq.map { f =>
        if (updateCols.contains(f.name)) col(s"u.${f.name}").cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)

    val next = updatedTarget.unionByName(inserts)

    def metrics(): MergeMetrics = {
      val updated =
        if (isActiveData)
          t.join(u, mergeCond, "inner")
            .filter(col("t.upd_key") =!= col("u.upd_key")).count()
        else t.join(u, mergeCond, "inner").count()
      val inserted = updates.alias("u").join(t, mergeCond, "left_anti").count()
      MergeMetrics(updated, inserted)
    }

    MergeResult(next, () => metrics())
  }
}
