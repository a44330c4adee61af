package graft.scd

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two merge sources produced by one SCD split, both derived from ONE
  * target snapshot (scd_handler.py:71) — the ordering contract of the
  * reference's lifecycle (SURVEY.md §3.1).
  *
  * @param inactiveUpdates rows closing superseded versions (merge #1 source)
  * @param activeUnion     current-version upserts: every incoming row for an
  *                        existing key, plus brand-new keys (merge #2 source)
  * @param now             the single driver-side timestamp of this run
  */
final case class ScdDelta(
    inactiveUpdates: DataFrame,
    activeUnion: DataFrame,
    now: Timestamp)

/** Hybrid SCD1 + SCD2 apply — the reference's flagship operator
  * (`apply_scd`, scd_handler.py:58-163), as a pure DataFrame planner.
  *
  * Pipeline (each step cites the reference lines it reproduces):
  *  1. snapshot dedup: latest version per business key ([[Snapshot]];
  *     scd_handler.py:70-75)
  *  2. column bookkeeping (scd_handler.py:79-83): `selectCols` stripped of
  *     system columns; upd-key columns computed BEFORE the scd-key list is
  *     extended with the pk — so pk columns participate in `upd_key`
  *  3. stamping (scd_handler.py:95-105): status 'A', effective interval,
  *     dw timestamps from ONE driver-captured clock value, both hash keys
  *  4. split: inner pk-join = existing keys (scd_handler.py:111-119);
  *     among those, changed `scd_key` yields the target-side row to close
  *     (scd_handler.py:121-124); left-anti = new keys, which take
  *     `effective_from = initial_effective_from` (scd_handler.py:126-134)
  *  5. close: changed target rows get status 'I' and
  *     `effective_to = incoming effective_from` (scd_handler.py:142-149)
  *  6. the two Delta merges (scd_handler.py:152,163) are emulated
  *     sequentially as pure transforms by [[MergeEmulator]]; merge #2 runs
  *     against merge #1's output state, exactly like Delta's post-commit
  *     re-read (SURVEY.md §3.1).
  *
  * Scale notes: all joins/windows key on `pkCols`, so the window shuffle,
  * both split joins and both merge joins share one hash partitioning;
  * incremental batches are typically small relative to the dimension, so
  * AQE broadcasts the update side of each merge join. Nothing here
  * collects to the driver.
  */
object ScdApply {
  import ScdConfig.SystemCols

  /** Steps 1-5: compute both merge sources from one snapshot. */
  def split(targetSnapshot: DataFrame, source: DataFrame, cfg: ScdConfig): ScdDelta = {
    val now = Timestamp.from(cfg.clock())
    val currentTs = lit(now)

    val targetDf = Snapshot.latestPerKey(targetSnapshot, cfg.pkCols)

    // -- step 2: column bookkeeping (order is load-bearing, see Scaladoc)
    val selectCols =
      cfg.selectCols.getOrElse(source.columns.toSeq).filterNot(SystemCols.contains)
    val updKeyCols =
      selectCols.filterNot(c => cfg.scdKeyCols.contains(c) || SystemCols.contains(c))
    val scdKeyCols =
      cfg.scdKeyCols ++ cfg.pkCols.filterNot(cfg.scdKeyCols.contains)

    // -- step 3: stamping
    val effectiveFromTs =
      cfg.effectiveFromCol.map(c => col(c).cast("timestamp")).getOrElse(currentTs)
    val initialEffTs =
      cfg.initialEffDateCol.map(c => col(c).cast("timestamp")).getOrElse(effectiveFromTs)
    val activeData = source
      .withColumn("record_status", lit("A"))
      .withColumn("effective_from", coalesce(effectiveFromTs, currentTs))
      .withColumn("initial_effective_from", coalesce(initialEffTs, currentTs))
      .withColumn("effective_to", lit(null).cast("timestamp"))
      .withColumn("dw_inserted_at", currentTs)
      .withColumn("dw_updated_at", currentTs)
      .withColumn("scd_key", Hashing.key(scdKeyCols))
      .withColumn("upd_key", Hashing.key(updKeyCols))
      .selectExpr(selectCols ++ SystemCols :+ "initial_effective_from": _*)

    // -- step 4: split on existing vs new business keys
    val pkJoin = cfg.pkCols
      .map(c => col(s"active_df.$c") === col(s"target_df.$c"))
      .reduce(_ && _)
    val processed = activeData.alias("active_df")
      .join(targetDf.alias("target_df"), pkJoin, "inner")

    val activeProcessed = processed.selectExpr("active_df.*")

    val inactiveToClose = processed
      .filter(col("active_df.scd_key") =!= col("target_df.scd_key"))
      .selectExpr(
        (selectCols.map(c => s"target_df.$c") :+
          "active_df.effective_from as active_eff_from"): _*)

    val activeNew = activeData.alias("active_df")
      .join(targetDf.alias("target_df"), pkJoin, "left_anti")
      .selectExpr("active_df.*")
      .withColumn("effective_from", col("initial_effective_from"))

    val activeUnion =
      activeProcessed.unionByName(activeNew).drop("initial_effective_from")

    // -- step 5: close superseded versions
    val inactiveUpdates = inactiveToClose
      .withColumn("record_status", lit("I"))
      .withColumn("effective_to", col("active_eff_from"))
      .withColumn("dw_inserted_at", currentTs) // excluded from the update set
      .withColumn("dw_updated_at", currentTs)
      .drop("active_eff_from")

    ScdDelta(inactiveUpdates, activeUnion, now)
  }

  /** Full next table state: split + both merges, one logical plan.
    * The caller (e.g. [[ScdTable.applyScd]]) owns persistence.
    *
    * Plan-size note (optimization round 18): with [[MergeEmulator]]'s
    * previous left-outer + left-anti merge shape, merge #2 referencing
    * merge #1's output twice (and each merge referencing the split's
    * join subtree twice) blew the two-batch planner query up to 46
    * exchanges / 20 sort-merge joins; the single-full-outer-join merge
    * in [[graft.lake.MergeInto]] keeps this plan linear (14 exchanges
    * / 6 joins measured on the same query) with no change to any
    * output row.
    */
  def nextState(targetSnapshot: DataFrame, source: DataFrame, cfg: ScdConfig): DataFrame = {
    val delta = split(targetSnapshot, source, cfg)
    val afterClose =
      MergeEmulator.merge(targetSnapshot, delta.inactiveUpdates, cfg.pkCols).next
    MergeEmulator
      .merge(afterClose, delta.activeUnion, cfg.pkCols, isActiveData = true)
      .next
  }
}
