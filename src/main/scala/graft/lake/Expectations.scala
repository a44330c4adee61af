package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality EXPECTATIONS on the lake write path — the Delta Live
  * Tables surface (`expect` / `expect_or_drop` / `expect_or_fail`)
  * rebuilt on the manifest protocol:
  *
  *  - `Warn`: violations are counted, every row lands;
  *  - `Drop`: violating rows are diverted to a QUARANTINE table
  *    (tagged with the rules they failed) instead of the target;
  *  - `Fail`: any violation aborts the whole append — nothing commits
  *    anywhere (the CHECK-constraint stance, but evaluated per batch
  *    with a per-rule count in the error).
  *
  * Rule semantics are SQL CHECK semantics: a row VIOLATES a rule only
  * when the expression is FALSE — NULL passes (same as
  * [[IncrementalTable.addConstraint]]).
  *
  * The per-rule violation counts ride the append commit's manifest
  * meta (`expect` key), so quality metrics version with the data and
  * survive time travel — `metricsAt` reads them back. The quarantine
  * commit lands BEFORE the target append, which fixes the crash
  * contract (proved by ExpectationsSpec's crash-replay test, which
  * kills the pipeline between the two commits and re-runs the batch):
  * re-running the same batch admits every kept row EXACTLY once and
  * never admits a dropped row. With a non-empty `batchTag` the
  * quarantine side is exactly-once too: each attempt atomically
  * REPLACES the tag's quarantine slice (`overwriteWhere` — one
  * commit, no delete/append window), so a replay leaves one copy of
  * the bad rows, not one per attempt. Only an UNTAGGED batch — which
  * has no identity to dedup on — degrades to at-least-once appends.
  * The inverse commit order would risk the opposite, unacceptable
  * artifact: admitted rows whose quarantine record vanished.
  *
  * Scale shape: ONE pass computes every rule flag (a codegen'd boolean
  * column per rule), the kept/quarantined split is two filters over
  * the localCheckpointed flags, and both appends are O(batch).
  */
object Expectations {

  sealed trait Action
  case object Warn extends Action
  case object Drop extends Action
  case object Fail extends Action

  /** One expectation: `name` must be unique per call; `exprSql` is any
    * boolean SQL over the batch's columns.
    */
  final case class Rule(name: String, exprSql: String, action: Action)

  final case class Result(
      version: Long, // target commit (-1 if the whole batch dropped)
      admitted: Long, quarantined: Long,
      violations: Map[String, Long])

  private def flagCol(r: Rule) = s"__ok_${r.name}"

  /** Validate `df` against `rules` and append the passing rows to
    * `table`; `Drop` violations go to `quarantine` (required iff any
    * Drop rule is present), tagged `_failed_rules` (comma-joined,
    * name-sorted) and `_quarantined_batch`.
    */
  def appendWithExpectations(
      table: IncrementalTable, df: DataFrame, rules: Seq[Rule],
      quarantine: Option[IncrementalTable] = None,
      batchTag: String = ""): Result = {
    require(rules.nonEmpty, "appendWithExpectations needs >= 1 rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name)}")
    require(rules.forall(r => IncrementalTable.saneColumnName(r.name)),
      "rule names must be identifier-like (they become column suffixes)")
    require(!rules.exists(_.action == Drop) || quarantine.isDefined,
      "Drop rules need a quarantine table")
    val flagged = rules.foldLeft(df) { (d, r) =>
      // CHECK semantics: NULL passes — only FALSE violates
      d.withColumn(flagCol(r), coalesce(expr(r.exprSql), lit(true)))
    }.localCheckpoint()
    val dropRules = rules.filter(_.action == Drop)
    val keep = dropRules.map(r => col(flagCol(r)))
      .foldLeft(lit(true))(_ && _)
    // every per-rule violation count, the quarantined count, and the
    // admitted count in ONE aggregation pass over the checkpointed
    // flags (a per-rule count() would scan the batch once per rule —
    // N+2 passes for N rules)
    val vRow = flagged.agg(
      sum(when(!keep, 1L).otherwise(0L)).as("__quar"),
      rules.map(r => sum(when(!col(flagCol(r)), 1L).otherwise(0L))
        .as(flagCol(r))) :+ count(lit(1)).as("__n"): _*).collect().head
    def cnt(name: String): Long = {
      val i = vRow.fieldIndex(name)
      if (vRow.isNullAt(i)) 0L else vRow.getLong(i) // sum() is NULL on empty
    }
    val violations: Map[String, Long] = rules.map { r =>
      r.name -> cnt(flagCol(r))
    }.toMap
    rules.filter(_.action == Fail).foreach { r =>
      if (violations(r.name) > 0L)
        throw new IllegalStateException(
          s"expectation '${r.name}' (FAIL) violated by " +
            s"${violations(r.name)} row(s) of the batch — nothing committed")
    }
    val kept = flagged.filter(keep).drop(rules.map(flagCol): _*)
    val quarantinedCnt = cnt("__quar") match {
      case 0L =>
        // a TAGGED batch with no violations still clears its tag's
        // slice: a crashed prior attempt may have quarantined rows the
        // (since-corrected) re-run now admits — leaving them would
        // show the same row as both admitted and quarantined
        if (batchTag.nonEmpty)
          quarantine.filter(_.exists)
            .foreach(_.deleteWhere(col("_quarantined_batch") === lit(batchTag)))
        0L
      case n =>
        val q = quarantine.get
        val failedNames = concat_ws(",", array(dropRules.sorted(
          Ordering.by[Rule, String](_.name)).map(r =>
          when(!col(flagCol(r)), lit(r.name))): _*))
        val bad = flagged.filter(!keep)
          .withColumn("_failed_rules", failedNames)
          .withColumn("_quarantined_batch", lit(batchTag))
          .drop(rules.map(flagCol): _*)
        // EXACTLY-ONCE quarantine for TAGGED batches: atomically
        // replace the tag's slice instead of appending, so a
        // crash-replay of the same batch re-publishes ONE copy of the
        // bad rows in ONE commit rather than stacking a copy per
        // attempt. An untagged batch has no identity to dedup on and
        // keeps the at-least-once append.
        if (batchTag.nonEmpty && q.exists)
          q.overwriteWhere(col("_quarantined_batch") === lit(batchTag), bad)
        else q.append(bad)
        n
    }
    val admitted = cnt("__n") - quarantinedCnt
    val v =
      if (admitted == 0L) -1L
      // the full append pipeline (generated columns, write order,
      // CHECK constraints, identity/row-id allocation), just tagged
      else table.append(kept, operation = "append[expectations]",
        extraMeta = Map("expect" -> encode(violations)))
    Result(v, admitted, quarantinedCnt, violations)
  }

  /** The per-rule violation counts a version's append recorded. */
  def metricsAt(table: IncrementalTable, v: Long): Map[String, Long] =
    table.metaAt(v).get("expect").map(decode).getOrElse(Map.empty)

  private def encode(m: Map[String, Long]): String =
    java.util.Base64.getEncoder.encodeToString(
      m.toSeq.sortBy(_._1).map { case (k, n) => s"$k=$n" }
        .mkString(";").getBytes("UTF-8"))

  private def decode(s: String): Map[String, Long] =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")
      .split(";").filter(_.nonEmpty).map { kv =>
        val Array(k, n) = kv.split("=", 2)
        k -> n.toLong
      }.toMap
}
