package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LINE-level corpus deduplication — the C4/RefinedWeb move (Raffel et
  * al. 2020 §2.2 "three-sentence span" dedup; Penedo et al. 2023 line
  * dedup): boilerplate lines (cookie banners, navigation, license
  * headers) repeat across millions of pages, and document-level dedup
  * cannot touch them because the SURROUNDING documents differ. Here
  * every exact line keeps only its FIRST occurrence corpus-wide
  * (ordered by `(doc_id, line position)` — deterministic, re-runnable)
  * and documents are reassembled from their surviving lines in
  * original order.
  *
  * Short lines (< `minChars`) are exempt — globally deduping "" or
  * "Introduction" would shred unrelated documents; the boilerplate
  * that matters is long enough to clear the bar.
  *
  * ==Scale shape==
  * One narrow `posexplode` (corpus → lines), then keep-first as a
  * `min(struct(doc_id, pos, …))` AGGREGATE keyed on the line's
  * sha2-256 — not a window. The distinction is what makes the hot-line
  * case (the same cookie banner ×10⁹) safe: an aggregate gets a
  * map-side partial, so every map task collapses its occurrences of a
  * hot hash to ONE buffer row before the shuffle, and the reduce side
  * merges one row per map partition; a `row_number` window would ship
  * every occurrence into a single partition and sort it there (window
  * sorts get neither partial aggregation nor AQE skew splitting).
  * Exempt short lines are filtered out BEFORE the shuffle and bypass
  * it entirely. Reassembly is one corpus-linear shuffle on `doc_id`
  * (`array_sort(collect_list(struct(pos, line)))` — per-doc state is
  * the doc's own lines, bounded by document size). No self-join, no
  * all-pairs product, no driver-side state.
  */
object LineDedup {

  /** `(doc_id, text)` → `(doc_id, new_text, lines_total, lines_kept)`
    * with `new_text` the doc's surviving lines joined by '\n' and
    * `lines_total` the doc's pre-dedup line count. A doc whose every
    * line was seen earlier disappears (no survivors) — callers wanting
    * empty husks can left-join the source.
    */
  def dedupLines(docs: DataFrame, minChars: Int = 10): DataFrame = {
    val lines = docs.select(col("doc_id"),
      size(split(col("text"), "\n")).cast("long").as("lines_total"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    // exempt lines never enter the dedup shuffle
    val exempt = lines.filter(length(col("line")) < minChars)
      .select("doc_id", "lines_total", "pos", "line")
    // every row in a hash group has identical text (sha2-256 —
    // collisions are not a practical concern, and the oracle replays
    // the same keep-first rule); (doc_id, pos) is unique per exploded
    // row, so the struct min never consults the trailing fields — they
    // ride along so no join back to the lines is needed
    val winners = lines.filter(length(col("line")) >= minChars)
      .groupBy(sha2(col("line"), 256).as("line_hash"))
      .agg(min(struct(col("doc_id"), col("pos"), col("line"),
        col("lines_total"))).as("w"))
      .select(col("w.doc_id").as("doc_id"),
        col("w.lines_total").as("lines_total"),
        col("w.pos").as("pos"), col("w.line").as("line"))
    winners.unionByName(exempt)
      .groupBy("doc_id")
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line"))).as("new_text"),
        max(col("lines_total")).as("lines_total"),
        count(lit(1)).cast("long").as("lines_kept"))
  }
}
