package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * One narrow `posexplode` (corpus → lines), ONE shuffle keyed on the
  * line's sha2-256 (first-occurrence window — full-width line text is
  * not the shuffle key), one shuffle back on `doc_id` to reassemble
  * (`array_sort(collect_list(struct(pos, line)))` — per-doc state is
  * the doc's own lines, bounded by document size). No self-join, no
  * all-pairs product, no driver-side state; at 100 TB both shuffles
  * are corpus-linear and AQE-splittable. A hot line (the same cookie
  * banner a billion times) skews its hash partition — the window only
  * needs the MINIMUM (doc_id, pos) per partition, so map-side partial
  * row_number is not available, but the reduce state is one row;
  * Spark's window spills the rest.
  */
object LineDedup {

  /** `(doc_id, text)` → `(doc_id, new_text, lines_total, lines_kept)`
    * with `new_text` the doc's surviving lines joined by '\n'. A doc
    * whose every line was seen earlier disappears (no survivors) —
    * callers wanting empty husks can left-join the source.
    */
  def dedupLines(docs: DataFrame, minChars: Int = 10): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val firstW = Window.partitionBy(sha2(col("line"), 256))
      .orderBy(col("doc_id"), col("pos"))
    // every line in a hash partition has identical text (sha2-256 —
    // collisions are not a practical concern, and the oracle replays
    // the same keep-first rule), so the short-line exemption is
    // partition-uniform and composes with the window
    val kept = lines
      .withColumn("rn", row_number().over(firstW))
      .filter(col("rn") === 1 || length(col("line")) < minChars)
    kept.groupBy("doc_id")
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line"))).as("new_text"),
        count(lit(1)).cast("long").as("lines_kept"))
  }
}
