package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** EXACT SUBSTRING DEDUPLICATION — the removal half of repeated-passage
  * detection (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better": ExactSubstr): every `n`-token window of
  * every document, stride 1; windows whose content appears in at least
  * `minDocs` DISTINCT documents are duplicated passages, and every
  * token they cover is excised from the corpus.
  *
  * Variant: CUT-EVERYWHERE — all occurrences are removed, not
  * all-but-one (the paper's own practical note: removing every copy of
  * a duplicated span costs little text and keeps the operator
  * embarrassingly parallel, whereas keep-first needs a global
  * first-occurrence election per span — a sort the cluster pays for
  * with no measured quality gain).
  *
  * Plan shape — everything linear in corpus tokens, no global sort:
  *  1. DUPLICATED SPANS: the detection aggregation (two-level groupBy,
  *     map-side combinable; only 60-bit hashes leave the task).
  *  2. HITS: the window stream is re-derived (recomputing a projection
  *     beats persisting a corpus-sized frame) and equi-joined to the
  *     span table on the hash — a plain shuffled hash join keyed on a
  *     sha-uniform 60-bit value (no skew); AQE turns it into a
  *     broadcast join whenever the span table is small.
  *  3. INTERVAL MERGE: hit windows `[pos, pos+n-1]` merge when
  *     overlapping or adjacent — the standard islands pattern over a
  *     per-document sort (document-bounded partitions, never global).
  *  4. REASSEMBLY: the merged, disjoint cut intervals are collected
  *     per document (a handful of structs), documents left-join them,
  *     and the kept text is the concatenation of token-array slices
  *     between cuts. The only higher-order lambdas run per INTERVAL,
  *     never per token — the per-token work all stays in codegen.
  */
object ExactSubstr {

  /** Per-document cut intervals `(idCol, n_hits, n_cuts, cut_tokens,
    * cuts)` for documents with at least one duplicated window; `cuts`
    * is the sorted array of disjoint 0-based token ranges `(s, e)`,
    * inclusive both ends, after overlap/adjacency merge.
    */
  def cutIntervals(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame = {
    val stream = Shingles.shingleHashesIndexed(docs, idCol, textCol, n)
    val dup = stream.groupBy("h", idCol).agg(count(lit(1)).as("c"))
      .groupBy("h").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select("h")
    val hits = stream.join(dup, "h")
      .select(col(idCol), col("pos"), (col("pos") + lit(n - 1)).as("end"))
    val w = Window.partitionBy(idCol).orderBy("pos")
    // islands: a hit starts a new cut iff it clears the running max
    // end of everything before it by MORE than adjacency (gap >= 1
    // uncovered token). Window ordering is deterministic: (doc, pos)
    // is unique — one window per start position.
    val prevMax = max(col("end"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("nw",
        when(prevMax.isNull || col("pos") > prevMax + 1, 1).otherwise(0))
      .withColumn("island", sum(col("nw")).over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min("pos").as("s"), max("end").as("e"),
        count(lit(1)).as("hits"))
      .groupBy(idCol)
      .agg(
        sum("hits").as("n_hits"),
        count(lit(1)).as("n_cuts"),
        sum(col("e") - col("s") + 1).cast("long").as("cut_tokens"),
        sort_array(collect_list(struct(col("s"), col("e")))).as("cuts"))
  }

  /** The cleaned corpus: one row per input document with the duplicated
    * passages excised. Emits integer cut accounting plus the kept
    * token stream (space-joined — token-level surgery implies
    * whitespace-normalized output, same contract as `dedup_lines`).
    */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 16, minDocs: Int = 2): DataFrame = {
    val cuts = cutIntervals(docs, idCol, textCol, n, minDocs)
    val base = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("tk"))
      .join(cuts, Seq(idCol), "left")
    // kept segments between/around the sorted disjoint cuts, as
    // 1-based inclusive slice bounds (cut [s, e] is 0-based): the
    // segment before a cut ends at s, the one after starts at e + 2.
    // First/last segments may be empty — the slice length clamps at 0.
    val starts = when(col("cuts").isNull, array(lit(1)))
      .otherwise(concat(array(lit(1)),
        transform(col("cuts"), c => c.getField("e") + 2)))
    val ends = when(col("cuts").isNull, array(size(col("tk"))))
      .otherwise(concat(transform(col("cuts"), c => c.getField("s")),
        array(size(col("tk")))))
    val kept: Column = flatten(zip_with(starts, ends,
      (a, b) => slice(col("tk"), a, greatest(b - a + 1, lit(0)))))
    base.select(
      col(idCol),
      size(col("tk")).cast("long").as("n_tokens"),
      coalesce(col("n_hits"), lit(0L)).as("n_hits"),
      coalesce(col("n_cuts"), lit(0L)).as("n_cuts"),
      coalesce(col("cut_tokens"), lit(0L)).as("cut_tokens"),
      (size(col("tk")).cast("long") - coalesce(col("cut_tokens"), lit(0L)))
        .as("kept_tokens"),
      concat_ws(" ", kept).as("cleaned_text"))
  }
}
