package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document QUALITY SCORING (Rae et al. 2021, §A1.1 —
  * public paper), factored out of `corpus_clean`'s boolean gates into a
  * reusable SCORED column so downstream curation can rank, not just
  * filter (see [[graft.ops.Curation.selectByTokenBudget]]).
  *
  * Every feature and the combined score are EXACT INTEGER arithmetic
  * (milli-scaled longs), so the DuckDB oracle replays the score
  * bit-for-bit — the same design rule as [[graft.ops.Sampling]]'s
  * thresholds. The existing double-valued [[TextFunctions.qualityScore]]
  * stays for ad-hoc use; THIS is the oracled path.
  *
  * Integer division is expressed as `(a - pmod(a,b)) / b` — the
  * numerator is exactly divisible, so the double division is exact and
  * the cast back to long is deterministic; DuckDB replays it with `//`
  * (both floor for the nonnegative operands used here).
  *
  * Execution shape: every column is a codegen'd scalar expression over
  * one row — no UDF, no shuffle, no state. At 100 TB the score costs
  * exactly one corpus scan and fuses into whatever scan already runs.
  *
  * Components (each capped at 250‰; total in [0, 1000]):
  *  - length:   min(token_cnt, 64)·250/64 — longer docs up to a cap
  *  - meanWordLen: 250 iff mean token length ∈ [3.0, 10.0] chars
  *    (Gopher rule 2 — a hard band in the paper, kept binary here)
  *  - stopwords: min(stop_hits, 8)·250/8 — function-word presence
  *    (Gopher rule 8 uses ≥2 of a tiny stop list; graded here)
  *  - punctuation: 250 − min(punct‰·250/100, 250) — full marks at 0,
  *    zero at ≥10% punctuation chars (symbol-soup penalty)
  */
object QualityScore {

  /** Exact long integer division for nonnegative operands (scaladoc). */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Total non-whitespace characters = sum of token lengths. */
  def tokenCharSum(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("long")

  /** Mean token length, milli-scaled: sum(len(token))·1000 / n_tokens. */
  def meanWordLenMilli(text: Column): Column =
    idiv(tokenCharSum(text) * 1000L,
      greatest(TextFunctions.tokenCount(text).cast("long"), lit(1L)))

  /** Punctuation chars per 1000 text chars. */
  def punctMilli(text: Column): Column =
    idiv(TextFunctions.punctCount(text).cast("long") * 1000L,
      greatest(TextFunctions.charCount(text).cast("long"), lit(1L)))

  /** English function-word hits (the lexicon `lang_id` shares). */
  def stopHits(text: Column): Column =
    TextFunctions.wordHits(text, TextFunctions.langLexicons.head._2)
      .cast("long")

  def lengthTermMilli(text: Column): Column =
    idiv(least(TextFunctions.tokenCount(text).cast("long"), lit(64L)) * 250L,
      lit(64L))

  def meanWordLenTermMilli(text: Column): Column = {
    val m = meanWordLenMilli(text)
    when(m >= 3000L && m <= 10000L, lit(250L)).otherwise(lit(0L))
  }

  def stopwordTermMilli(text: Column): Column =
    idiv(least(stopHits(text), lit(8L)) * 250L, lit(8L))

  def punctTermMilli(text: Column): Column =
    greatest(lit(0L), lit(250L) - idiv(punctMilli(text) * 250L, lit(100L)))

  /** The combined score in [0, 1000] — one codegen'd expression. */
  def scoreMilli(text: Column): Column =
    lengthTermMilli(text) + meanWordLenTermMilli(text) +
      stopwordTermMilli(text) + punctTermMilli(text)
}
