package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Shingles

/** Deterministic sampling — the reproducible alternative to RNG-based
  * `df.sample`: keep a row iff the 60-bit sha2 hash of its key falls
  * under `fraction · 2^60`. Properties that matter at 100 TB:
  *
  *  - embarrassingly parallel (a pure narrow filter, no RNG state, no
  *    seed-per-partition coordination);
  *  - stable under retries/recomputation (a lost task resamples the
  *    SAME rows — RNG sampling silently changes results on retry);
  *  - consistent across tables: sampling two tables by the same join
  *    key yields JOINABLE samples (the classic correlated-sampling
  *    trick, impossible with independent RNG draws);
  *  - ANSI-SQL-reproducible (the oracle replays the hash).
  */
object Sampling {

  val HashSpace: Long = 1L << 60

  /** The ONE place a fraction becomes a keep-threshold. Both the Spark
    * filter and any replaying oracle SQL must interpolate THIS long —
    * computing it independently (e.g. in DECIMAL arithmetic with
    * rounding instead of double arithmetic with truncation) lands a
    * few ulps away and rows whose hash falls in the gap flip sides.
    */
  def threshold(fraction: Double): Long = (fraction * HashSpace).toLong

  private def keep(keyCol: Column, fraction: Double): Column =
    Shingles.baseHash(keyCol.cast("string")) < lit(threshold(fraction))

  /** Bernoulli(fraction) sample, deterministic in the key. */
  def byHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(keep(col(keyCol), fraction))
  }

  /** Per-stratum fractions (groups absent from the map keep nothing).
    * The per-stratum thresholds are resolved to LONG LITERALS here, on
    * the driver, via [[threshold]] — not per-row double arithmetic —
    * so an oracle interpolating the same longs is boundary-exact by
    * construction rather than by two arithmetics agreeing.
    */
  def stratifiedByHash(
      df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions in [0,1]")
    val thr = fractions.foldLeft(lit(0L)) { case (els, (s, f)) =>
      when(col(stratumCol) === s, lit(threshold(f))).otherwise(els)
    }
    df.filter(Shingles.baseHash(col(keyCol).cast("string")) < thr)
  }
}
