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

  private def keep(keyCol: Column, fraction: Double): Column =
    Shingles.baseHash(keyCol.cast("string")) < lit((fraction * HashSpace).toLong)

  /** Bernoulli(fraction) sample, deterministic in the key. */
  def byHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(keep(col(keyCol), fraction))
  }

  /** Per-stratum fractions (groups absent from the map keep nothing). */
  def stratifiedByHash(
      df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions in [0,1]")
    val frac = fractions.foldLeft(lit(0.0)) { case (els, (s, f)) =>
      when(col(stratumCol) === s, lit(f)).otherwise(els)
    }
    df.filter(Shingles.baseHash(col(keyCol).cast("string")) <
      (frac * lit(HashSpace.toDouble)).cast("long"))
  }
}
