package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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

  /** TEMPERATURE-FLATTENED group mixing — the Gopher/Llama mixture
    * rule: group `g` (a language, a source family) is sampled with
    * weight ∝ n_g^(1/T), so T=1 keeps natural proportions and T→∞
    * approaches uniform — the standard move to stop a majority
    * language/source from drowning the tail without discarding it.
    * This implementation is T=2 (√n — the common choice) and EXACT:
    *
    *  - per-group weights quantize to integers model-side
    *    (`round(sqrt(n)·1000)` — sqrt is exactly rounded IEEE, so both
    *    engines produce identical bits), and every later step is
    *    INTEGER arithmetic: the per-group keep threshold is
    *    `⌊2^60 · budget · w_g / (Σw · n_g)⌋` computed in 128-bit
    *    integers (`BigInt` here, HUGEINT in the oracle) — no float can
    *    drift a document across a band edge;
    *  - the keep decision is the same deterministic 60-bit sha
    *    threshold as [[byHash]] — retry-stable, partitioning-free,
    *    and joinable with every other hash-gated selection.
    *
    * Expected kept ≈ `budget` documents distributed ∝ √n_g, capped at
    * each group's population (threshold clamps to the full hash
    * space). Scale shape: one tiny group-count aggregate, then a
    * broadcast-joined threshold per row — a narrow filter over the
    * corpus.
    *
    * DOMAIN: `groupCol` must be a low-cardinality group-like column
    * (a language, a source family — dozens to a few thousand values of
    * any equality-joinable type). The per-group thresholds are exact
    * 128-bit integer arithmetic, which no SQL engine's distributed
    * types express, so the (group, count) domain is computed on the
    * driver — HARD-BOUNDED by `maxGroups`: a higher-cardinality column
    * fails loudly at the limit probe instead of buffering an unbounded
    * collect or (the old shape) folding an O(groups)-deep expression
    * tree. Rows with a NULL group carry no threshold and are dropped
    * (the oracle's inner `JOIN ... USING (group)` does the same).
    */
  def temperatureMixSqrt(df: DataFrame, keyCol: String, groupCol: String,
      budget: Long, maxGroups: Int = 65536): DataFrame = {
    require(budget >= 0, s"budget=$budget must be >= 0")
    require(maxGroups >= 1, s"maxGroups=$maxGroups must be >= 1")
    require(!df.columns.contains("__thr"),
      "temperatureMixSqrt: input already has a __thr column")
    // limit-probe: maxGroups+1 rows prove the overflow without ever
    // materializing more than maxGroups+1 rows on the driver
    val probe = df.groupBy(groupCol).count().limit(maxGroups + 1).collect()
    require(probe.length <= maxGroups,
      s"temperatureMixSqrt: '$groupCol' exceeds maxGroups=$maxGroups " +
        "distinct values — the mixer's domain is language/source-like " +
        "columns; pre-bucket the column or raise maxGroups")
    // the NULL group's weight COUNTS toward the normalizer (exactly as
    // the oracle's `sum(wq)` over the full GROUP BY does) even though
    // null-group rows are dropped below — excluding it would inflate
    // every other group's threshold and break the hash parity
    val counts = probe.iterator
      .map(r => (if (r.isNullAt(0)) null else r.get(0)) -> r.getLong(1))
      .toSeq
    val wq = counts.map { case (_, n) =>
      math.round(math.sqrt(n.toDouble) * 1000)
    }
    val totW = wq.sum // integers: order-free
    val thrRows: Seq[Row] = counts.zip(wq).collect {
      case ((g, n), w) if g != null =>
        val t = (BigInt(HashSpace) * budget * w) / (BigInt(totW) * n)
        Row(g, t.min(BigInt(HashSpace)).toLong)
    }
    val thrDf = df.sparkSession.createDataFrame(
      thrRows.asJava,
      StructType(Seq(df.schema(groupCol).copy(nullable = false),
        StructField("__thr", LongType, nullable = false))))
    df.join(broadcast(thrDf), Seq(groupCol))
      .filter(Shingles.baseHash(col(keyCol).cast("string")) < col("__thr"))
      .select(df.columns.map(col): _*) // join fronts the key; restore order
  }

  /** EXACT QUOTA per group — the deterministic companion to
    * [[temperatureMixSqrt]] when the mixture spec is a hard per-group
    * cap ("at most 50k docs per language") rather than a global budget:
    * keep the `quota` documents whose key-hash is smallest within each
    * group (hash order = an unbiased, retry-stable, cross-table-
    * consistent permutation; ties broken by the key itself). Groups
    * under the quota keep everything.
    *
    * Scale shape: ONE shuffle on the group key. The `rank ≤ k` filter
    * is recognized by Spark's WindowGroupLimit rule, which inserts a
    * PARTIAL per-task top-k BEFORE the exchange — a hot group ships at
    * most ~`quota` rows per upstream task, never its full population,
    * so group skew cannot melt a reducer.
    *
    * Ties: `rank` (not `row_number`) — rows sharing an identical key
    * are kept or dropped TOGETHER (the byHash-family contract: the
    * decision is a function of the key, so duplicate keys can never
    * make the kept set depend on partitioning or task retries). The
    * cap is exact for distinct keys; a duplicated key straddling the
    * boundary overshoots by its duplicate count rather than choosing
    * an arbitrary physical row.
    */
  def quotaPerGroup(df: DataFrame, keyCol: String, groupCol: String,
      quota: Int): DataFrame = {
    require(quota >= 1, s"quota=$quota must be >= 1")
    require(!df.columns.contains("__rk"),
      "quotaPerGroup: input already has a __rk column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(Shingles.baseHash(col(keyCol).cast("string")).asc,
        col(keyCol).asc)
    df.withColumn("__rk", rank().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Deterministic SHUFFLE-AND-SHARD — the last step of every training
    * pipeline (a trained-on corpus must be globally permuted, then cut
    * into shards a loader can stream): `shard = hash % n` assigns each
    * document a pseudo-random shard, and the within-shard ordinal
    * follows the hash order — a deterministic global permutation with
    * no RNG state, stable under retries, replayable in ANSI SQL.
    *
    * Scale shape: ONE shuffle on the shard id, then a per-shard sort —
    * exactly the work a shard writer must do anyway; size `n` so a
    * shard fits a task (10k shards at 100 TB ≈ 10 GB each). The
    * hash-ordinal window never concentrates (hash order is uniform in
    * every shard), unlike timestamp- or id-ordered exports that pile
    * the newest data into the last shard.
    */
  def shardCorpus(df: DataFrame, keyCol: String, shards: Int): DataFrame = {
    require(shards >= 1, s"shards=$shards must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val h = Shingles.baseHash(col(keyCol).cast("string"))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("__h"), col(keyCol))).cast("long"))
      .drop("__h")
  }

  /** Cumulative band cuts as LONG thresholds — the ONE place a band
    * list becomes hash-space boundaries. [[splitByHash]] and any
    * replaying oracle SQL must both interpolate THESE longs (same
    * double-sum order, same truncation — see [[threshold]]).
    */
  def cumulativeThresholds(bands: Seq[(String, Double)]): Seq[Long] =
    bands.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail.map(threshold)

  /** Deterministic n-way split (train/val/test): the key's hash
    * position in [0, 2^60) falls into cumulative bands. Same
    * properties as [[byHash]] — retry-stable, seedless, joinable
    * across tables on a shared key, ANSI-SQL-replayable — plus the one
    * that matters for held-out sets: bands are assigned by CUMULATIVE
    * cuts, so growing an earlier band only absorbs rows from later
    * bands; a row already in `train` can never move to `test`, and the
    * eval set only ever shrinks from its end. Fractions must sum to
    * ≤ 1; any remainder is left unassigned (NULL split).
    */
  def splitByHash(df: DataFrame, keyCol: String,
      bands: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(bands.nonEmpty && bands.forall { case (_, f) => f >= 0 && f <= 1 },
      "band fractions in [0,1]")
    require(bands.map(_._2).sum <= 1.0 + 1e-9, "band fractions sum to <= 1")
    val cuts = cumulativeThresholds(bands)
    val h = Shingles.baseHash(col(keyCol).cast("string"))
    // reverse fold = first band whose cumulative cut exceeds the hash
    val assign = bands.zip(cuts).reverse
      .foldLeft(lit(null).cast("string")) {
        case (els, ((name, _), cut)) => when(h < lit(cut), lit(name)).otherwise(els)
      }
    df.withColumn(splitCol, assign)
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
