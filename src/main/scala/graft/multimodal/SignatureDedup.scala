package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALIGNMENT-FREE near-duplicate matching between fingerprint
  * SEQUENCES — the robustness layer over the position-wise media
  * matchers: [[VideoDedup.nearDupPairs]] requires candidates to
  * collide at the SAME sampled frame index and the clip-relative
  * audio grid ([[AudioDedup.energyHash64]]) bakes the clip length
  * into every window, so a TRIMMED copy (intro cut, padding added, a
  * 2-second offset) shifts every index and matches nothing — and
  * trimming is the dominant real-world transform for both modalities.
  *
  * The published fix is signature-SET matching (Wu, Ngo & Hauptmann's
  * near-duplicate video elimination scores clips by the fraction of
  * matching keyframe signatures; audio fingerprinting systems à la
  * Haitsma–Kalker match sub-fingerprint values through an inverted
  * index and let the vote count decide): a clip is a BAG of unit
  * signatures — one per shot ([[VideoDedup.shotSignatures]]) or per
  * fixed-duration block ([[AudioDedup.blockHashDf]]) — and two clips
  * are near-dups when enough units match REGARDLESS of position.
  * Dropping the unit index from the join key is exactly what buys
  * the alignment invariance: a trimmed copy keeps its surviving
  * units' signatures bit-identical (shots re-detect relative to their
  * own content; fixed-duration blocks re-cut at the same boundaries
  * when the trim is block-aligned), so they still collide.
  *
  * Semantics: units match iff their 64-bit signatures sit within
  * `maxHamming` (banded blocking, pigeonhole-exact below the band
  * count, the [[ImageDedup]] engine); a clip pair is emitted iff at
  * least `minMatched` DISTINCT units match ON EACH side
  * (`least(n_matched_a, n_matched_b) >= minMatched` — symmetric, so a
  * short clip spuriously hitting one repeated unit of a long clip
  * does not qualify through multiplicity). Output carries both match
  * counts and both unit counts — the numerators and denominators of
  * whatever overlap-fraction cut the caller wants.
  *
  * Scale: the blocking is the audited banded equi-join (hash-
  * partitioned on (band, value), optional [[ImageDedup.capBuckets]]
  * hot-bucket cap); the exact popcount runs per candidate collision
  * BEFORE the distinct, so the distinct dedups bare (id_a, unit_a,
  * id_b, unit_b) tuples; the two distinct-unit counts run on the
  * matched pairs only (candidate-volume-sized, not corpus-sized), and
  * the unit-count denominators join only to SURVIVING pairs. No
  * cartesian, no driver state, no per-clip loop.
  */
object SignatureDedup {

  /** Near-dup clip pairs from unit signatures `(idCol, unitCol, h_hi,
    * h_lo)` (one row per unit): emits `(id_a, id_b, n_matched_a,
    * n_matched_b, n_units_a, n_units_b)` for pairs where at least
    * `minMatched` distinct units match on BOTH sides. `maxHamming <
    * 64/bandBits` keeps the per-unit pigeonhole exact, which makes the
    * match counts exact too.
    *
    * Input contract: ONE ROW PER (clip, unit) — the shape every
    * producer here emits ([[VideoDedup.shotSignatures]] groups by
    * (id, shot); [[AudioDedup.blockHashDf]] cuts disjoint or
    * hop-strided blocks). The `n_units_*` denominators are
    * `countDistinct(unitCol)` — so an input that violates the
    * contract (duplicate (id, unit) rows) cannot silently inflate the
    * denominators relative to the distinct-unit numerators and skew a
    * caller's overlap-fraction cut.
    */
  def nearDupPairsBySignature(units: DataFrame, idCol: String,
      unitCol: String, maxHamming: Int, minMatched: Int,
      bandBits: Int = 16, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val u = persistUnits(units)
    val matched =
      matchedUnits(u, idCol, unitCol, maxHamming, bandBits, maxBucketSize)
    val pairs = gatedPairs(matched, minMatched, Nil)
    withUnitCounts(pairs, u, idCol, unitCol)
      .select(col("id_a"), col("id_b"),
        col("n_matched_a"), col("n_matched_b"),
        col("n_units_a"), col("n_units_b"))
  }

  /** [[nearDupPairsBySignature]] plus the TEMPORAL ALIGNMENT the
    * alignment-free matcher implicitly finds and would otherwise
    * discard: `best_offset` = the MODE of `unit_a − unit_b` over the
    * pair's matched unit pairs (ties broken to the smallest offset —
    * deterministic, so the oracle replays it). For a true trimmed copy
    * the matched units' index deltas are CONSTANT — unit k+off of A is
    * unit k of B — so the mode is the trim length in units:
    * `best_offset = off > 0` reads "id_b is id_a with its first `off`
    * units removed" (unit indexes must count from each clip's own
    * start, which both producers' do). Spurious extra matches can only
    * add minority deltas; the mode stays on the alignment. This turns
    * "these clips match" into the actionable "B is A trimmed by k
    * shots/blocks" a takedown or canonical-cut picker acts on.
    *
    * Emitted as one extra aggregate in the SAME per-pair hash
    * aggregation (Spark's deterministic `mode`), so the plan is the
    * gate query's plan — no second pass over the banded join.
    */
  def nearDupPairsWithOffset(units: DataFrame, idCol: String,
      unitCol: String, maxHamming: Int, minMatched: Int,
      bandBits: Int = 16, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val u = persistUnits(units)
    val matched =
      matchedUnits(u, idCol, unitCol, maxHamming, bandBits, maxBucketSize)
    val pairs = gatedPairs(matched, minMatched, Seq(
      mode((col("ua") - col("ub")).cast("long"), deterministic = true)
        .as("best_offset")))
    withUnitCounts(pairs, u, idCol, unitCol)
      .select(col("id_a"), col("id_b"),
        col("n_matched_a"), col("n_matched_b"),
        col("n_units_a"), col("n_units_b"), col("best_offset"))
  }

  /** The unit table feeds TWO branches with different shuffles — the
    * banded match join and the `n_units` denominators — so uncached its
    * upstream (a per-clip shot/block window chain over the frame table)
    * executes once per branch: the KeyedFrameCache rule ("a frame
    * consumed by N branches must persist or its upstream pass re-runs
    * per branch"). Unit rows are per (clip, shot/block) — orders of
    * magnitude smaller than frames — so the persist is cheap at any
    * scale. BOUNDED: entries route through a [[graft.ops.KeyedFrameCache]]
    * keyed by the unit plan's semantic hash, so a long-lived session
    * calling over many DIFFERENT unit tables LRU-evicts (with
    * unpersist) instead of accumulating pinned blocks until session
    * end; repeated calls over the same table share one entry.
    */
  private val unitsCache = new graft.ops.KeyedFrameCache(8)

  private def persistUnits(units: DataFrame): DataFrame =
    unitsCache.get(units.sparkSession,
      "units#" + units.queryExecution.analyzed.semanticHash())(units)

  /** The shared match pipeline: banding WITHOUT the unit index in the
    * join key (colliding at any position is what alignment-free
    * means), exact popcount re-check BEFORE the distinct (codegen'd
    * per collision row; the distinct then dedups bare unit-pair tuples
    * instead of carrying four hash columns through the agg). Emits
    * one row per matched `(id_a, ua, id_b, ub)`.
    */
  private def matchedUnits(units: DataFrame, idCol: String,
      unitCol: String, maxHamming: Int, bandBits: Int,
      maxBucketSize: Int): DataFrame = {
    ImageDedup.requireExactPigeonhole(maxHamming, bandBits)
    val bands = ImageDedup.capBuckets(
      ImageDedup.bandExploded(
        units.select(col(idCol), col(unitCol), col("h_hi"), col("h_lo")),
        bandBits),
      maxBucketSize, "band", "bv")
    def side(tag: String) = bands.select(
      col(idCol).as(s"id_$tag"), col(unitCol).as(s"u$tag"),
      col("h_hi").as(s"hi$tag"), col("h_lo").as(s"lo$tag"),
      col("band"), col("bv"))
    side("a").join(side("b"), Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .filter(
        (bit_count(col("hia").bitwiseXOR(col("hib"))) +
          bit_count(col("loa").bitwiseXOR(col("lob")))) <= maxHamming)
      .select("id_a", "ua", "id_b", "ub")
      // units agreeing on several bands match once. A round-18 probe
      // tried pre-partitioning on (id_a, id_b) to share one exchange
      // with the downstream aggregates (§2.4) — measured NEUTRAL-to-
      // WORSE: the optimizer already removes this distinct under the
      // no-mode variant (every downstream aggregate is countDistinct,
      // duplicate-insensitive) and ExpandExec resets partitioning to
      // Unknown, so the explicit shuffle was pure addition.
      .distinct()
  }

  /** The symmetric distinct-unit gate (see the object doc), with
    * optional extra aggregates computed in the same hash aggregation.
    */
  private def gatedPairs(matched: DataFrame, minMatched: Int,
      extraAggs: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(minMatched >= 1, s"minMatched=$minMatched must be >= 1")
    val aggs = Seq(
      countDistinct(col("ua")).as("n_matched_a"),
      countDistinct(col("ub")).as("n_matched_b")) ++ extraAggs
    matched.groupBy("id_a", "id_b")
      .agg(aggs.head, aggs.tail: _*)
      .filter(least(col("n_matched_a"), col("n_matched_b")) >= minMatched)
  }

  /** Denominators: DISTINCT unit counts per clip (the input contract
    * says one row per unit; countDistinct keeps the denominators
    * consistent with the distinct-unit numerators even if a caller
    * violates it), joined only to the pairs that survived the
    * minMatched cut (broadcast-sized by then).
    */
  private def withUnitCounts(pairs: DataFrame, units: DataFrame,
      idCol: String, unitCol: String): DataFrame = {
    val nUnits = units.groupBy(col(idCol)).agg(
      countDistinct(col(unitCol)).cast("long").as("n_units"))
    pairs
      .join(nUnits.select(col(idCol).as("id_a"),
        col("n_units").as("n_units_a")), Seq("id_a"))
      .join(nUnits.select(col(idCol).as("id_b"),
        col("n_units").as("n_units_b")), Seq("id_b"))
  }
}
