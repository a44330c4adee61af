package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SignatureDedup]]: the alignment-free signature-sequence matcher's
  * own contracts — symmetric distinct-count gating, multiplicity
  * immunity, exact counts, refusals, bucket cap. Units are crafted
  * 64-bit values; the codec/segmentation seams are proven in the
  * modality specs and the oracle rows.
  */
class SignatureDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def units(rows: (Long, Long, Long, Long)*) =
    rows.toDF("doc_id", "u", "h_hi", "h_lo")

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("clips pair on DISTINCT matched units per side regardless of " +
    "position; counts and denominators are exact") {
    // clip 1: units at positions 1..3; clip 2: the SAME signatures
    // shifted to positions 5..7 (a trim/offset) plus one extra unit
    val d = pairs(SignatureDedup.nearDupPairsBySignature(units(
      (1L, 1L, 0x10L, 0x01L), (1L, 2L, 0x20L, 0x02L), (1L, 3L, 0x30L, 0x03L),
      (2L, 5L, 0x10L, 0x01L), (2L, 6L, 0x20L, 0x02L), (2L, 7L, 0x30L, 0x03L),
      (2L, 8L, 0x4040L, 0x0404L)),
      "doc_id", "u", maxHamming = 3, minMatched = 2))
    assert(d === Map((1L, 2L) -> ((3L, 3L, 3L, 4L))))
  }

  test("the least() gate is SYMMETRIC: one repeated unit of a long " +
    "clip matching one unit of a short clip does not qualify through " +
    "multiplicity") {
    // clip 1 has ONE distinct signature; clip 2 carries three copies
    // of it — n_matched_b = 3 distinct positions but n_matched_a = 1
    val d = pairs(SignatureDedup.nearDupPairsBySignature(units(
      (1L, 1L, 0xAAL, 0x55L),
      (2L, 1L, 0xAAL, 0x55L), (2L, 2L, 0xAAL, 0x55L), (2L, 3L, 0xAAL, 0x55L)),
      "doc_id", "u", maxHamming = 3, minMatched = 2))
    assert(d.isEmpty, "least(1, 3) < 2 must gate the pair out")
    // ...and the near-miss within maxHamming still matches as a unit
    val d2 = pairs(SignatureDedup.nearDupPairsBySignature(units(
      (1L, 1L, 0xAAL, 0x55L), (1L, 2L, 0xF0F0L, 0x0F0FL),
      (2L, 4L, 0xAAL, 0x54L), (2L, 9L, 0xF0F0L, 0x0F0EL)),
      "doc_id", "u", maxHamming = 3, minMatched = 2))
    assert(d2 === Map((1L, 2L) -> ((2L, 2L, 2L, 2L))))
  }

  test("pigeonhole, minMatched and bucket-cap contracts") {
    val u = units((1L, 1L, 0L, 0L), (2L, 1L, 0L, 0L))
    intercept[IllegalArgumentException] {
      SignatureDedup.nearDupPairsBySignature(u, "doc_id", "u",
        maxHamming = 4, minMatched = 1) // 4 bands admit < 4 only
    }
    intercept[IllegalArgumentException] {
      SignatureDedup.nearDupPairsBySignature(u, "doc_id", "u",
        maxHamming = 3, minMatched = 0)
    }
    // a degenerate all-identical unit corpus completes under the cap
    // with zero pairs (every bucket over-cap), the capBuckets trade
    val degenerate = units((0L until 30L).flatMap(id =>
      Seq((id, 1L, 0x77L, 0x99L), (id, 2L, 0x77L, 0x99L))): _*)
    assert(SignatureDedup.nearDupPairsBySignature(degenerate, "doc_id",
      "u", maxHamming = 3, minMatched = 2, maxBucketSize = 10)
      .count() === 0L)
  }

  test("duplicate (id, unit) input rows cannot inflate the n_units " +
    "denominators (countDistinct contract)") {
    // clip 2's unit 5 appears TWICE (a contract violation): the
    // denominator must still read 3 distinct units, matching the
    // distinct-unit numerators' basis
    val d = pairs(SignatureDedup.nearDupPairsBySignature(units(
      (1L, 1L, 0x10L, 0x01L), (1L, 2L, 0x20L, 0x02L), (1L, 3L, 0x30L, 0x03L),
      (2L, 5L, 0x10L, 0x01L), (2L, 5L, 0x10L, 0x01L),
      (2L, 6L, 0x20L, 0x02L), (2L, 7L, 0x30L, 0x03L)),
      "doc_id", "u", maxHamming = 3, minMatched = 2))
    assert(d === Map((1L, 2L) -> ((3L, 3L, 3L, 3L))))
  }

  test("offset estimate: mode of matched unit-index deltas, ties to " +
    "the smallest offset, same gate and counts as the plain matcher") {
    def offsets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // clip 2 = clip 1 trimmed by 2 leading units: every matched delta
    // is +2, so best_offset = 2 with full support
    val trimmed = offsets(SignatureDedup.nearDupPairsWithOffset(units(
      (1L, 3L, 0x10L, 0x01L), (1L, 4L, 0x20L, 0x02L), (1L, 5L, 0x30L, 0x03L),
      (2L, 1L, 0x10L, 0x01L), (2L, 2L, 0x20L, 0x02L), (2L, 3L, 0x30L, 0x03L)),
      "doc_id", "u", maxHamming = 3, minMatched = 2))
    assert(trimmed === Map((1L, 2L) -> ((3L, 3L, 3L, 3L, 2L))))
    // a 2-vs-1 delta split: the majority delta wins over a spurious one
    val majority = offsets(SignatureDedup.nearDupPairsWithOffset(units(
      (1L, 2L, 0x10L, 0x01L), (1L, 3L, 0x20L, 0x02L), (1L, 9L, 0x30L, 0x03L),
      (2L, 1L, 0x10L, 0x01L), (2L, 2L, 0x20L, 0x02L), (2L, 3L, 0x30L, 0x03L)),
      "doc_id", "u", maxHamming = 3, minMatched = 2))
    assert(majority((1L, 2L))._5 === 1L, "mode must pick the 2-vote delta 1")
    // exact tie between deltas 0 and 4: deterministic mode takes the
    // SMALLEST — the oracle's (cnt DESC, off ASC) order
    val tie = offsets(SignatureDedup.nearDupPairsWithOffset(units(
      (1L, 1L, 0x10L, 0x01L), (1L, 6L, 0x20L, 0x02L),
      (2L, 1L, 0x10L, 0x01L), (2L, 2L, 0x20L, 0x02L)),
      "doc_id", "u", maxHamming = 3, minMatched = 2))
    assert(tie((1L, 2L))._5 === 0L, "tie must resolve to the smaller offset")
  }
}
