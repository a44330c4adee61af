package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[HammingKnn]]: exact radius-bounded retrieval through the banded
  * index, ordering/truncation contract, brute-force equivalence on the
  * generated corpus, and refusals.
  */
class HammingKnnSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("ordering and truncation: nearest first, id tie-break, k rows " +
    "max, radius excludes, self excluded, empty probes emit nothing") {
    // index ids 1..6 at crafted distances from probe 10 (hash (0,0)):
    // id1 d0, id2 d1, id3 d1, id4 d2, id5 d3, id6 d4 (outside radius)
    val idx = Seq(
      (1L, 0L, 0L), (2L, 0L, 1L), (3L, 1L, 0L), (4L, 0L, 3L),
      (5L, 7L, 0L), (6L, 0xFL, 0L), (10L, 0L, 0L), (99L, 0L, 0xFF00L))
      .toDF("id", "h_hi", "h_lo")
    val probes = Seq((10L, 0L, 0L), (99L, 0L, 0xFF00L))
      .toDF("id", "h_hi", "h_lo")
    val out = HammingKnn
      .knnWithinRadius(idx, probes, "id", k = 4, radius = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // probe 10: d0 -> id1; d1 -> ids 2,3 (id order); d2 -> id4; k=4
    // truncates id5 (d3); id6 (d4) outside the radius anyway
    assert(out((10L, 1L)) === ((1L, 0L)))
    assert(out((10L, 2L)) === ((2L, 1L)))
    assert(out((10L, 3L)) === ((3L, 1L)))
    assert(out((10L, 4L)) === ((4L, 2L)))
    assert(!out.contains((10L, 5L)), "k=4 must truncate the 5th hit")
    // probe 99 (8 bits from everything): no neighbor within 3 -> absent
    assert(!out.keys.exists(_._1 == 99L))
  }

  test("banded probe equals brute force on the generated corpus " +
    "(pigeonhole: no neighbor within the radius is lost)") {
    val ids = (0L until 60L).toDF("doc_id")
    val hashes = ImageDedup.dHashDf(
      ImageDedup.syntheticImages(ids, "doc_id"), "doc_id")
    val probes = hashes.filter($"doc_id" % 4 === 0)
    val banded = HammingKnn
      .knnWithinRadius(hashes, probes, "doc_id", k = 5, radius = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1), r.getLong(2)))
      .toSet
    val all = hashes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def ham(a: (Long, Long), b: (Long, Long)): Long =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val brute = (for {
      (p, phi, plo) <- all if p % 4 == 0
      hits = all.filter(_._1 != p)
        .map { case (n, hi, lo) => (ham((phi, plo), (hi, lo)), n) }
        .filter(_._1 <= 3).sorted.take(5)
      ((d, n), i) <- hits.zipWithIndex
    } yield (p, i + 1L, n, d)).toSet
    assert(banded === brute)
  }

  test("256-bit: limb-banded probe equals brute force on the generated " +
    "corpus at radius 9, and the limb pigeonhole refuses at 16") {
    val ids = (0L until 60L).toDF("doc_id")
    val hashes = ImageDedup.dHash256Df(
      ImageDedup.syntheticImages256(ids, "doc_id"), "doc_id")
    val probes = hashes.filter($"doc_id" % 4 === 0)
    val banded = HammingKnn
      .knnWithinRadius256(hashes, probes, "doc_id", k = 5, radius = 9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1), r.getLong(2)))
      .toSet
    val all = hashes.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def ham(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    val brute = (for {
      (p, pfp) <- all if p % 4 == 0
      hits = all.filter(_._1 != p)
        .map { case (n, fp) => (ham(pfp, fp), n) }
        .filter(_._1 <= 9).sorted.take(5)
      ((d, n), i) <- hits.zipWithIndex
    } yield (p, i + 1L, n, d)).toSet
    assert(banded === brute)
    intercept[IllegalArgumentException](
      HammingKnn.knnWithinRadius256(hashes, probes, "doc_id", k = 5,
        radius = 16))
    intercept[IllegalArgumentException](
      HammingKnn.knnWithinRadius256(hashes, probes, "doc_id", k = 0,
        radius = 9))
  }

  test("refusals: radius beyond the pigeonhole, k < 1") {
    val df = Seq((1L, 0L, 0L)).toDF("id", "h_hi", "h_lo")
    intercept[IllegalArgumentException](
      HammingKnn.knnWithinRadius(df, df, "id", k = 5, radius = 4))
    intercept[IllegalArgumentException](
      HammingKnn.knnWithinRadius(df, df, "id", k = 0, radius = 3))
  }
}
