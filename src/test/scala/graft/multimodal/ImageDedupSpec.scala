package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ImageDedup]]: dHash from real decoded pixels, codec-agnostic
  * fingerprints, exact 8-band Hamming blocking, and the generated
  * corpus' recall contract.
  */
class ImageDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dHash64 computes the published gradient hash: bit j=cy*8+cx " +
    "set iff gray(cx) > gray(cx+1) on the 9x8 downsample") {
    // a 9x8 image whose grays strictly DECREASE left to right on every
    // row: every comparison true -> all 64 bits set
    val desc = Array.tabulate(9 * 8)(i => {
      val v = 255 - (i % 9) * 20; (v << 16) | (v << 8) | v
    })
    assert(ImageDedup.dHash64(9, 8, desc) === ((0xFFFFFFFFL, 0xFFFFFFFFL)))
    // strictly increasing -> no bit set
    val asc = Array.tabulate(9 * 8)(i => {
      val v = (i % 9) * 20; (v << 16) | (v << 8) | v
    })
    assert(ImageDedup.dHash64(9, 8, asc) === ((0L, 0L)))
    // single decrease at row 0, col 0 -> exactly bit 0 (lo's LSB)
    val one = Array.tabulate(9 * 8)(i =>
      if (i % 9 == 0 && i / 9 == 0) 0x0A0A0A else 0)
    assert(ImageDedup.dHash64(9, 8, one) === ((0L, 1L)))
    // ...and at row 4 col 3 -> bit 35 = hi bit 3
    val mid = Array.tabulate(9 * 8)(i =>
      if (i % 9 == 3 && i / 9 == 4) 0x0A0A0A else 0)
    assert(ImageDedup.dHash64(9, 8, mid) === ((8L, 0L)))
  }

  test("fingerprints are CODEC-AGNOSTIC: the same pixels through PNG " +
    "and BMP hash identically (the hash sees pixels, not bytes)") {
    def rgb(x: Int, y: Int) = ((x * 29) % 256, (y * 47) % 256, (x * y) % 256)
    val png = PngCodec.decode(
      PngCodec.encodeRgb8(27, 16, rgb, filterForRow = y => y % 5))
    val bmp = BmpCodec.decode(BmpCodec.encode24(27, 16, rgb))
    assert(ImageDedup.dHash64(png.width, png.height, png.pixels) ===
      ImageDedup.dHash64(bmp.width, bmp.height, bmp.pixels))
  }

  test("recall contract on the generated corpus: EVERY within-group " +
    "pair surfaces with hamming <= 3 under BOTH band widths " +
    "(pigeonhole blocking is exact)") {
    val ids = (0L until 48L).toDF("doc_id") // 12 groups of 4
    val hashes = ImageDedup.dHashDf(
      ImageDedup.syntheticImages(ids, "doc_id"), "doc_id")
    for (bits <- Seq(8, 16)) {
      val pairs = ImageDedup
        .nearDupPairs(hashes, "doc_id", maxHamming = 3, bandBits = bits)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      for (g <- 0L until 12L; a <- 0L until 4L; b <- (a + 1) until 4L) {
        val key = (g * 4 + a, g * 4 + b)
        assert(pairs.contains(key),
          s"within-group pair $key must be found at bandBits=$bits " +
            "(construction bounds its distance at 3)")
        assert(pairs(key) <= 3L)
      }
    }
  }

  test("cluster assignment: within-group members land in one component " +
    "labeled by the min id, which is the kept canonical") {
    val ids = (0L until 24L).toDF("doc_id") // 6 groups of 4
    val hashes = ImageDedup.dHashDf(
      ImageDedup.syntheticImages(ids, "doc_id"), "doc_id")
    val pairs = ImageDedup.nearDupPairs(hashes, "doc_id",
      maxHamming = 3, bandBits = 16)
    val assign = graft.dedup.Clusters.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (g <- 0L until 6L; v <- 0L until 4L) {
      val id = g * 4 + v
      assert(assign.contains(id), s"id $id paired within its group, so it " +
        "must receive a cluster")
      // every group is fully connected (all pairwise distances <= 3),
      // so the component label is AT MOST the group's min id (smaller
      // only if a cross-group near-collision bridges components —
      // legitimate, both engines see the same pairs)
      assert(assign(id) <= g * 4,
        s"id $id labeled ${assign(id)}, above its group min ${g * 4}")
      assert(assign(id) === assign(g * 4),
        s"group $g split: $id -> ${assign(id)} vs ${g * 4} -> ${assign(g * 4)}")
    }
  }

  test("dHash256: one 16-bit limb per row of the 16x17 grid, bit c " +
    "iff gray(c) > gray(c+1)") {
    // strictly decreasing rows -> every limb all-ones (0xFFFF)
    val desc = Array.tabulate(17 * 16)(i => {
      val vv = 255 - (i % 17) * 15; (vv << 16) | (vv << 8) | vv
    })
    assert(ImageDedup.dHash256(17, 16, desc).toSeq ===
      Seq.fill(16)(0xFFFFL))
    // increasing -> all zero
    val asc = Array.tabulate(17 * 16)(i => {
      val vv = (i % 17) * 15; (vv << 16) | (vv << 8) | vv
    })
    assert(ImageDedup.dHash256(17, 16, asc).toSeq === Seq.fill(16)(0L))
    // single decrease at row 5 col 3 -> limb 5 = 1 << 3, rest 0
    val one = Array.tabulate(17 * 16)(i =>
      if (i % 17 == 3 && i / 17 == 5) 0x0A0A0A else 0)
    val fp = ImageDedup.dHash256(17, 16, one)
    assert(fp(5) === 8L)
    assert(fp.zipWithIndex.filter(_._1 != 0L).map(_._2).toSeq === Seq(5))
  }

  test("256-bit recall contract: within-group pairs up to distance 9 " +
    "ALL surface at maxHamming = 9 (past the 64-bit exact ceiling), " +
    "and the pigeonhole bound refuses at 16") {
    val ids = (0L until 48L).toDF("doc_id")
    val hashes = ImageDedup.dHash256Df(
      ImageDedup.syntheticImages256(ids, "doc_id"), "doc_id")
    val pairs = ImageDedup.nearDupPairs256(hashes, "doc_id", maxHamming = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    var past3 = 0
    for (g <- 0L until 12L; a <- 0L until 4L; b <- (a + 1) until 4L) {
      val key = (g * 4 + a, g * 4 + b)
      assert(pairs.contains(key),
        s"within-group pair $key must be found (construction bounds " +
          "its distance at 9)")
      assert(pairs(key) <= 9L)
      if (pairs(key) > 3L) past3 += 1
    }
    assert(past3 > 0, "no pair used the high threshold — the corpus " +
      "fails to exercise what dHash256 exists for")
    intercept[IllegalArgumentException](
      ImageDedup.nearDupPairs256(hashes, "doc_id", maxHamming = 16))
  }

  test("maxBucketSize: a degenerate all-identical corpus (the " +
    "adversarial flat-image case) completes under the cap with its " +
    "quadratic bucket dropped, while pairs in small buckets survive") {
    // 60 identical fingerprints -> one 60-row bucket PER BAND (the
    // all-pairs bomb the cap exists for), plus one near-dup pair whose
    // band values are disjoint from the hot bucket's
    val hot = (0L until 60L).map(i => (i, 0x12345678L, 0x0abcdef0L))
    val cold = Seq((100L, 0x7fff5a5aL, 0x70f0f0f0L),
      (101L, 0x7fff5a5aL, 0x70f0f0f1L)) // distance 1, shares 3 bands
    val hashes = (hot ++ cold).toDF("doc_id", "h_hi", "h_lo")
    val capped = ImageDedup.nearDupPairs(hashes, "doc_id",
      maxHamming = 3, bandBits = 16, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L)),
      "over-cap buckets drop; small buckets keep pairing")
    // the drop is exactly the hot bucket's C(60,2) pairs
    val uncapped = ImageDedup.nearDupPairs(hashes, "doc_id",
      maxHamming = 3, bandBits = 16).count()
    assert(uncapped === 60L * 59 / 2 + 1)

    // 256-bit: same shape on limb fingerprints; the cap bounds
    // candidate generation, the exact verify still re-joins uncapped
    val hot256 = (0L until 60L).map(i => (i, Array.fill(16)(7L)))
    val cold256 = Seq((100L, Array.tabulate(16)(i => 100L + i)),
      (101L, Array.tabulate(16)(i => 100L + i)))
    val fp = (hot256 ++ cold256).toDF("doc_id", "fp")
    val capped256 = ImageDedup.nearDupPairs256(fp, "doc_id",
      maxHamming = 9, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped256 === Set((100L, 101L)))
    assert(ImageDedup.nearDupPairs256(fp, "doc_id", maxHamming = 9)
      .count() === 60L * 59 / 2 + 1)
    // a nonsensical cap refuses loudly
    intercept[IllegalArgumentException] {
      ImageDedup.nearDupPairs(hashes, "doc_id", 3, 16, maxBucketSize = 0)
    }
  }

  test("thresholds beyond the pigeonhole refuse per band width; " +
    "non-pixel formats refuse at the decode seam") {
    val ids = Seq(1L).toDF("doc_id")
    val hashes = ImageDedup.dHashDf(
      ImageDedup.syntheticImages(ids, "doc_id"), "doc_id")
    intercept[IllegalArgumentException]( // 8 bands admit <= 7
      ImageDedup.nearDupPairs(hashes, "doc_id", maxHamming = 8, bandBits = 8))
    intercept[IllegalArgumentException]( // 4 bands admit <= 3
      ImageDedup.nearDupPairs(hashes, "doc_id", maxHamming = 4, bandBits = 16))
    intercept[IllegalArgumentException](
      ImageDedup.nearDupPairs(hashes, "doc_id", maxHamming = 2, bandBits = 12))
    val jpeg = Seq((1L, "jpeg", Array[Byte](1, 2, 3)))
      .toDF("doc_id", "format", "bytes")
    val e = intercept[org.apache.spark.SparkException](
      ImageDedup.dHashDf(jpeg, "doc_id").collect())
    assert(e.getMessage != null)
  }
}
