package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[AudioDedup]]: sign-of-energy-delta fingerprints from real decoded
  * PCM, gain invariance (the Haitsma–Kalker property the bit
  * derivation buys), the shared Hamming-band blocking, and the
  * generated corpus' recall contract.
  */
class AudioDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("energyHash64 sets bit j iff window j+1 carries more energy " +
    "than window j, on the long-math window grid") {
    // 65 windows of 10 samples; amplitudes strictly increase -> all
    // 64 bits set
    val up = Array.tabulate(65 * 10)(i => (1 + i / 10).toShort)
    assert(AudioDedup.energyHash64(up) === ((0xFFFFFFFFL, 0xFFFFFFFFL)))
    // strictly decreasing -> no bit set
    val down = Array.tabulate(65 * 10)(i => (65 - i / 10).toShort)
    assert(AudioDedup.energyHash64(down) === ((0L, 0L)))
    // a single louder window w=1 makes exactly bit 0 (E(1)>E(0)) —
    // bit 1 compares E(2)>E(1) which is FALSE, rest equal -> only lo's
    // LSB
    val one = Array.tabulate(65 * 10)(i =>
      if (i / 10 == 1) 5.toShort else 1.toShort)
    assert(AudioDedup.energyHash64(one) === ((0L, 1L)))
    // louder window 33 -> bit 32 = hi's LSB
    val mid = Array.tabulate(65 * 10)(i =>
      if (i / 10 == 33) 5.toShort else 1.toShort)
    assert(AudioDedup.energyHash64(mid) === ((1L, 0L)))
    // shorter than the grid refuses
    intercept[IllegalArgumentException](
      AudioDedup.energyHash64(new Array[Short](64)))
  }

  test("fingerprints are GAIN-INVARIANT: doubling every sample leaves " +
    "the hash unchanged (sign of energy delta, not magnitude)") {
    val clip = Array.tabulate(65 * 7)(i =>
      ((i * 31 + i / 7 * 17) % 199 - 99).toShort)
    val doubled = clip.map(s => (s * 2).toShort)
    assert(AudioDedup.energyHash64(clip) === AudioDedup.energyHash64(doubled))
    // ...and sign inversion (phase flip) too: energies square the gain
    val flipped = clip.map(s => (-s).toShort)
    assert(AudioDedup.energyHash64(clip) === AudioDedup.energyHash64(flipped))
  }

  test("the hash survives the real codec round-trip: encode->decode " +
    "through WavCodec yields the in-memory fingerprint") {
    val clip = Array.tabulate(65 * 12)(i => ((i * 13) % 401 - 200).toShort)
    val direct = AudioDedup.energyHash64(clip)
    val wav = WavCodec.decode(WavCodec.encodePcm16Mono(8000, clip))
    assert(AudioDedup.energyHash64(wav.samples) === direct)
  }

  test("recall contract on the generated corpus: EVERY within-group " +
    "pair surfaces with hamming <= 3 under BOTH band widths " +
    "(pigeonhole blocking is exact)") {
    val ids = (0L until 48L).toDF("doc_id") // 12 groups of 4
    val hashes = AudioDedup.energyHashDf(
      AudioDedup.syntheticAudio(ids, "doc_id"), "doc_id")
    for (bits <- Seq(8, 16)) {
      val pairs = AudioDedup
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

  test("variants DO flip bits (the corpus is a near-dup corpus, not " +
    "an exact-dup one) and distances stay within the variant bound") {
    val ids = (0L until 48L).toDF("doc_id")
    val hashes = AudioDedup.energyHashDf(
      AudioDedup.syntheticAudio(ids, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    var flipped = 0
    for (g <- 0L until 12L; v <- 1L until 4L) {
      val d = ham(hashes(g * 4), hashes(g * 4 + v))
      assert(d <= v, s"variant $v of group $g moved $d bits (> $v): the " +
        "perturbation leaked outside the last-v-window comparisons")
      if (d > 0) flipped += 1
    }
    assert(flipped > 0, "no variant flipped any bit — the perturbation " +
      "is inert and the corpus degenerates to exact dups")
  }

  test("segmentsOf: clip-relative threshold, island merging, exact " +
    "energy sums, gain invariance") {
    // 65 windows of 4 samples; windows 10-12 and 20 loud (amp 10),
    // rest quiet (amp 1): threshold = 20% of peak energy ->
    // quiet windows (1% of peak) are inactive
    def clip(gain: Int): Array[Short] = Array.tabulate(65 * 4) { i =>
      val w = i / 4
      val a = if ((w >= 10 && w <= 12) || w == 20) 10 * gain else gain
      (if (i % 2 == 0) a else -a).toShort
    }
    val segs = AudioDedup.segmentsOf(clip(1))
    // energies: loud = 4*100 = 400, quiet = 4; 5*400 > 400 active,
    // 5*4 <= 400 inactive
    assert(segs === Seq((10, 12, 3, 1200L), (20, 20, 1, 400L)))
    // gain scales all energies by gain^2: same segments, scaled sums
    assert(AudioDedup.segmentsOf(clip(3)) ===
      Seq((10, 12, 3, 10800L), (20, 20, 1, 3600L)))
    // a flat clip is ALL one segment: every window is its own peak
    val flat = Array.tabulate(65 * 4)(i =>
      (if (i % 2 == 0) 7 else -7).toShort)
    assert(AudioDedup.segmentsOf(flat) === Seq((0, 64, 65, 65L * 4 * 49)))
  }

  test("segmentsDf emits 1-based ordered segment rows through the " +
    "real codec and refuses non-audio") {
    val clip = Array.tabulate(65 * 4) { i =>
      val w = i / 4
      val a = if (w == 2 || w == 60) 9 else 1
      (if (i % 2 == 0) a else -a).toShort
    }
    val media = Seq((5L, "wav", WavCodec.encodePcm16Mono(8000, clip)))
      .toDF("doc_id", "format", "bytes")
    val rows = AudioDedup.segmentsDf(media, "doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq((1L, 2L, 2L, 1L), (2L, 60L, 60L, 1L)))
    val png = Seq((1L, "png", Array[Byte](1)))
      .toDF("doc_id", "format", "bytes")
    intercept[org.apache.spark.SparkException](
      AudioDedup.segmentsDf(png, "doc_id").collect())
  }

  test("non-audio formats refuse at the decode seam") {
    val png = Seq((1L, "png", Array[Byte](1, 2, 3)))
      .toDF("doc_id", "format", "bytes")
    val e = intercept[org.apache.spark.SparkException](
      AudioDedup.energyHashDf(png, "doc_id").collect())
    assert(e.getMessage != null)
  }

  test("OFFSET robustness: block fingerprints survive a block-aligned " +
    "trim bit-for-bit while the clip-relative fingerprint changes — " +
    "the miss blockHashDf exists to fix") {
    val ids = (0L until 48L).toDF("doc_id")
    val clips = AudioDedup.syntheticOffsetAudio(ids, "doc_id")
    val blocks = AudioDedup
      .blockHashDf(clips, "doc_id", AudioDedup.OffsetBlockSamples)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    for (id <- 0L until 48L) {
      val v = (id % 4).toInt
      assert(blocks.keys.count(_._1 == id) === 6 - v,
        s"clip $id (variant $v) carries 6 - $v complete blocks")
    }
    // master block b of variant v sits at sequence index b - v: the
    // fingerprints are BIT-IDENTICAL across variants
    for (g <- 0L until 12L; va <- 0 to 3; vb <- (va + 1) to 3; b <- vb to 5)
      assert(blocks((g * 4 + va, (b - va).toLong)) ===
        blocks((g * 4 + vb, (b - vb).toLong)),
        s"group $g block $b must survive the trim unchanged")
    // whereas the CLIP-RELATIVE grid re-stretches: variants of one
    // group disagree (the documented boundary of energyHash64)
    val whole = AudioDedup.energyHashDf(clips, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val clipRelativeBroken = (0L until 12L).count { g =>
      whole(g * 4) != whole(g * 4 + 1)
    }
    assert(clipRelativeBroken === 12,
      "every trim must change the clip-relative fingerprint")
  }

  test("overlapping hops recover NON-block-aligned trims: the " +
    "non-overlapping fingerprints all change, the hop-aligned ones " +
    "survive bit-for-bit and every within-group pair matches") {
    val ids = (0L until 48L).toDF("doc_id")
    val clips = AudioDedup.syntheticHopAudio(ids, "doc_id")
    val bs = AudioDedup.OffsetBlockSamples
    // non-overlapping blocks: a one-hop trim (832 samples, not a
    // multiple of 4160) shifts every block boundary — zero shared
    // fingerprints between variants
    val coarse = AudioDedup.blockHashDf(clips, "doc_id", bs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
    for (g <- 0L until 12L; v <- 1 to 3) {
      val a = coarse.filter(_._1 == g * 4).map(_._2).toSet
      val b = coarse.filter(_._1 == g * 4 + v).map(_._2).toSet
      assert(a.intersect(b).isEmpty,
        s"group $g variant $v: a non-aligned trim must break every " +
          "non-overlapping block fingerprint")
    }
    // hop-aligned blocks: master hop u of variant v sits at local
    // index u - v; fingerprints are bit-identical across variants
    val fine = AudioDedup.blockHashDf(clips, "doc_id", bs,
      AudioDedup.HopSamples)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    for (id <- 0L until 48L)
      assert(fine.keys.count(_._1 == id) === 26 - (id % 4).toInt)
    for (g <- 0L until 12L; va <- 0 to 3; vb <- (va + 1) to 3; u <- vb to 25)
      assert(fine((g * 4 + va, (u - va).toLong)) ===
        fine((g * 4 + vb, (u - vb).toLong)),
        s"group $g hop $u must survive the trim unchanged")
    // ...and the alignment-free matcher finds every within-group pair
    val sigs = AudioDedup.blockHashDf(clips, "doc_id", bs,
      AudioDedup.HopSamples)
    val pairs = SignatureDedup.nearDupPairsBySignature(sigs, "doc_id",
      "block_idx", maxHamming = 3, minMatched = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (g <- 0L until 12L; a <- 0 to 3; b <- (a + 1) to 3)
      assert(pairs.get((g * 4 + a, g * 4 + b)).exists(_ >= 26 - b),
        s"group $g pair ($a,$b) must match on its shared hops")
  }

  test("hop granularity contract: at hop h the smallest recovered trim " +
    "is exactly h windows (h | trim recovers, h ∤ trim misses)") {
    // one master (id 0) + variants trimmed by t ∈ {1, 5, 13, 65}
    // windows (ids 1..4); window-constant ±A content keyed by the
    // ABSOLUTE master window, so a trimmed clip is a bit-exact suffix
    val winlen = 64
    val masterWindows = 390
    val trims = Array(0, 1, 5, 13, 65)
    def wav(t: Int): Array[Byte] = {
      val s = new Array[Short]((masterWindows - t) * winlen)
      for (w <- t until masterWindows; i <- 0 until winlen) {
        val a = (1 + ((w * 7 + w * w * 3) % 997) % 23 * 40).toShort
        s((w - t) * winlen + i) = if (i % 2 == 0) a else (-a).toShort
      }
      WavCodec.encodePcm16Mono(16000, s)
    }
    val clips = trims.indices.map(i => (i.toLong, "wav", wav(trims(i))))
      .toDF("doc_id", "format", "bytes")
    for (hopW <- Seq(65, 13, 5, 1)) {
      val units = AudioDedup.blockHashDf(clips, "doc_id",
        AudioDedup.OffsetBlockSamples, hopW * winlen)
      val matchedTrims = SignatureDedup.nearDupPairsBySignature(units,
        "doc_id", "block_idx", maxHamming = 3, minMatched = 2)
        .collect().filter(_.getLong(0) == 0L) // pairs with the master
        .map(r => trims(r.getLong(1).toInt)).toSet
      val expected = trims.filter(t => t > 0 && t % hopW == 0).toSet
      assert(matchedTrims === expected,
        s"hop $hopW: recovered trims $matchedTrims, expected $expected")
      if (expected.nonEmpty)
        assert(matchedTrims.min === hopW,
          s"smallest recovered trim at hop $hopW must be $hopW windows")
    }
  }

  test("offset-robust recall: every within-group pair pairs by " +
    "distinct-block overlap with exact counts (6 - max shared blocks)") {
    val ids = (0L until 48L).toDF("doc_id")
    val sigs = AudioDedup.blockHashDf(
      AudioDedup.syntheticOffsetAudio(ids, "doc_id"),
      "doc_id", AudioDedup.OffsetBlockSamples)
    val pairs = SignatureDedup.nearDupPairsBySignature(sigs, "doc_id",
      "block_idx", maxHamming = 3, minMatched = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val expected = for {
      g <- 0L until 12L; a <- 0 to 3; b <- (a + 1) to 3
    } yield (g * 4 + a, g * 4 + b) ->
      ((6 - b).toLong, (6 - b).toLong, (6 - a).toLong, (6 - b).toLong)
    assert(pairs === expected.toMap)
  }
}
