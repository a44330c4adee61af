package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[VideoDedup]]: GVID container round-trip and refusals, stride
  * sampling, exact per-frame match counting, and the generated
  * corpus' recall contract.
  */
class VideoDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def frame(seed: Int, fmt: String): (String, Array[Byte]) = {
    def rgb(x: Int, y: Int) =
      ((x * 29 + seed) % 256, (y * 47 + seed * 3) % 256, (x * y + seed) % 256)
    fmt match {
      case "png" => ("png", PngCodec.encodeRgb8(18, 16, rgb, y => y % 5))
      case _ => ("bmp", BmpCodec.encode24(18, 16, rgb))
    }
  }

  test("GVID round-trips mixed-codec frames byte-for-byte and refuses " +
    "junk: bad magic, inconsistent frame count, overlong frame") {
    // jpeg frames ride the container since round 16 (the MJPEG shape)
    val frames = Seq(frame(1, "png"), frame(2, "bmp"), frame(3, "png"),
      ("jpeg", JpegCodec.encode420(16, 16, (x, y) =>
        ((x * 29 + 4) % 256, (y * 47) % 256, (x * y) % 256))))
    val out = VideoDedup.decodeGvid(VideoDedup.encodeGvid(frames))
    assert(out.length === 4)
    frames.zip(out).foreach { case ((f1, b1), (f2, b2)) =>
      assert(f1 === f2); assert(b1.toSeq === b2.toSeq)
    }
    intercept[IllegalArgumentException](
      VideoDedup.decodeGvid("not a video".getBytes("US-ASCII")))
    val good = VideoDedup.encodeGvid(Seq(frame(1, "bmp")))
    val badCount = good.clone(); badCount(7) = 99 // claims 99 frames
    intercept[IllegalArgumentException](VideoDedup.decodeGvid(badCount))
    val badLen = good.clone(); badLen(9) = 0x7f // frame longer than payload
    intercept[IllegalArgumentException](VideoDedup.decodeGvid(badLen))
    intercept[IllegalArgumentException](VideoDedup.encodeGvid(Seq.empty))
    intercept[IllegalArgumentException](
      VideoDedup.encodeGvid(Seq(("gif", Array[Byte](1)))))
  }

  test("MJPEG frames hash from LOSSY-decoded pixels: a constant-gray " +
    "jpeg frame lands on the closed-form dHash (all-zero gradients)") {
    // constant gray → dec(p) constant plane → every gradient bit 0
    val clip = VideoDedup.encodeGvid(Seq(
      ("jpeg", JpegCodec.encode420(18, 16, (_, _) => (90, 90, 90))),
      ("bmp", BmpCodec.encode24(18, 16, (_, _) => (90, 90, 90)))))
    val rows = VideoDedup.frameHashDf(
      Seq((7L, "gvid", clip)).toDF("doc_id", "format", "bytes"),
      "doc_id", stride = 1)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows === Map(0 -> ((0L, 0L)), 1 -> ((0L, 0L))),
      "constant frames must hash to zero through BOTH codecs")
  }

  test("frameHashDf samples every stride-th frame and hashes the " +
    "DECODED pixels (codec-agnostic per frame)") {
    val fs = Seq(frame(1, "png"), frame(2, "bmp"), frame(3, "png"),
      frame(4, "bmp"), frame(5, "png"))
    val media = Seq((7L, "gvid", VideoDedup.encodeGvid(fs)))
      .toDF("vid", "format", "bytes")
    val rows = VideoDedup.frameHashDf(media, "vid", stride = 2)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set(0, 2, 4))
    // each sampled hash equals the direct dHash of that frame's pixels
    for (f <- Seq(0, 2, 4)) {
      val img = fs(f) match {
        case ("png", b) =>
          val p = PngCodec.decode(b); (p.width, p.height, p.pixels)
        case (_, b) =>
          val p = BmpCodec.decode(b); (p.width, p.height, p.pixels)
      }
      assert(rows(f) === ImageDedup.dHash64(img._1, img._2, img._3))
    }
    val notVideo = Seq((1L, "png", Array[Byte](1, 2, 3)))
      .toDF("vid", "format", "bytes")
    val e = intercept[org.apache.spark.SparkException](
      VideoDedup.frameHashDf(notVideo, "vid", 1).collect())
    assert(e.getMessage != null)
  }

  test("nearDupPairs counts EXACT per-frame matches and reports the " +
    "common-index denominator") {
    // vids 1,2: 3 shared sampled indices, hashes equal at frames 0,4;
    // frame 2 differs by 5 bits (> maxHamming). vid 3: matches vid 1
    // only at frame 0 -> below minMatched=2.
    val rows = Seq(
      (1L, 0, 0L, 1L), (1L, 2, 0L, 2L), (1L, 4, 0L, 4L),
      (2L, 0, 0L, 1L), (2L, 2, 0L, 2L | 0x3e0L), (2L, 4, 0L, 4L),
      (3L, 0, 0L, 1L), (3L, 2, 7L, 0L), (3L, 4, 0L, 0xF00L))
      .toDF("vid", "frame", "h_hi", "h_lo")
    val out = VideoDedup
      .nearDupPairs(rows, "vid", maxHamming = 3, minMatched = 2)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map((1L, 2L) -> ((2L, 3L))))
    intercept[IllegalArgumentException](
      VideoDedup.nearDupPairs(rows, "vid", maxHamming = 4, minMatched = 1))
    intercept[IllegalArgumentException](
      VideoDedup.nearDupPairs(rows, "vid", maxHamming = 1, minMatched = 0))
  }

  test("shots: cut indicators roll into 1-based shot spans; crafted " +
    "hashes pin the threshold boundary") {
    // video 1: frames 0-2 identical, frame 3 differs by 9 bits (> 8:
    // cut), frames 3-4 differ by 8 (NOT > 8: same shot)
    val rows = Seq(
      (1L, 0, 0L, 0L), (1L, 1, 0L, 0L), (1L, 2, 0L, 0L),
      (1L, 3, 0L, 0x1FFL), (1L, 4, 0xFFL, 0x1FFL))
      .toDF("vid", "frame", "h_hi", "h_lo")
    val out = VideoDedup.shots(rows, "vid", cutHamming = 8)
      .collect().map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sorted
    assert(out.toSeq === Seq((1L, 0L, 2L, 3L), (2L, 3L, 4L, 2L)))
    intercept[IllegalArgumentException](
      VideoDedup.shots(rows, "vid", cutHamming = 0))
    // STRIDED frame tables segment the SAMPLED sequence (lag over the
    // per-video order, not a frame+1 join — which would have seen no
    // predecessor anywhere and split every frame into its own shot)
    val strided = Seq((7L, 0, 0L, 0L), (7L, 2, 0L, 0L), (7L, 4, 0L, 0L))
      .toDF("vid", "frame", "h_hi", "h_lo")
    val s = VideoDedup.shots(strided, "vid", cutHamming = 8)
      .collect().map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(s.toSeq === Seq((1L, 0L, 4L, 3L)),
      "identical sampled frames must form ONE shot at any stride")
  }

  test("shot corpus: cuts detected at EXACTLY frames 4 and 9 for " +
    "every video (within-shot frames are bit-identical; re-rolled " +
    "gradients exceed the threshold)") {
    val ids = (0L until 30L).toDF("doc_id")
    val shots = VideoDedup.shots(
      VideoDedup.frameHashDf(
        VideoDedup.syntheticShotVideos(ids, "doc_id"), "doc_id", stride = 1),
      "doc_id", cutHamming = 8)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    for (id <- 0L until 30L) {
      val spans = shots(id).map(_._2).sortBy(_._1)
      val nF = 12 + id % 3
      assert(spans.map(s => (s._2, s._3)).toSeq ===
        Seq((0L, 3L), (4L, 8L), (9L, nF - 1)),
        s"video $id: expected shots [0,3][4,8][9,${nF - 1}], got " +
          spans.mkString(","))
    }
  }

  test("recall contract on the generated corpus: EVERY within-group " +
    "pair surfaces (variants edit at most 2 sampled intro frames; " +
    "the rest match exactly), and edited frames DO break their match") {
    val ids = (0L until 48L).toDF("doc_id") // 12 groups of 4
    val hashes = VideoDedup.frameHashDf(
      VideoDedup.syntheticVideos(ids, "doc_id"), "doc_id", stride = 2)
    val pairs = VideoDedup
      .nearDupPairs(hashes, "doc_id", maxHamming = 3, minMatched = 2)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    var edited = 0
    for (g <- 0L until 12L; a <- 0L until 4L; b <- (a + 1) until 4L) {
      val key = (g * 4 + a, g * 4 + b)
      assert(pairs.contains(key),
        s"within-group pair $key must be found (non-intro frames are " +
          "bit-identical)")
      val (matched, common) = pairs(key)
      assert(common - matched <= 2,
        s"pair $key mismatches $common-$matched sampled frames; the " +
          "edit window is capped at sampled indices {0, 2}")
      if (matched < common) edited += 1
    }
    assert(edited > 0, "no edited intro frame broke a match — the " +
      "corpus degenerates to exact dups")
  }

  test("trimmed corpus: shot boundaries re-detect per variant (4 - v " +
    "shots, the master partition) and cross-variant signature " +
    "distances honor the <= |va - vb| perturbation bound") {
    val ids = (0L until 48L).toDF("doc_id")
    val hashes = VideoDedup.frameHashDf(
      VideoDedup.syntheticTrimmedShotVideos(ids, "doc_id"),
      "doc_id", stride = 1)
    val sigs = VideoDedup.shotSignatures(hashes, "doc_id", cutHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    for (id <- 0L until 48L) {
      val v = (id % 4).toInt
      val n = sigs.keys.count(_._1 == id)
      assert(n === 4 - v,
        s"video $id (variant $v) must re-detect its ${4 - v} shots")
    }
    // same master shot s across variants va < vb: shot_idx differs
    // (s - va + 1 vs s - vb + 1) but the signatures sit within
    // |va - vb| bits — the alignment-free engine's whole premise
    def dist(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    for (g <- 0L until 12L; va <- 0 to 3; vb <- (va + 1) to 3; s <- vb to 3) {
      val d = dist(sigs((g * 4 + va, (s - va + 1).toLong)),
        sigs((g * 4 + vb, (s - vb + 1).toLong)))
      assert(d <= vb - va,
        s"group $g shot $s: variants $va/$vb sit $d bits apart")
    }
  }

  test("ALIGNMENT: the frame-index matcher misses every trimmed " +
    "within-group pair; shot-signature matching finds exactly the " +
    ">= 2-shot overlaps with exact counts both sides") {
    val ids = (0L until 48L).toDF("doc_id")
    val hashes = VideoDedup.frameHashDf(
      VideoDedup.syntheticTrimmedShotVideos(ids, "doc_id"),
      "doc_id", stride = 1)
    // the round-14 operator: candidates must collide at the SAME
    // absolute frame index — uniform shot length makes every trim a
    // whole-shot offset, so no master shot ever reappears at its old
    // index and the matcher misses EVERY within-group pair
    val byFrame = VideoDedup
      .nearDupPairs(hashes, "doc_id", maxHamming = 3, minMatched = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (g <- 0L until 12L; a <- 0 to 3; b <- (a + 1) to 3)
      assert(!byFrame.contains((g * 4 + a, g * 4 + b)),
        s"frame-index matching cannot survive the trim (pair ($a,$b))")
    // the alignment-free operator: exact overlap structure
    val sigs = VideoDedup.shotSignatures(hashes, "doc_id", cutHamming = 8)
    val byShot = SignatureDedup.nearDupPairsBySignature(sigs, "doc_id",
      "shot_idx", maxHamming = 3, minMatched = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val expected = for {
      g <- 0L until 12L; a <- 0 to 3; b <- (a + 1) to 3
      if 4 - b >= 2
    } yield (g * 4 + a, g * 4 + b) ->
      ((4 - b).toLong, (4 - b).toLong, (4 - a).toLong, (4 - b).toLong)
    assert(byShot === expected.toMap,
      "shot overlap = the 4 - max(va, vb) shared trailing master shots")
    // ...and the cluster consumer: each group's >= 2-overlap members
    // close into one component keeping the min id; the 1-shot variant
    // (v = 3) pairs with nobody and is absent
    val clusters = graft.dedup.Clusters
      .connectedComponents(SignatureDedup.nearDupPairsBySignature(sigs,
        "doc_id", "shot_idx", maxHamming = 3, minMatched = 2),
        "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedClusters = (for (g <- 0L until 12L; v <- 0 to 2)
      yield (g * 4 + v) -> (g * 4)).toMap
    assert(clusters === expectedClusters)
  }
}
