package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[JpegCodec]]: baseline JFIF exactness pins. The decoder is pinned
  * against HAND-ASSEMBLED fixture byte streams (built from the
  * published marker/Huffman layout with minimal custom tables — no
  * round-trip circularity), the closed-form constant-block formula
  * `dec(p) = min(255, 2·((p+1) div 2))` the oracle queries replay, the
  * 4:2:0 chroma path on genuine color, restart markers, and the
  * refusal surface.
  */
class JpegCodecSpec extends AnyFunSuite {

  /** The closed form for constant gray content (object doc). */
  private def dec(p: Int): Int = math.min(255, 2 * ((p + 1) / 2))

  // ------------------------------------------------ hand-built fixtures

  /** Minimal grayscale baseline JPEG: all-16 quant table, a one-code
    * DC table mapping the single length-1 code to `dcSym`, a one-code
    * AC table mapping it to EOB, `w`×`h` in 8×8 blocks, and the given
    * raw scan bytes. Layout written from T.81 directly.
    */
  private def grayFixture(w: Int, h: Int, dcSym: Int,
      scan: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(out.write)
    b(0xFF, 0xD8) // SOI
    b(0xFF, 0xDB, 0x00, 0x43, 0x00) // DQT: len 67, Pq/Tq 0
    (0 until 64).foreach(_ => out.write(16))
    b(0xFF, 0xC0, 0x00, 0x0B, 0x08, h >> 8, h & 0xFF, w >> 8, w & 0xFF,
      0x01, 0x01, 0x11, 0x00) // SOF0: 8-bit, 1 component, 1x1, Q0
    b(0xFF, 0xC4, 0x00, 0x26) // DHT: len 2 + 2*(1+16+1) = 38
    b(0x00); b(1); (2 to 16).foreach(_ => out.write(0)); b(dcSym)
    b(0x10); b(1); (2 to 16).foreach(_ => out.write(0)); b(0x00) // AC0: EOB
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00) // SOS
    scan.foreach(out.write)
    b(0xFF, 0xD9) // EOI
    out.toByteArray
  }

  test("fixture vector: DC 0 block decodes to the 128 plane") {
    // scan: DC code '0' (symbol 0 → no magnitude bits), AC '0' (EOB),
    // padded with 1s → 0b00111111
    val img = JpegCodec.decode(grayFixture(8, 8, dcSym = 0,
      scan = Array(0x3F)))
    assert(img.width === 8 && img.height === 8)
    assert(img.pixels.forall(_ === 0x808080),
      s"expected all 128, got ${img.pixels.take(8).map(_.toHexString).toSeq}")
  }

  test("fixture vector: DC diff 8 under Q=16 decodes to the 144 plane") {
    // DC table maps the length-1 code to category 4; scan: '0' + 1000
    // (diff = 8) + '0' (EOB) + 11 padding → 0b01000011. Dequantized DC
    // = 8·16 = 128 → pixel = 128/8 + 128 = 144 exactly.
    val img = JpegCodec.decode(grayFixture(8, 8, dcSym = 4,
      scan = Array(0x43)))
    assert(img.pixels.forall(_ === 0x909090),
      s"expected all 144 (0x90), got ${(img.pixels(0) & 0xFF)}")
  }

  test("fixture vector: restart markers byte-align and reset the DC " +
    "predictor") {
    // 24×8 = 3 MCUs with DRI = 1: each MCU is the 2-bit '00' block
    // padded to 0x3F, separated by RST0, RST1
    val base = grayFixture(24, 8, dcSym = 0,
      scan = Array(0x3F, 0xFF, 0xD0, 0x3F, 0xFF, 0xD1, 0x3F))
    // splice a DRI segment before SOS (after DHT): find FFDA
    val idx = base.indices.find(i =>
      (base(i) & 0xFF) == 0xFF && (base(i + 1) & 0xFF) == 0xDA).get
    val dri = Array(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x01).map(_.toByte)
    val withDri = base.take(idx) ++ dri ++ base.drop(idx)
    val img = JpegCodec.decode(withDri)
    assert(img.width === 24 && img.height === 8)
    assert(img.pixels.forall(_ === 0x808080))
  }

  // ------------------------------------------- closed-form round trips

  test("constant gray round-trips by the closed form, gray and 4:2:0 " +
    "color paths alike (the formula the oracle replays)") {
    val ps = (0 to 255 by 7) ++ Seq(1, 127, 128, 129, 254, 255)
    ps.foreach { p =>
      val g = JpegCodec.decode(JpegCodec.encodeGray(8, 8, (_, _) => p))
      assert((g.pixels(0) & 0xFF) === dec(p), s"gray p=$p")
      assert(g.pixels.forall(_ === g.pixels(0)), s"gray p=$p not constant")
      val c = JpegCodec.decode(
        JpegCodec.encode420(16, 16, (_, _) => (p, p, p)))
      val px = c.pixels(0)
      assert(((px >> 16) & 0xFF) === dec(p) && ((px >> 8) & 0xFF) === dec(p)
        && (px & 0xFF) === dec(p), s"420 p=$p: got ${px.toHexString}")
      assert(c.pixels.forall(_ === px), s"420 p=$p not constant")
    }
  }

  test("non-MCU-aligned dims: edge replication keeps constant content " +
    "exact, and the decode crops to the declared size") {
    val img = JpegCodec.decode(JpegCodec.encode420(20, 13,
      (_, _) => (77, 77, 77)))
    assert(img.width === 20 && img.height === 13)
    assert(img.pixels.forall(p => (p & 0xFF) === dec(77)))
    val g = JpegCodec.decode(JpegCodec.encodeGray(17, 9, (_, _) => 200))
    assert(g.width === 17 && g.height === 9)
    assert(g.pixels.forall(p => (p & 0xFF) === dec(200)))
  }

  test("genuine color through the 4:2:0 chroma path: constant color " +
    "decodes within ±2 of the independently-derived fixed-point chain") {
    // re-derive the published arithmetic in the test (encoder color
    // matrix → DC quantization at QLuma(0)=16 / QChroma(0)=17 →
    // dequant/8 → decoder color matrix). The chroma DC (×17/8) can
    // land exactly on a half-integer where the codec's double IDCT and
    // this integer chain may round apart by 1; that ±1 chroma sample
    // scales by ≤1.772 into RGB → ±2 channel tolerance. (The EXACT
    // pins live in the gray/4:2:0 closed-form test — luma Q=16 is
    // divisible by 8, so no half-integers exist there.)
    val cases = Seq((200, 30, 100), (10, 250, 60), (255, 0, 0), (0, 0, 255))
    cases.foreach { case (r, g, b) =>
      def cl(v: Int): Int = Math.max(0, Math.min(255, v))
      val yv = cl((19595 * r + 38470 * g + 7471 * b + 32768) >> 16)
      val cb = cl(128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16))
      val cr = cl(128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16))
      def dcRt(v: Int, q: Int): Int = Math.max(0, Math.min(255,
        Math.round(Math.round(8.0 * (v - 128) / q) * q / 8.0).toInt + 128))
      val y2 = dcRt(yv, 16)
      val cb2 = dcRt(cb, 17) - 128
      val cr2 = dcRt(cr, 17) - 128
      val er = Math.max(0, Math.min(255, y2 + ((91881 * cr2 + 32768) >> 16)))
      val eg = Math.max(0, Math.min(255,
        y2 - ((22554 * cb2 + 46802 * cr2 + 32768) >> 16)))
      val eb = Math.max(0, Math.min(255, y2 + ((116130 * cb2 + 32768) >> 16)))
      val img = JpegCodec.decode(JpegCodec.encode420(16, 16,
        (_, _) => (r, g, b)))
      val px = img.pixels(0)
      assert(img.pixels.forall(_ === px), s"($r,$g,$b) not constant")
      assert(math.abs(((px >> 16) & 0xFF) - er) <= 2 &&
        math.abs(((px >> 8) & 0xFF) - eg) <= 2 &&
        math.abs((px & 0xFF) - eb) <= 2,
        s"($r,$g,$b): got ${px.toHexString}, expected ~($er,$eg,$eb)")
    }
  }

  test("smooth gradients round-trip within the lossy budget (AC path " +
    "actually exercised end to end)") {
    def rgbAt(x: Int, y: Int): (Int, Int, Int) =
      (math.min(255, x * 3), math.min(255, y * 3),
        math.min(255, (x + y) * 2))
    val img = JpegCodec.decode(JpegCodec.encode420(64, 64, rgbAt))
    var maxErr = 0
    for (y <- 0 until 64; x <- 0 until 64) {
      val (r, g, b) = rgbAt(x, y)
      val p = img.rgb(x, y)
      maxErr = maxErr.max(math.abs(((p >> 16) & 0xFF) - r))
        .max(math.abs(((p >> 8) & 0xFF) - g))
        .max(math.abs((p & 0xFF) - b))
    }
    assert(maxErr <= 20, s"max channel error $maxErr exceeds the Q50 budget")
    assert(maxErr >= 1, "a 0-error lossy round trip means the AC path " +
      "was never exercised — suspicious")
  }

  test("decode is bit-deterministic (same bytes → same pixels)") {
    val bytes = JpegCodec.encode420(48, 32, (x, y) =>
      ((x * 7) % 256, (y * 11) % 256, ((x + y) * 5) % 256))
    val a = JpegCodec.decode(bytes)
    val b = JpegCodec.decode(bytes)
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
    // and the encoder is too
    assert(java.util.Arrays.equals(bytes,
      JpegCodec.encode420(48, 32, (x, y) =>
        ((x * 7) % 256, (y * 11) % 256, ((x + y) * 5) % 256))))
  }

  test("resizeNearest matches the shared floor(i·src/dst) rule") {
    val img = JpegCodec.decode(JpegCodec.encodeGray(16, 16,
      (x, _) => if (x < 8) 50 else 200))
    val half = JpegCodec.resizeNearest(img, 8, 8)
    assert(half.width === 8 && half.height === 8)
    assert((half.rgb(0, 0) & 0xFF) === (img.rgb(0, 0) & 0xFF))
    assert((half.rgb(7, 7) & 0xFF) === (img.rgb(14, 14) & 0xFF))
  }

  test("fixture vectors: 4:2:2 and 4:4:0 sampling layouts walk the " +
    "generic MCU loop correctly (hand-built 3-component streams)") {
    // minimal color fixture: all-16 quant (id 0 for every component),
    // one-code DC table (symbol 0) and one-code AC table (EOB), all
    // blocks DC 0 → Y = 128, Cb = Cr = 128 → a constant 128 image.
    // Per MCU: Y h·v blocks + Cb + Cr, each '00' (2 bits)
    def colorFixture(w: Int, h: Int, yH: Int, yV: Int,
        scan: Array[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def b(vs: Int*): Unit = vs.foreach(out.write)
      b(0xFF, 0xD8)
      b(0xFF, 0xDB, 0x00, 0x43, 0x00)
      (0 until 64).foreach(_ => out.write(16))
      b(0xFF, 0xC0, 0x00, 0x11, 0x08, h >> 8, h & 0xFF, w >> 8, w & 0xFF,
        0x03,
        0x01, (yH << 4) | yV, 0x00,
        0x02, 0x11, 0x00,
        0x03, 0x11, 0x00)
      b(0xFF, 0xC4, 0x00, 0x26)
      b(0x00); b(1); (2 to 16).foreach(_ => out.write(0)); b(0x00)
      b(0x10); b(1); (2 to 16).foreach(_ => out.write(0)); b(0x00)
      b(0xFF, 0xDA, 0x00, 0x0C, 0x03,
        0x01, 0x00, 0x02, 0x00, 0x03, 0x00, 0x00, 0x3F, 0x00)
      scan.foreach(out.write)
      b(0xFF, 0xD9)
      out.toByteArray
    }
    // 4:2:2 (Y 2x1): MCU 16x8 → 2+1+1 = 4 blocks × 2 bits = 0x00
    val h422 = JpegCodec.decode(colorFixture(16, 8, 2, 1, Array(0x00)))
    assert(h422.width === 16 && h422.height === 8)
    assert(h422.pixels.forall(_ === 0x808080),
      "4:2:2 constant stream must decode to the 128 plane")
    // 4:4:0 (Y 1x2): MCU 8x16 → same 4 blocks
    val h440 = JpegCodec.decode(colorFixture(8, 16, 1, 2, Array(0x00)))
    assert(h440.width === 8 && h440.height === 16)
    assert(h440.pixels.forall(_ === 0x808080),
      "4:4:0 constant stream must decode to the 128 plane")
    // 4:4:4 (all 1x1), two MCUs wide: 2 MCUs × 3 blocks × 2 bits =
    // 12 bits → 0x00, 0x0F (4 padding 1s)
    val h444 = JpegCodec.decode(colorFixture(16, 8, 1, 1, Array(0x00, 0x0F)))
    assert(h444.width === 16 && h444.height === 8)
    assert(h444.pixels.forall(_ === 0x808080),
      "4:4:4 two-MCU stream must decode to the 128 plane")
  }

  test("single-component scan is non-interleaved: grayscale with 2x2 " +
    "sampling factors walks blocks row-major (T.81 A.2)") {
    // a grayscale file that KEPT its source's 2x2 luma factors (the
    // jpegtran -grayscale shape): per T.81 A.2 a one-component scan is
    // non-interleaved — MCU = one 8x8 data unit, sampling factors
    // ignored. 24x8 = three blocks ROW-MAJOR; the interleaved walk
    // would instead consume a 16x16 MCU (2x2 blocks incl. padding
    // rows) and garble the stream. DC diffs +8, -8, +8 under Q=16 →
    // block columns 144, 128, 144.
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(out.write)
    b(0xFF, 0xD8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00)
    (0 until 64).foreach(_ => out.write(16))
    b(0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 8, 0x00, 24,
      0x01, 0x01, 0x22, 0x00) // 1 component, h=v=2
    b(0xFF, 0xC4, 0x00, 0x26)
    b(0x00); b(1); (2 to 16).foreach(_ => out.write(0)); b(0x04) // DC: cat 4
    b(0x10); b(1); (2 to 16).foreach(_ => out.write(0)); b(0x00) // AC: EOB
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00)
    // per block: '0' + 4 magnitude bits + EOB '0'; diffs +8, -8, +8 →
    // 010000 001110 010000 + 6 pad 1s = 0x40 0xE4 0x3F
    b(0x40, 0xE4, 0x3F)
    b(0xFF, 0xD9)
    val img = JpegCodec.decode(out.toByteArray)
    assert(img.width === 24 && img.height === 8)
    (0 until 8).foreach { y =>
      (0 until 24).foreach { x =>
        val want = if (x < 8 || x >= 16) 144 else 128
        assert((img.pixels(y * 24 + x) & 0xFF) === want,
          s"pixel ($x,$y)")
      }
    }
  }

  test("APPn/COM with declared length < 2 refuses loudly") {
    // a declared segment length of 0 or 1 would move pos BACKWARDS
    // onto already-consumed bytes — must refuse with the precise
    // untrusted-length message, not a later misleading marker error
    val fx = grayFixture(8, 8, 0, Array(0x3F))
    def withSeg(marker: Int, len: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(fx, 0, 2) // SOI
      out.write(0xFF); out.write(marker)
      out.write(len >> 8); out.write(len & 0xFF)
      out.write(fx, 2, fx.length - 2)
      out.toByteArray
    }
    Seq(0xE0 -> 0, 0xE0 -> 1, 0xFE -> 0, 0xFE -> 1).foreach {
      case (m, len) =>
        val e = intercept[IllegalArgumentException](
          JpegCodec.decode(withSeg(m, len)))
        assert(e.getMessage.contains("length"), s"FF$m%02X len=$len: ${e.getMessage}")
    }
    // a well-formed APP0 of the same shape still decodes
    val ok = withSeg(0xE0, 4)
    val okOut = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(ok, 0, ok.length - (fx.length - 2))
      out.write(0); out.write(0) // 2 payload bytes for len 4
      out.write(fx, 2, fx.length - 2)
      out.toByteArray
    }
    assert(JpegCodec.decode(okOut).pixels.forall(_ === 0x808080))
  }

  // -------------------------------------------- progressive (SOF2)

  /** Pack a binary string (spaces ignored) into scan bytes, padding
    * the tail with 1s — keeps hand-built progressive bit streams
    * readable and slip-free.
    */
  private def bits(s: String): Array[Int] = {
    val b = s.filterNot(_ == ' ')
    b.grouped(8).map { g =>
      Integer.parseInt((g + "1" * (8 - g.length)), 2)
    }.toArray
  }

  /** Minimal PROGRESSIVE grayscale skeleton: all-16 quant, 24×8
    * (three blocks), one DC table (single length-1 code → `dcSym`) and
    * one AC table (canonical over `acSyms` with the given code
    * lengths), followed by the given scans (header fields + scan
    * bytes). Layout written from T.81 directly — no round-trip
    * circularity.
    */
  private def progFixture(dcSym: Int, acLens: Array[Int], acSyms: Array[Int],
      scans: Seq[(Int, Int, Int, Int, Array[Int])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(out.write)
    b(0xFF, 0xD8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00)
    (0 until 64).foreach(_ => out.write(16))
    b(0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 8, 0x00, 24,
      0x01, 0x01, 0x11, 0x00)
    // DHT: DC 0 single-code; AC 0 canonical from (acLens, acSyms)
    val counts = new Array[Int](16)
    acLens.foreach(l => counts(l - 1) += 1)
    b(0xFF, 0xC4, 0x00, 2 + (1 + 16 + 1) + (1 + 16 + acSyms.length))
    b(0x00); b(1); (2 to 16).foreach(_ => out.write(0)); b(dcSym)
    b(0x10); counts.foreach(out.write); acSyms.foreach(out.write)
    scans.foreach { case (ss, se, ah, al, scan) =>
      b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, ss, se, (ah << 4) | al)
      scan.foreach(out.write)
    }
    b(0xFF, 0xD9)
    out.toByteArray
  }

  test("progressive fixture: DC successive approximation — first scan " +
    "at Al=1, refinement adds the low bit; blocks reconstruct exactly") {
    // DC diffs (of the high half) +8, -8, +8 under the cat-4 table,
    // refinement bits 1, 0, 1 → quantized DCs 17, 0, 17 → pixel
    // columns 2·17+128 = 162, 128, 162
    val img = JpegCodec.decode(progFixture(dcSym = 4,
      acLens = Array(1), acSyms = Array(0x00),
      scans = Seq(
        (0, 0, 0, 1, bits("0 1000  0 0111  0 1000")),
        (0, 0, 1, 0, bits("1 0 1")))))
    assert(img.width === 24 && img.height === 8)
    (0 until 8).foreach { y =>
      (0 until 24).foreach { x =>
        val want = if (x < 8 || x >= 16) 162 else 128
        assert((img.pixels(y * 24 + x) & 0xFF) === want, s"($x,$y)")
      }
    }
  }

  test("progressive fixture: an EOB RUN spans blocks — block 0 takes " +
    "an AC coefficient, EOB1(+1) covers blocks 1 and 2") {
    // AC table: '0' → 0x01 (coef, s=1), '10' → 0x10 (EOB1).
    // Scan: block0: coef +1 at k=1, then EOB1 with extra bit 1 →
    // run = 2+1, covering this block's end AND blocks 1, 2 entirely
    val img = JpegCodec.decode(progFixture(dcSym = 0,
      acLens = Array(1, 2), acSyms = Array(0x01, 0x10),
      scans = Seq((1, 63, 0, 0, bits("0 1 10 1")))))
    assert(img.width === 24 && img.height === 8)
    // blocks 1 and 2: all-zero coefficients → the exact 128 plane
    (0 until 8).foreach { y =>
      (8 until 24).foreach { x =>
        assert((img.pixels(y * 24 + x) & 0xFF) === 128, s"($x,$y)")
      }
    }
    // block 0 carries the AC wave — not constant 128 (a mis-counted
    // EOB run would have failed the decode or zeroed it)
    assert((0 until 8).exists(y => (0 until 8).exists(x =>
      (img.pixels(y * 24 + x) & 0xFF) != 128)))
  }

  test("progressive fixtures: AC refinement (correction bit + ±1 " +
    "insertion) and a spectral-selection split both land on the exact " +
    "coefficients — pinned against a BASELINE stream of the same " +
    "coefficients") {
    // target block-0 coefficients: zigzag k=1 → 3, k=2 → 1 (blocks
    // 1, 2 all-zero). Baseline reference: AC table '0'→0x02,
    // '10'→0x01, '11'→0x00 (EOB); DC cat 0.
    val base = JpegCodec.decode(grayFixtureWith(
      acLens = Array(1, 2, 2), acSyms = Array(0x02, 0x01, 0x00),
      scan = bits("0 0 11  10 1  11    0 11   0 11")))
    // progressive: scan A (AC first, Al=1) puts k=1 → 1<<1 = 2 and
    // EOB1(+1); scan B (AC refine, Al=0) corrects k=1 (bit 1 → 3) and
    // INSERTS +1 at k=2, then EOB1(+1) refines the rest
    val prog = JpegCodec.decode(progFixture(dcSym = 0,
      acLens = Array(1, 2), acSyms = Array(0x01, 0x10),
      scans = Seq(
        (1, 63, 0, 1, bits("0 1 10 1")),
        (1, 63, 1, 0, bits("0 1 1 10 1")))))
    assert(prog.pixels.toSeq === base.pixels.toSeq,
      "refined progressive coefficients must equal the baseline stream's")
    // spectral split: scan k=1 alone, then k=2..63 — same coefficients
    // via two bands (coef values 3 and 1 need s<=2 → table adds 0x02)
    val split = JpegCodec.decode(progFixture(dcSym = 0,
      acLens = Array(1, 2, 3, 3), acSyms = Array(0x02, 0x10, 0x01, 0xF0),
      scans = Seq(
        (1, 1, 0, 0, bits("0 11  10 1")),
        (2, 63, 0, 0, bits("110 1  10 1")))))
    assert(split.pixels.toSeq === base.pixels.toSeq,
      "spectral-selection split must reach the same coefficients")
  }

  test("progressive encoder: decoded pixels are bit-identical to the " +
    "baseline encoding of the same content (gradient + cell corpus)") {
    def g1(x: Int, y: Int): Int = (x * 7 + y * 13) % 256
    Seq((8, 8), (24, 16), (17, 9), (64, 48)).foreach { case (w, h) =>
      val base = JpegCodec.decode(JpegCodec.encodeGray(w, h, g1))
      val prog = JpegCodec.decode(JpegCodec.encodeGrayProgressive(w, h, g1))
      assert(prog.width === w && prog.height === h)
      assert(prog.pixels.toSeq === base.pixels.toSeq, s"${w}x$h")
    }
  }

  /** [[grayFixture]] with a custom AC table (baseline SOF0). */
  private def grayFixtureWith(acLens: Array[Int], acSyms: Array[Int],
      scan: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(out.write)
    b(0xFF, 0xD8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00)
    (0 until 64).foreach(_ => out.write(16))
    b(0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 8, 0x00, 24,
      0x01, 0x01, 0x11, 0x00)
    val counts = new Array[Int](16)
    acLens.foreach(l => counts(l - 1) += 1)
    b(0xFF, 0xC4, 0x00, 2 + (1 + 16 + 1) + (1 + 16 + acSyms.length))
    b(0x00); b(1); (2 to 16).foreach(_ => out.write(0)); b(0x00)
    b(0x10); counts.foreach(out.write); acSyms.foreach(out.write)
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00)
    scan.foreach(out.write)
    b(0xFF, 0xD9)
    out.toByteArray
  }

  test("corruption sweep: every single-byte corruption either decodes " +
    "or refuses with the loud IllegalArgumentException — never an " +
    "index/allocation error, never a hang") {
    // untrusted-bytes hardening, the WAV/BMP/PNG rule applied to the
    // entropy format: flip and zero every byte of a small valid file
    // (headers, tables, scan data, markers alike) and demand a
    // two-outcome contract
    val base = JpegCodec.encode420(24, 16, (x, y) =>
      ((x * 31) % 256, (y * 57) % 256, ((x + y) * 11) % 256))
    def attempt(b: Array[Byte], what: String): Unit =
      try { JpegCodec.decode(b); () }
      catch {
        case _: IllegalArgumentException => () // the loud refusal
        case e: Throwable =>
          fail(s"$what: ${e.getClass.getName}: ${e.getMessage}")
      }
    base.indices.foreach { i =>
      val zeroed = base.clone(); zeroed(i) = 0
      attempt(zeroed, s"byte $i zeroed")
      val flipped = base.clone(); flipped(i) = (flipped(i) ^ 0xFF).toByte
      attempt(flipped, s"byte $i flipped")
    }
    // truncation at every prefix length
    (0 until base.length by 7).foreach { n =>
      attempt(base.take(n), s"truncated to $n bytes")
    }
  }

  test("corruption sweep, PROGRESSIVE: single-byte corruptions of a " +
    "multi-scan SOF2 file decode or refuse loudly — never an " +
    "index/allocation error, never a hang") {
    val base = JpegCodec.encodeGrayProgressive(24, 16,
      (x, y) => (x * 31 + y * 57) % 256)
    def attempt(b: Array[Byte], what: String): Unit =
      try { JpegCodec.decode(b); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"$what: ${e.getClass.getName}: ${e.getMessage}")
      }
    base.indices.foreach { i =>
      val zeroed = base.clone(); zeroed(i) = 0
      attempt(zeroed, s"byte $i zeroed")
      val flipped = base.clone(); flipped(i) = (flipped(i) ^ 0xFF).toByte
      attempt(flipped, s"byte $i flipped")
    }
    (0 until base.length by 7).foreach { n =>
      attempt(base.take(n), s"truncated to $n bytes")
    }
  }

  test("refusals: lossless SOF, non-JPEG, truncation, overfull DHT") {
    // SOF3 (lossless) refuses; a SOF2 flip on a BASELINE scan header
    // (Ss=0, Se=63) refuses too — as an invalid progressive DC scan
    val fx = grayFixture(8, 8, 0, Array(0x3F))
    val sofAt = fx.indices.find(i =>
      (fx(i) & 0xFF) == 0xFF && (fx(i + 1) & 0xFF) == 0xC0).get
    val lossless = fx.clone(); lossless(sofAt + 1) = 0xC3.toByte
    val e0 = intercept[IllegalArgumentException](JpegCodec.decode(lossless))
    assert(e0.getMessage.contains("SOF"), e0.getMessage)
    val prog = fx.clone(); prog(sofAt + 1) = 0xC2.toByte
    val e1 = intercept[IllegalArgumentException](JpegCodec.decode(prog))
    assert(e1.getMessage.contains("DC scan"), e1.getMessage)
    intercept[IllegalArgumentException](
      JpegCodec.decode("definitely not a jpeg".getBytes))
    // truncation inside the entropy stream
    intercept[IllegalArgumentException](
      JpegCodec.decode(fx.dropRight(3)))
    // overfull DHT: 3 codes of length 1 cannot be canonical
    val bad = fx.clone()
    val dhtAt = bad.indices.find(i =>
      (bad(i) & 0xFF) == 0xFF && (bad(i + 1) & 0xFF) == 0xC4).get
    bad(dhtAt + 5) = 3 // count of length-1 codes for the DC table
    intercept[IllegalArgumentException](JpegCodec.decode(bad))
  }
}
